"""Isolate dedup_ngram_jaccard's VERIFY join (the one superlinear stage
per evidence/stage_cpu_jaccard_r8.jsonl: 7.6x incremental CPU per 3x
data, all volumes exactly 3.0x) and measure it against controlled
inputs under varying shuffle-partition counts.

Materializes the candidate pairs and hashed shingle sets to parquet
once per SF (so the verify join runs against identical scans, no
upstream lineage), then times ONLY:

    cand JOIN sets(id_a) JOIN sets(id_b) -> jaccard filter -> count

per (sf, partitions) cell, best-of-N CPU floors, and dumps the final
adaptive executed plan per cell so a join-strategy flip between SFs is
visible.

Usage:
    SPARK_GRAFT_DRIVER_MEM=48g python tools/verify_regime_probe.py \
        [--parts 32,128] [--best-of 2]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

SCRATCH = pathlib.Path("/root/repo/.scratch")


def _cpu_s(sc) -> float:
    base = sc.uiWebUrl
    stages = json.load(
        urllib.request.urlopen(
            f"{base}/api/v1/applications/{sc.applicationId}/stages?status=complete"
        )
    )
    return sum(s.get("executorCpuTime", 0) for s in stages) / 1e9


def _materialize(spark, sf_dir: str, tag: str) -> tuple[str, str]:
    """Write (candidate pairs, hashed sets) parquet for sf_dir once."""
    from mediaplaycounts_spark.operators import dedup as D
    from mediaplaycounts_spark.tables import load_table

    cand_path = SCRATCH / f"verifyprobe_cand_{tag}"
    sets_path = SCRATCH / f"verifyprobe_sets_{tag}"
    if cand_path.exists() and sets_path.exists():
        return str(cand_path), str(sets_path)
    docs = load_table(spark, sf_dir, "documents")
    sh = D.ensure_min_parallelism(docs).select(
        F.col("doc_id"), F.col("lang").alias("blk"), D.shingles("text", 2).alias("s")
    )
    num_hashes, rows_per_band = D._banding_params(0.05)
    cand = D._lsh_candidate_pairs(sh, num_hashes, rows_per_band).select(
        "id_a", "id_b"
    )
    cand.write.mode("overwrite").parquet(str(cand_path))
    D._hashed_sets(sh.select("doc_id", "s")).write.mode("overwrite").parquet(
        str(sets_path)
    )
    return str(cand_path), str(sets_path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", default="32,128")
    ap.add_argument("--best-of", type=int, default=2)
    ap.add_argument("--legs", default="sf1:/root/repo/.scratch/sf1,"
                                      "sf3:/root/repo/.scratch/sf3")
    args = ap.parse_args()

    from mediaplaycounts_spark.session import get_spark

    spark = get_spark(
        "verify-regime",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
    sc = spark.sparkContext
    legs = [leg.split(":", 1) for leg in args.legs.split(",")]
    inputs = {tag: _materialize(spark, sf_dir, tag) for tag, sf_dir in legs}
    print(json.dumps({"materialized": inputs}), flush=True)

    for tag, (cand_path, sets_path) in inputs.items():
        for parts in [int(p) for p in args.parts.split(",")]:
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            cand = spark.read.parquet(cand_path)
            sets = spark.read.parquet(sets_path).hint("shuffle_hash")
            inter = F.size(F.array_intersect("sa", "sb"))
            union = F.size("sa") + F.size("sb") - inter

            def q():
                return (
                    cand.join(
                        sets.select(
                            F.col("doc_id").alias("id_a"), F.col("s").alias("sa")
                        ),
                        "id_a",
                    )
                    .join(
                        sets.select(
                            F.col("doc_id").alias("id_b"), F.col("s").alias("sb")
                        ),
                        "id_b",
                    )
                    .select(
                        "id_a",
                        "id_b",
                        (inter.cast("double") / union.cast("double")).alias(
                            "jaccard"
                        ),
                    )
                    .filter(F.col("jaccard") >= 0.05)
                )

            q().count()  # warm-up
            walls, cpus, rows = [], [], 0
            df = None
            for _ in range(args.best_of):
                c0 = _cpu_s(sc)
                t0 = time.perf_counter()
                df = q()
                rows = df.count()
                walls.append(time.perf_counter() - t0)
                cpus.append(_cpu_s(sc) - c0)
                try:
                    spark._jvm.System.gc()
                    time.sleep(2)
                except Exception:
                    pass
            plan = df._jdf.queryExecution().executedPlan().toString()
            joins = [
                ln.strip()
                for ln in plan.splitlines()
                if "Join" in ln or "Exchange" in ln
            ]
            print(
                json.dumps(
                    {
                        "sf": tag,
                        "parts": parts,
                        "wall_s": round(min(walls), 1),
                        "cpu_s": round(min(cpus), 1),
                        "rows": rows,
                        "plan_joins": joins[:8],
                    }
                ),
                flush=True,
            )
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(sc.defaultParallelism)
    )


if __name__ == "__main__":
    main()
