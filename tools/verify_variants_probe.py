"""Second-level decomposition of the verify join's superlinear CPU
(evidence/verify_regime_r8.jsonl: identical ShuffledHashJoin plans,
10.4x CPU per 3x rows). Three variants over the SAME materialized
parquet inputs, per sf:

  join_only      cand |x| sets(id_a) |x| sets(id_b) -> count
                 (exchange + join machinery, no array work)
  agg_jaccard    same joins, jaccard computed in a post-join AGGREGATE
                 (sum(when(j>=t,1))) so the predicate can NOT become a
                 join condition -> array_intersect runs exactly once
                 per pair inside a Project/Aggregate
  cond_jaccard   the production shape: filter(j >= t) -> count, which
                 Catalyst pushes into the join condition where the
                 array_intersect subtree appears 3x (no CSE in join
                 predicates?)

Also dumps the top-8 completed stages by executorCpuTime (name + CPU)
after each variant, attributing CPU to exchange vs join stages.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def _stages(sc):
    base = sc.uiWebUrl
    return json.load(
        urllib.request.urlopen(
            f"{base}/api/v1/applications/{sc.applicationId}/stages?status=complete"
        )
    )


def main() -> None:
    from mediaplaycounts_spark.session import get_spark

    spark = get_spark(
        "verify-variants",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
    sc = spark.sparkContext
    import os
    tags = os.environ.get("VARIANT_TAGS", "sf1,sf3").split(",")
    for tag in tags:
        cand = spark.read.parquet(f"/root/repo/.scratch/verifyprobe_cand_{tag}")
        sets = spark.read.parquet(
            f"/root/repo/.scratch/verifyprobe_sets_{tag}"
        ).hint("shuffle_hash")

        def joined():
            return cand.join(
                sets.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa")),
                "id_a",
            ).join(
                sets.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb")),
                "id_b",
            )

        inter = F.size(F.array_intersect("sa", "sb"))
        union = F.size("sa") + F.size("sb") - inter
        jac = inter.cast("double") / union.cast("double")

        variants = {
            "join_only": lambda: joined().count(),
            "agg_jaccard": lambda: joined()
            .agg(F.sum(F.when(jac >= 0.05, 1).otherwise(0)).alias("n"))
            .collect()[0]["n"],
            "cond_jaccard": lambda: joined()
            .select("id_a", "id_b", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= 0.05)
            .count(),
        }
        for name, thunk in variants.items():
            thunk()  # warm-up
            cpus, walls, rows = [], [], 0
            for _ in range(2):
                before = {s["stageId"]: s for s in _stages(sc)}
                c0 = sum(s.get("executorCpuTime", 0) for s in before.values()) / 1e9
                t0 = time.perf_counter()
                rows = thunk()
                walls.append(time.perf_counter() - t0)
                after = _stages(sc)
                cpus.append(
                    sum(s.get("executorCpuTime", 0) for s in after) / 1e9 - c0
                )
                new = [s for s in after if s["stageId"] not in before]
                try:
                    spark._jvm.System.gc()
                    time.sleep(2)
                except Exception:
                    pass
            top = sorted(new, key=lambda s: -s.get("executorCpuTime", 0))[:6]
            print(
                json.dumps(
                    {
                        "sf": tag,
                        "variant": name,
                        "wall_s": round(min(walls), 1),
                        "cpu_s": round(min(cpus), 1),
                        "rows": rows,
                        "top_stages": [
                            {
                                "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 1),
                                "spill_disk_mb": round(s.get("diskBytesSpilled", 0) / 1e6),
                                "spill_mem_mb": round(s.get("memoryBytesSpilled", 0) / 1e6),
                                "shuf_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6),
                                "shuf_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6),
                                "name": s.get("name", "")[:40],
                            }
                            for s in top
                        ],
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
