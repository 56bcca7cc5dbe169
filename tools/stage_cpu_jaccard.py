"""Per-stage CPU + volume attribution for dedup_ngram_jaccard's
production (routed) path — VERDICT r7 #1.

The sf1->sf3 decade measured 7.8x executor CPU per 3x data against a
declared ~linear bound, while the corpus generator guarantees
replica-disjoint shingle spaces (so algorithmic candidate volume should
grow exactly 3x). This probe answers WHICH stage grows, two ways:

1. DETERMINISTIC volume counters (immune to timing noise): band-bucket
   size distribution (sum n, sum n^2, max, over/under-cap split), exact
   candidate-stream volume (pre- and post-distinct), verify output.
   If these grow ~3x the algorithm is linear and any CPU inflation is
   an execution-regime artifact (hash-agg/join spill at fixed 32
   partitions); if one grows ~9x that stage is the defect.
2. Cumulative-prefix CPU floors (best-of-N, monitoring REST): each
   stage's probe forces all prior work, so consecutive diffs attribute
   incremental CPU.

Usage:
    SPARK_GRAFT_DRIVER_MEM=48g python tools/stage_cpu_jaccard.py \
        [--small .scratch/sf1] [--big .scratch/sf3] [--best-of 2]

Prints one JSON line per (sf, stage).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def _stage_totals(sc) -> dict[str, float]:
    base = sc.uiWebUrl
    app = sc.applicationId
    stages = json.load(
        urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete"
        )
    )
    return {
        "cpu_s": sum(s.get("executorCpuTime", 0) for s in stages) / 1e9,
        "gc_s": sum(s.get("jvmGcTime", 0) for s in stages) / 1e3,
        "spill_disk": sum(s.get("diskBytesSpilled", 0) for s in stages),
        "spill_mem": sum(s.get("memoryBytesSpilled", 0) for s in stages),
    }


def _measure(sc, spark, thunk, best_of: int):
    """best-of-N floors of (wall, cpu) + last run's volume result."""
    walls, cpus, out = [], [], None
    gc = spill = 0.0
    for _ in range(best_of):
        b = _stage_totals(sc)
        t0 = time.perf_counter()
        out = thunk()
        walls.append(time.perf_counter() - t0)
        a = _stage_totals(sc)
        cpus.append(a["cpu_s"] - b["cpu_s"])
        gc = a["gc_s"] - b["gc_s"]
        spill = a["spill_disk"] - b["spill_disk"]
        try:
            spark._jvm.System.gc()
            time.sleep(2)
        except Exception:
            pass
    return min(walls), min(cpus), gc, spill, out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/repo/.scratch/sf1")
    ap.add_argument("--big", default="/root/repo/.scratch/sf3")
    ap.add_argument("--best-of", type=int, default=2)
    ap.add_argument("--cap", type=int, default=256)
    ap.add_argument("--ceiling", type=int, default=2000)
    args = ap.parse_args()

    from mediaplaycounts_spark.session import get_spark
    from mediaplaycounts_spark.operators import dedup as D
    from mediaplaycounts_spark.tables import load_table

    spark = get_spark(
        "stage-cpu-jaccard", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.conf.set("spark.mediaplaycounts.pairBlockCeiling", str(args.ceiling))
    spark.conf.set("spark.mediaplaycounts.bandBucketCap", str(args.cap))
    sc = spark.sparkContext
    num_hashes, rows_per_band = D._banding_params(0.05)
    num_bands = num_hashes // rows_per_band

    def stages_for(sf_dir: str):
        docs = load_table(spark, sf_dir, "documents")
        sh = D.ensure_min_parallelism(docs).select(
            F.col("doc_id"), F.col("lang").alias("blk"), D.shingles("text", 2).alias("s")
        )
        # prod conf routes every lang block (>ceiling) through LSH; the
        # probe asserts that so the attribution applies to the full corpus
        small_part, big_part = D._split_oversized_blocks(sh, args.ceiling)
        bands = None  # built inside closures to mirror _lsh_candidate_pairs

        sig = F.array(
            *[
                F.array_min(F.transform("s", lambda x: F.xxhash64(x, F.lit(k))))
                for k in range(num_hashes)
            ]
        )
        band_hash = F.array(
            *[
                F.xxhash64(
                    *[
                        F.element_at("sig", b * rows_per_band + r + 1)
                        for r in range(rows_per_band)
                    ],
                    F.lit(b),
                )
                for b in range(num_bands)
            ]
        )
        sigs = big_part.withColumn("sig", sig)
        bands = sigs.select(
            "doc_id", "blk", F.posexplode(band_hash).alias("band_idx", "band_hash")
        )
        keys = ["blk", "band_idx", "band_hash"]
        bucket_sizes = bands.groupBy(*keys).agg(
            F.count("*").alias("n"), F.min("doc_id").alias("_rep")
        )

        def s1_shingles():
            r = sh.select(
                F.count("*").alias("docs"), F.sum(F.size("s")).alias("shingle_total")
            ).collect()[0]
            return {"docs": r["docs"], "shingle_total": r["shingle_total"]}

        def s2_signatures():
            r = sigs.select(
                F.count("*").alias("docs"),
                F.sum(F.pmod(F.element_at("sig", num_hashes), F.lit(97))).alias(
                    "_force"
                ),
            ).collect()[0]
            return {"routed_docs": r["docs"]}

        def s3_buckets():
            n = F.col("n")
            r = bucket_sizes.select(
                F.count("*").alias("buckets"),
                F.sum(n).alias("band_rows"),
                F.max(n).alias("max_bucket"),
                F.sum(F.when(n <= args.cap, n * (n - 1) / 2).otherwise(0)).alias(
                    "undercap_pairs"
                ),
                F.sum(F.when(n > args.cap, n - 1).otherwise(0)).alias("star_pairs"),
                F.sum(F.when(n > args.cap, 1).otherwise(0)).alias("overcap_buckets"),
                F.sum(n * (n - 1) / 2).alias("uncapped_pairs"),
            ).collect()[0]
            return {k: int(r[k] or 0) for k in r.asDict()}

        def _raw_candidates():
            buckets = D.checkpoint_df(
                bucket_sizes.filter(F.col("n") > args.cap).select(*keys, "_rep")
            )
            cold = bands.join(buckets, keys, "left_anti")
            star = (
                bands.join(buckets, keys)
                .filter(F.col("doc_id") != F.col("_rep"))
                .select(F.col("_rep").alias("id_a"), F.col("doc_id").alias("id_b"))
            )
            return (
                cold.alias("x")
                .join(
                    cold.alias("y"),
                    (F.col("x.blk") == F.col("y.blk"))
                    & (F.col("x.band_idx") == F.col("y.band_idx"))
                    & (F.col("x.band_hash") == F.col("y.band_hash"))
                    & (F.col("x.doc_id") < F.col("y.doc_id")),
                )
                .select(
                    F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b")
                )
                .unionByName(star)
            )

        def s4a_cand_raw():
            return {"cand_pre_distinct": _raw_candidates().count()}

        def s4b_cand_distinct():
            return {"cand_post_distinct": _raw_candidates().distinct().count()}

        def s5_verify():
            cand = _raw_candidates().distinct()
            sets = D._hashed_sets(sh.select("doc_id", "s"))
            inter = F.size(F.array_intersect("sa", "sb"))
            union = F.size("sa") + F.size("sb") - inter
            out = (
                cand.join(
                    sets.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa")),
                    "id_a",
                )
                .join(
                    sets.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb")),
                    "id_b",
                )
                .select(
                    "id_a",
                    "id_b",
                    (inter.cast("double") / union.cast("double")).alias("jaccard"),
                )
                .filter(F.col("jaccard") >= 0.05)
            )
            return {"verified_pairs": out.count()}

        assert big_part is not None, "prod ceiling routed nothing — probe void"
        return [
            ("shingles", s1_shingles),
            ("signatures", s2_signatures),
            ("bucket_agg", s3_buckets),
            ("cand_raw", s4a_cand_raw),
            ("cand_distinct", s4b_cand_distinct),
            ("verify", s5_verify),
        ]

    for sf_dir in (args.small, args.big):
        label = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        # JVM/JIT warm-up on the small leg's cheapest stage
        stages = stages_for(sf_dir)
        stages[0][1]()
        prev_cpu = 0.0
        for name, thunk in stages:
            wall, cpu, gc, spill, out = _measure(sc, spark, thunk, args.best_of)
            rec = {
                "sf": label,
                "stage": name,
                "wall_s": round(wall, 1),
                "cpu_s": round(cpu, 1),
                "cpu_incr_s": round(cpu - prev_cpu, 1),
                "gc_s": round(gc, 1),
                "spill_disk_mb": round(spill / 1e6),
            }
            rec.update(out)
            prev_cpu = cpu
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
