"""Multiprobe ceiling-route fan-out diagnostic (VERDICT r10 next #4).

The r11 ceiling route (operators/similarity.cosine_pairs_blocked LSH
fallback, Hamming<=2 multiprobe) has two cost terms with different
scaling laws, and the decade evidence must separate them:

1. PROBE FAN-OUT — the exploded probe-side row count
   (n x tables x Σ_{k<=H} C(planes,k) masks). LINEAR in n by
   construction; this tool measures it at two SFs and reports the
   ratio so the claim is a measurement, not an assertion.
2. CANDIDATE JOIN VOLUME — Σ over (blk, tbl, bucket) of
   probe_count x exact_count. Data-geometry-dependent: quadratic in
   block size for an isotropic corpus (the synthetic embeddings table
   measures median pairwise cos ~= 0.0, i.e. the documented honest
   worst case where the H=2 candidate fraction is ~0.70), orders of
   magnitude lower on clustered production corpora. Computed here
   ANALYTICALLY from two linear groupBy-count tables joined on the
   bucket key — no pair row is ever materialized, so the sf10 number
   (~10^9 pairs) is measurable in seconds.

Also reports bucket-occupancy quantiles per SF (the "caps hold" check:
no bucket degenerates to a super-linear hot spot beyond what uniform
occupancy n_block/2^planes predicts).

Usage:
    python tools/probe_fanout.py --small .scratch/sf1 --big .scratch/sf10
Prints one JSON line per SF plus a ratios line.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")


def measure(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from mediaplaycounts_spark.operators import similarity as S
    from mediaplaycounts_spark.tables import load_table

    em = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("vid"),
        F.col("label").alias("blk"),
        F.col("embedding").alias("v"),
    )
    dim = len(em.select("v").first()["v"])
    n_tables, n_planes, probe_h = S._resolve_lsh_conf(em)
    masks = S._probe_masks(n_planes, probe_h)
    all_planes = S.lsh_planes(n_tables * n_planes, dim)
    tables = [
        all_planes[t * n_planes : (t + 1) * n_planes]
        for t in range(n_tables)
    ]
    bucket_arr = F.array(
        *[S.lsh_bucket(F.col("v"), tables[t]) for t in range(n_tables)]
    )
    bk = em.select(
        "vid", "blk", F.posexplode(bucket_arr).alias("tbl", "bucket")
    )
    n_rows = em.count()
    # exact-side bucket occupancy (the join's build side)
    occ = bk.groupBy("blk", "tbl", "bucket").count()
    occ_stats = occ.agg(
        F.max("count").alias("mx"),
        F.expr("percentile_approx(count, 0.99)").alias("p99"),
        F.count("*").alias("n_buckets"),
    ).first()
    # probe side = every Hamming<=H flip; row count is n x tables x |masks|
    probe = bk.select(
        "vid",
        "blk",
        "tbl",
        F.explode(
            F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks])
        ).alias("bucket"),
    )
    probe_rows = probe.count()
    # analytic pre-dedup candidate volume: sum of probe_cnt x exact_cnt
    # over bucket keys (self-pairs included — a <1/occupancy correction)
    pcnt = probe.groupBy("blk", "tbl", "bucket").count().withColumnRenamed(
        "count", "pc"
    )
    vol = (
        pcnt.join(occ, ["blk", "tbl", "bucket"])
        .agg(F.sum(F.col("pc") * F.col("count")).alias("v"))
        .first()["v"]
    )
    return {
        "sf": sf_dir,
        "rows": n_rows,
        "conf": {"tables": n_tables, "planes": n_planes, "probe_h": probe_h},
        "masks": len(masks),
        "probe_rows": probe_rows,
        "probe_rows_per_vec": round(probe_rows / n_rows, 2),
        "bucket_max": occ_stats["mx"],
        "bucket_p99": occ_stats["p99"],
        "n_buckets": occ_stats["n_buckets"],
        "candidate_volume_predup": int(vol),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", default="/root/repo/.scratch/sf1")
    ap.add_argument("--big", default="/root/repo/.scratch/sf10")
    args = ap.parse_args()

    from mediaplaycounts_spark.session import get_spark

    spark = get_spark("probe-fanout")
    small = measure(spark, args.small)
    big = measure(spark, args.big)
    data_ratio = big["rows"] / small["rows"]
    fan_ratio = big["probe_rows"] / small["probe_rows"]
    vol_ratio = big["candidate_volume_predup"] / max(
        small["candidate_volume_predup"], 1
    )
    print(json.dumps(small))
    print(json.dumps(big))
    print(
        json.dumps(
            {
                "data_ratio": round(data_ratio, 2),
                "probe_fanout_ratio": round(fan_ratio, 2),
                "fanout_linear": abs(fan_ratio - data_ratio) / data_ratio
                < 0.01,
                "candidate_volume_ratio": round(vol_ratio, 2),
                "note": "candidate volume is geometry-dependent "
                "(quadratic in block size on an isotropic corpus); "
                "probe fan-out must scale with data",
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
