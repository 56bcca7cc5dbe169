"""Fourth-level probe: JVM-AGING sensitivity of the verify shapes.

verify_fix_r8.jsonl showed the production condition shape is LINEAR
(3.1x per 3x) in a FRESH JVM per cell — yet three independent
long-lived sessions (decade4, stage_cpu, verify_regime) measured the
same sf3 plan at 2171-2535 s CPU, 2.5-2.8x the fresh-JVM 896 s. The
paired-decade protocol (warm-up + small + big in ONE JVM) therefore
lands the big leg in an aged-JVM regime and flags a linear algorithm.

This probe reproduces the aging deliberately (runs the sf1 leg first,
like paired_decade does) and then measures each candidate verify shape
at sf3 in that aged JVM, twice (first run + repeat), to pick the shape
least sensitive to aging — long-lived executors at 100 TB age too.

  cond        production today (3 intersect occurrences in join cond)
  algebraic   1 occurrence in cond (superset pre-filter) + exact
              division re-check above — NOTE: float-boundary-safe form
  agg_barrier groupBy(id_a,id_b).agg(first(jaccard)) -> HAVING filter;
              intersect once map-side, nothing in the join condition
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def _cpu(sc):
    base = sc.uiWebUrl
    stages = json.load(
        urllib.request.urlopen(
            f"{base}/api/v1/applications/{sc.applicationId}/stages?status=complete"
        )
    )
    return sum(s.get("executorCpuTime", 0) for s in stages) / 1e9


def main() -> None:
    from mediaplaycounts_spark.session import get_spark

    spark = get_spark(
        "aged-fix",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
    sc = spark.sparkContext
    t = 0.05

    def shapes(tag: str):
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

        def v_cond():
            return (
                joined()
                .select("id_a", "id_b", jac.alias("jaccard"))
                .filter(F.col("jaccard") >= t)
            )

        def v_algebraic():
            # superset pre-filter with slack (inside the join cond, one
            # intersect occurrence); exact division re-check via the
            # aggregate barrier so Catalyst cannot merge it back into
            # the condition
            keep = (
                inter.cast("double") * (1.0 + t) + F.lit(1e-6)
                >= F.lit(t) * (F.size("sa") + F.size("sb")).cast("double")
            )
            return (
                joined()
                .filter(keep)
                .groupBy("id_a", "id_b")
                .agg(F.first(jac).alias("jaccard"))
                .filter(F.col("jaccard") >= t)
            )

        def v_guarded():
            # single-occurrence superset guard leads the conjunction;
            # the exact division (3 occurrences) short-circuits to the
            # ~20% of rows the guard admits. No plan-structure change.
            guard = (
                inter.cast("double") * (1.0 + t) + F.lit(1e-9)
                >= F.lit(t) * (F.size("sa") + F.size("sb")).cast("double")
            )
            return (
                joined()
                .select("id_a", "id_b", jac.alias("jaccard"))
                .filter(guard & (F.col("jaccard") >= t))
            )

        def v_agg_barrier():
            return (
                joined()
                .groupBy("id_a", "id_b")
                .agg(F.first(jac).alias("jaccard"))
                .filter(F.col("jaccard") >= t)
            )

        return {"cond": v_cond, "algebraic": v_algebraic,
                "agg_barrier": v_agg_barrier, "guarded": v_guarded}

    # AGE the JVM the way paired_decade does: warm-up + timed small leg
    s1 = shapes("sf1")
    for i in range(2):
        c0 = _cpu(sc)
        n = s1["cond"]().count()
        print(json.dumps({"phase": "age-sf1", "run": i, "rows": n,
                          "cpu_s": round(_cpu(sc) - c0, 1)}), flush=True)

    s3 = shapes("sf3")
    import os
    sel = os.environ.get("AGED_VARIANTS", "cond,algebraic,agg_barrier")
    for name in sel.split(","):
        runs = []
        rows = 0
        for i in range(2):
            c0 = _cpu(sc)
            t0 = time.perf_counter()
            rows = s3[name]().count()
            runs.append(
                {"wall_s": round(time.perf_counter() - t0, 1),
                 "cpu_s": round(_cpu(sc) - c0, 1)}
            )
            try:
                spark._jvm.System.gc()
                time.sleep(2)
            except Exception:
                pass
        print(json.dumps({"sf": "sf3-aged", "variant": name, "rows": rows,
                          "runs": runs}), flush=True)


if __name__ == "__main__":
    main()
