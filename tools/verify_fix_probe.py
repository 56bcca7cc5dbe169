"""Third-level probe: candidate FIXES for the verify join's superlinear
CPU, which verify_variants_r8.jsonl localized to the jaccard predicate
being pushed INTO the ShuffledHashJoin condition (agg form = linear
2.4x per 3x; condition form = 10.4x).

Variants (all emit the production (id_a, id_b, jaccard) rows):

  cond      production shape today: select(jac).filter(jac>=t) ->
            Catalyst pushes the predicate (3 array_intersect
            occurrences) into join 2's condition. BASELINE (bad).
  algebraic i/(a+b-i) >= t  <=>  i*(1+t) >= t*(a+b): condition with a
            SINGLE intersect occurrence; jaccard recomputed in the
            project above (2 evals total).
  barrier   a non-deterministic column (spark_partition_id) in the
            post-join projection blocks PushPredicateThroughNonJoin
            (it requires ALL project fields deterministic), so the
            filter stays ABOVE the join and intersect runs exactly
            once per pair in the project. Plan has the same exchanges;
            only the Filter placement moves.

Prints per (sf, variant): wall/cpu floors + whether the executed plan
has array_intersect inside a Join condition.
"""

from __future__ import annotations

import json
import os
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
        "verify-fix",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
    sc = spark.sparkContext
    t = 0.05
    only_variant = os.environ.get("FIX_VARIANT", "")
    for tag in os.environ.get("FIX_TAGS", "sf1,sf3").split(","):
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
            # i/(a+b-i) >= t  <=>  i*(1+t) >= t*(a+b)   (i,a,b >= 0)
            keep = (
                inter.cast("double") * (1.0 + t)
                >= F.lit(t) * (F.size("sa") + F.size("sb")).cast("double")
            )
            return (
                joined()
                .filter(keep)
                .select("id_a", "id_b", jac.alias("jaccard"))
            )

        def v_barrier():
            return (
                joined()
                .select(
                    "id_a",
                    "id_b",
                    jac.alias("jaccard"),
                    F.spark_partition_id().alias("_pid"),
                )
                .filter(F.col("jaccard") >= t)
                .drop("_pid")
            )

        for name, q in (
            ("cond", v_cond),
            ("algebraic", v_algebraic),
            ("barrier", v_barrier),
        ):
            if only_variant and name != only_variant:
                continue
            q().count()  # warm-up
            walls, cpus, rows = [], [], 0
            df = None
            for _ in range(2):
                c0 = _cpu(sc)
                t0 = time.perf_counter()
                df = q()
                rows = df.count()
                walls.append(time.perf_counter() - t0)
                cpus.append(_cpu(sc) - c0)
                try:
                    spark._jvm.System.gc()
                    time.sleep(2)
                except Exception:
                    pass
            plan = df._jdf.queryExecution().executedPlan().toString()
            in_join_cond = any(
                "Join" in ln and "array_intersect" in ln
                for ln in plan.splitlines()
            )
            print(
                json.dumps(
                    {
                        "sf": tag,
                        "variant": name,
                        "wall_s": round(min(walls), 1),
                        "cpu_s": round(min(cpus), 1),
                        "rows": rows,
                        "intersect_in_join_cond": in_join_cond,
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
