"""Catalyst-phase breakdown for the PQ final query + same-JVM A/B of
the centroid-literal construction (old CreateArray-of-lits vs r12
single-flat-Literal + foldable slices).

Usage: python tools/probe_pq_phases.py [sf_dir]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

from pyspark.sql import functions as F

from mediaplaycounts_spark.session import get_spark
from mediaplaycounts_spark.tables import load_table
from mediaplaycounts_spark.operators import similarity as S

spark = get_spark("probe-pq-phases")
em = load_table(spark, sf_dir, "embeddings")
em.count()

probe = S.probe_vector(em, "vec_id", "embedding", 0)
books = S.train_pq_codebooks(em, "vec_id", "embedding", 8, 64)
print("trained", flush=True)


def assign_old(vec, centroids):
    cents = F.array(
        *[
            F.array(*[F.lit(float(x)) for x in c]).cast("array<double>")
            for c in centroids
        ]
    )
    dists = F.transform(
        cents,
        lambda c: F.aggregate(
            F.zip_with(vec, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def final_query(assign_fn):
    import math

    m_sub, k_codes, rerank_factor, k = 8, 64, 6, 20
    d_sub = len(books[0][0])
    nrm = math.sqrt(sum(x * x for x in probe))
    pn = [x / nrm for x in probe]
    adc = [
        [
            sum(pn[m * d_sub + t] * books[m][j][t] for t in range(d_sub))
            for j in range(k_codes)
        ]
        for m in range(m_sub)
    ]
    v = S.l2_normalize(S.as_double("embedding"))
    sliced = em.select(F.col("vec_id"), F.col("embedding"), v.alias("vn")).select(
        "vec_id",
        "embedding",
        *[F.slice("vn", m * d_sub + 1, d_sub).alias(f"s{m}") for m in range(m_sub)],
    )
    score = F.lit(0.0)
    for m in range(m_sub):
        code = assign_fn(F.col(f"s{m}"), books[m])
        tab = F.array(*[F.lit(float(x)) for x in adc[m]])
        score = score + F.element_at(tab, code + 1)
    p = F.array(*[F.lit(float(x)) for x in probe]).cast("array<double>")
    shortlist = (
        sliced.select(F.col("vec_id"), F.col("embedding"), score.alias("adc"))
        .orderBy(F.desc("adc"), "vec_id")
        .limit(rerank_factor * k)
    )
    vv = S.as_double("embedding")
    return shortlist.select(
        F.col("vec_id"), F.round(S.cosine(vv, p), 6).alias("cos_sim")
    ).orderBy(F.desc("cos_sim"), "vec_id").limit(k)


def phases(df, label):
    qe = df._jdf.queryExecution()
    t0 = time.perf_counter()
    qe.analyzed()
    t1 = time.perf_counter()
    qe.optimizedPlan()
    t2 = time.perf_counter()
    qe.executedPlan()
    t3 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    t4 = time.perf_counter()
    print(
        f"{label}: analyze={t1-t0:.3f} optimize={t2-t1:.3f} "
        f"physical={t3-t2:.3f} write(full recompile+exec)={t4-t3:.3f}",
        flush=True,
    )


for rnd in (1, 2):
    phases(final_query(assign_old), f"old round{rnd}")
    phases(final_query(S._assign_cell), f"new round{rnd}")

# value equality of the two forms
a = [(r.vec_id, r.cos_sim) for r in final_query(assign_old).collect()]
b = [(r.vec_id, r.cos_sim) for r in final_query(S._assign_cell).collect()]
print("outputs identical:", a == b, flush=True)
spark.stop()
