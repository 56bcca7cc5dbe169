"""Focused unit tests for the round-3 operators (beyond the registry
shape checks and the sf0.01 oracle sweep): determinism, structural
guarantees, and kernel edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mediaplaycounts_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_pq_topk_deterministic_and_self_match(spark):
    """PQ codebooks have fixed init + iteration count: two runs must be
    identical, and the probe must report itself at cosine 1.0."""
    from mediaplaycounts_spark.operators import similarity as S

    em = load_table(spark, SF, "embeddings")
    probe = S.probe_vector(em, "vec_id", "embedding", 0)
    a = S.topk_pq(em, "vec_id", "embedding", probe, k=10).collect()
    b = S.topk_pq(em, "vec_id", "embedding", probe, k=10).collect()
    assert [(r.vec_id, r.cos_sim) for r in a] == [(r.vec_id, r.cos_sim) for r in b]
    assert a[0].vec_id == 0 and a[0].cos_sim == 1.0


def test_pq_codebook_shape(spark):
    from mediaplaycounts_spark.operators import similarity as S

    em = load_table(spark, SF, "embeddings")
    books = S.train_pq_codebooks(em, "vec_id", "embedding", m_sub=8, k_codes=16)
    assert len(books) == 8
    assert all(len(b) == 16 for b in books)
    assert all(len(c) == 8 for b in books for c in b)  # 64 dims / 8 subspaces


def test_bloom_no_false_negatives_structural(spark):
    """Every inserted value MUST probe positive — the Bloom guarantee
    the decontamination key's within_bound leans on."""
    from mediaplaycounts_spark.queries.curation import (
        _bloom_member,
        _build_bloom_bitmap,
    )

    vals = spark.range(500).select(
        F.concat(F.lit("tri-"), F.col("id")).alias("v")
    )
    arr = _build_bloom_bitmap(spark, vals, "v")
    bits_lit = F.array(*[F.lit(x).cast("long") for x in arr])
    hits = vals.filter(_bloom_member(bits_lit, "v")).count()
    assert hits == 500


def test_scene_cuts_identical_frames_zero_diff(spark):
    """A payload of identical frames must produce all-zero diffs and no
    cuts; a payload with one flipped frame produces exactly two cut
    boundaries (into and out of the odd frame)."""
    from mediaplaycounts_spark.operators.multimodal import scene_cut_signal

    same = "a" * 64 * 4
    flip = "a" * 64 + "b" * 64 + "a" * 64
    df = spark.createDataFrame(
        [(1, same), (2, flip)], "doc_id long, text string"
    )
    rows = scene_cut_signal(df, "doc_id", "text").collect()
    d1 = [r for r in rows if r.doc_id == 1]
    assert len(d1) == 3 and all(r.n_changed == 0 and r.is_cut == 0 for r in d1)
    d2 = sorted((r for r in rows if r.doc_id == 2), key=lambda r: r.frame_idx)
    assert [r.n_changed for r in d2] == [64, 64]
    assert [r.is_cut for r in d2] == [1, 1]


def test_sssp_relaxation_small_graph(spark):
    """Bellman-Ford helper semantics on a hand-checked graph: the
    2-edge path (1 -> 3 -> 2, cost 1+1) must beat the direct edge
    (1 -> 2, cost 5) — the thing hop-BFS gets wrong."""
    edges = spark.createDataFrame(
        [(1, 2, 5), (1, 3, 1), (3, 2, 1)], "src long, dst long, w long"
    )
    dist = spark.createDataFrame([(1, 0)], "node long, dist long")
    for _ in range(3):
        relaxed = dist.join(edges, dist.node == edges.src).select(
            F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("dist")
        )
        dist = dist.unionAll(relaxed).groupBy("node").agg(
            F.min("dist").alias("dist")
        )
    got = {r.node: r.dist for r in dist.collect()}
    assert got == {1: 0, 2: 2, 3: 1}


def test_jdbc_upsert_key_matches_batch_counts(spark):
    """End-to-end: after the two conflicting deliveries, the Derby
    table equals the full per-(type, day) batch counts — i.e. the MERGE
    update branch really replaced the partial rows."""
    import __spark_entry__ as e

    got = {
        (r.event_type, r.day): r.n
        for r in e.queries()["stream_jdbc_upsert"](spark, SF).collect()
    }
    ev = load_table(spark, SF, "events")
    want = {
        (r.event_type, r.day): r.n
        for r in ev.groupBy(
            "event_type",
            F.date_format(F.date_trunc("DAY", "ts"), "yyyy-MM-dd").alias("day"),
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_quality_logreg_monotone_threshold(spark):
    """keep == (logit_e6 >= 0) must hold row-for-row (the sigmoid-free
    classification claim)."""
    import __spark_entry__ as e

    rows = e.queries()["text_quality_logreg"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.keep == (1 if r.logit_e6 >= 0 else 0)


def test_ivf_partitioned_scan_prunes_cells(spark):
    """The probe's re-read of the cell-partitioned corpus must prune at
    the DIRECTORY level: PartitionFilters on `cell`, and only the 2
    probed cells' files scanned."""
    import contextlib
    import io
    import re

    from mediaplaycounts_spark.queries.llm import _ann_ivf_partitioned_raw

    df = _ann_ivf_partitioned_raw(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), "expected a cell partition filter"
    assert df.count() == 20


def test_bucket_lookup_prunes_buckets(spark):
    """The point-lookup scan must open only the matching bucket files:
    SelectedBucketsCount strictly below the total 8."""
    import contextlib
    import io
    import re

    import __spark_entry__ as e

    df = e.queries()["scan_bucket_pruned_lookup"](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", buf.getvalue())
    assert m, "expected bucket pruning in the scan node"
    assert int(m.group(1)) < int(m.group(2)), m.group(0)
