"""Closed-form unit tests for the round-4 operators.

The registry oracles grade these against DuckDB at the testdata SFs;
these tests grade them against HAND-COMPUTED expectations on tiny
fixtures, so a bug that slipped into both the Spark plan and its
oracle SQL symmetrically would still be caught (FIXTURES.md
discipline).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_active_day_islands_closed_form(spark, tmp_path):
    """User 1: days 1,2,3, 7,8, 10 -> islands (3,2,1), longest 3."""
    rows = []
    for d in (1, 2, 3, 7, 8, 10):
        rows.append((d, f"2024-01-{d:02d} 10:00:00", 1, "view", 1.0, "{}"))
    rows.append((99, "2024-01-05 10:00:00", 2, "view", 1.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = str(tmp_path / "events.parquet")
    df.write.parquet(out)
    got = {
        r.user_id: (r.n_active_days, r.n_islands, r.longest_streak_days)
        for r in entrymod.queries()["win_active_day_islands"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {1: (6, 3, 3), 2: (1, 1, 1)}


def test_span_corruption_closed_form(spark):
    """n_tokens=23 -> q=2,r=3: spans 3, masked 2*3+3=9, ppm 391304."""
    df = entrymod.queries()["pipeline_span_corruption"](spark, SF)
    row = df.filter(F.col("n_tokens") == 23).head()
    if row is None:  # fall back to arithmetic on any row
        row = df.head()
    n = row.n_tokens
    q, r = divmod(n, 10)
    assert row.n_spans == q + (1 if r else 0)
    assert row.n_masked == q * 3 + (min(r, 3) if r else 0)
    assert row.mask_ppm == row.n_masked * 1_000_000 // n


def test_weighted_median_tiny(spark, tmp_path):
    """values (cents) 100, 100, 300: total 500, half 250 -> the
    cumulative reaches 250 at the 300-cent row => median 300 (the
    mass-weighted pull toward big values the plain median misses)."""
    rows = [
        (1, "2024-01-01 00:00:00", 1, "view", 1.00, "{}"),
        (2, "2024-01-01 00:00:01", 2, "view", 1.00, "{}"),
        (3, "2024-01-01 00:00:02", 3, "view", 3.00, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    df.write.parquet(str(tmp_path / "events.parquet"))
    got = entrymod.queries()["agg_weighted_median"](
        spark, str(tmp_path)
    ).collect()
    assert len(got) == 1
    assert got[0].weighted_median_cents == 300
    assert got[0].total_weight_cents == 500


def test_log2_histogram_bucket_math(spark):
    df = entrymod.queries()["agg_log2_histogram"](spark, SF)
    for r in df.collect():
        assert r.bucket_lo_cents == 1 << r.bucket
        assert r.bucket_lo_cents <= r.min_cents <= r.max_cents
        assert r.max_cents < 2 * r.bucket_lo_cents


def test_tlv_metadata_parses_both_field_orders(spark):
    df = entrymod.queries()["multimodal_tlv_metadata"](spark, SF)
    rows = {r.doc_id: r for r in df.collect()}
    assert rows, "no docs"
    for doc_id, r in rows.items():
        assert r.width == 16 + doc_id % 240
        assert r.height == 16 + (doc_id // 7) % 240
        assert r.codec_id == doc_id % 5
        assert r.n_pixels == r.width * r.height
        # 3 records: (tag1+len1+val2) + (tag1+len1+val2) + (tag1+len1+val1)
        assert r.blob_bytes == 11


def test_rake_phrases_score_content_words(spark):
    """Top RAKE words must never be stopwords, and scores obey
    degree >= freq (every host phrase has length >= 1)."""
    from mediaplaycounts_spark.queries.llm import _RAKE_STOPWORDS

    df = entrymod.queries()["text_rake_keywords"](spark, SF)
    rows = df.collect()
    assert rows
    for r in rows:
        assert r.word not in _RAKE_STOPWORDS
        assert r.degree >= r.freq >= 3
        assert r.rake_ppm == r.degree * 1_000_000 // r.freq


def test_dataset_diff_statuses(spark):
    got = {
        r.status: r.n_docs
        for r in entrymod.queries()["pipeline_dataset_diff"](
            spark, SF
        ).collect()
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    removed = sum(1 for i in ids if i % 13 == 0)
    added = sum(1 for i in ids if i % 17 == 0)
    changed = sum(1 for i in ids if i % 13 != 0 and i % 11 == 0)
    unchanged = sum(1 for i in ids if i % 13 != 0 and i % 11 != 0)
    assert got.get("removed", 0) == removed
    assert got.get("added", 0) == added
    assert got.get("changed", 0) == changed
    assert got.get("unchanged", 0) == unchanged


def test_bloom_pruned_probe_in_plan(spark):
    """The runtime filter must be a codegen predicate on the FACT scan
    (xxhash64 probe), and the result must equal the un-pruned join."""
    import contextlib
    import io

    df = entrymod.queries()["join_bloom_pruned"](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert "xxhash64(l_suppkey" in buf.getvalue()
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    sup = spark.read.parquet(f"{SF}/supplier.parquet").filter(
        F.col("s_nationkey") == 7
    )
    plain = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("revenue_cents"),
        )
    )
    assert {tuple(r) for r in df.collect()} == {
        tuple(r) for r in plain.collect()
    }


def test_fertility_identity(spark):
    for r in entrymod.queries()["text_token_fertility"](spark, SF).collect():
        assert r.fertility_ppm == r.n_tokens * 1_000_000 // r.n_words
        assert r.bytes_per_token_ppm == r.n_bytes * 1_000_000 // r.n_tokens
        assert r.n_tokens >= r.n_words  # pretokenizer only splits finer


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    df = entrymod.queries()["agg_bootstrap_ci_poisson"](spark, SF)
    rows1 = {tuple(r) for r in df.collect()}
    rows2 = {
        tuple(r)
        for r in entrymod.queries()["agg_bootstrap_ci_poisson"](
            spark, SF
        ).collect()
    }
    assert rows1 == rows2, "resampling must be deterministic"
    for r in rows1:
        _, n, mean_ppm, lo, hi = r
        assert lo <= hi
        # the band must bracket a neighborhood of the exact mean
        assert lo <= mean_ppm * 1.2 and hi >= mean_ppm * 0.8


def test_code_detection_flags_synthetic_code(spark, tmp_path):
    rows = [
        (1, "def foo(x): return {x: [1, 2]}; y = x != z", "en", "s", 40),
        (2, "plain prose with ordinary words and no symbols at all",
         "en", "s", 52),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.doc_id: r.is_code_like
        for r in entrymod.queries()["text_code_detection"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {1: 1, 2: 0}


def test_time_decay_halves_by_week(spark, tmp_path):
    rows = [
        (1, "2024-01-15 00:00:00", 1, "view", 1.00, "{}"),  # newest: w=1e6
        (2, "2024-01-08 00:00:00", 1, "view", 1.00, "{}"),  # 7d: w=5e5
        (3, "2024-01-01 00:00:00", 1, "view", 1.00, "{}"),  # 14d: w=2.5e5
    ]
    spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string,"
        " value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz")).write.parquet(
        str(tmp_path / "events.parquet")
    )
    r = entrymod.queries()["win_time_decay_score"](
        spark, str(tmp_path)
    ).collect()[0]
    assert r.raw_value_cents == 300
    assert r.decayed_value_e6 == 100 * (1000000 + 500000 + 250000)
