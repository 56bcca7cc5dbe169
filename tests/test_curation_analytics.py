"""Semantics + plan-shape tests for the analytics/curation extensions.

Value parity vs DuckDB is covered by tools/check_correctness.py; these
pin the invariants the oracle can't express — funnel monotonicity,
retention-matrix structure, sampling stability under repartitioning —
and the physical-plan claims each docstring makes (zero-shuffle narrow
ops, broadcast contamination join).
"""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_SMOKE
from tests.test_plans import plan_of, shuffles


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as e

    return e.queries()


# ------------------------------------------------------------ analytics


def test_funnel_counts_are_monotone(spark, queries):
    row = queries["agg_funnel_steps"](spark, SF_SMOKE).collect()[0]
    assert row.n_view >= row.n_click_after_view >= row.n_purchase_after_click
    assert row.n_view > 0


def test_retention_matrix_structure(spark, queries):
    rows = queries["agg_retention_cohorts"](spark, SF_SMOKE).collect()
    assert all(r.day_offset >= 0 for r in rows)
    # Every cohort has its day-0 cell, and it is the cohort's max cell
    # (a user can't return on day k without existing on day 0).
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r.cohort, {})[r.day_offset] = r.n_users
    for cohort, cells in by_cohort.items():
        assert 0 in cells, cohort
        assert cells[0] == max(cells.values()), cohort


def test_variance_matches_float_reference(spark, queries):
    from mediaplaycounts_spark.tables import load_table

    got = {
        r.event_type: r
        for r in queries["agg_variance_exact"](spark, SF_SMOKE).collect()
    }
    vals: dict = {}
    for r in load_table(spark, SF_SMOKE, "events").select(
        "event_type", "value"
    ).collect():
        vals.setdefault(r.event_type, []).append(round(r.value * 100) / 100)
    for et, xs in vals.items():
        mean = sum(xs) / len(xs)
        var = sum((x - mean) ** 2 for x in xs) / len(xs)
        assert got[et].n == len(xs)
        assert math.isclose(got[et].mean_value, mean, abs_tol=1e-4)
        assert math.isclose(got[et].var_pop, var, rel_tol=1e-6, abs_tol=1e-4)
        assert math.isclose(got[et].std_pop, math.sqrt(var), abs_tol=1e-4)


# ------------------------------------------------------------- curation


def test_pii_redaction_is_complete(spark, queries):
    df = queries["text_pii_redact"](spark, SF_SMOKE)
    rows = df.collect()
    assert all(r.n_emails >= 1 and r.n_phones >= 1 for r in rows)
    assert all("<EMAIL>" in r.redacted and "<PHONE>" in r.redacted for r in rows)
    assert not any("@example.com" in r.redacted for r in rows)
    assert shuffles(plan_of(df)) == 0


def test_gopher_keep_flag_matches_rules(spark, queries):
    df = queries["text_gopher_quality"](spark, SF_SMOKE)
    rows = df.collect()
    kept = [r for r in rows if r.keep == 1]
    assert 0 < len(kept) < len(rows)  # both branches exercised
    for r in rows:
        expect = (
            30 <= r.n_words <= 70
            and 3.0 <= r.mean_word_len <= 6.0
            and r.stop_count >= 2
        )
        # mean_word_len is rounded to 6dp; the band edges are far from
        # any real corpus value, so the rounded check is equivalent.
        assert bool(r.keep) == expect, r
    assert shuffles(plan_of(df)) == 0


def test_quality_rank_band_cardinality(spark, queries):
    from mediaplaycounts_spark.tables import load_table

    per_lang_total: dict = {}
    for r in (
        load_table(spark, SF_SMOKE, "documents").groupBy("lang").count().collect()
    ):
        per_lang_total[r.lang] = r["count"]
    kept: dict = {}
    for r in queries["filter_quality_rank"](spark, SF_SMOKE).collect():
        kept[r.lang] = kept.get(r.lang, 0) + 1
    for lang, cnt in per_lang_total.items():
        # 20*rn > cnt AND 20*rn <= 19*cnt keeps floor(19c/20) - floor(c/20).
        assert kept.get(lang, 0) == (19 * cnt) // 20 - cnt // 20, lang


def test_stratified_sample_is_stable_and_stratified(spark, queries):
    df = queries["sample_stratified"](spark, SF_SMOKE)
    first = {r.doc_id for r in df.collect()}
    again = {r.doc_id for r in df.repartition(7).collect()}
    assert first == again  # pure function of doc_id — no RNG state
    assert shuffles(plan_of(df)) == 0


def test_contamination_excludes_benchmark_and_broadcasts(spark, queries):
    df = queries["text_contamination_overlap"](spark, SF_SMOKE)
    rows = df.collect()
    assert all(r.doc_id % 97 != 0 for r in rows)
    assert all((r.contaminated == 1) == (r.n_shared >= 3) for r in rows)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan  # bench trigram set never shuffles


# ------------------------------------------------------- modern surface


def test_argmax_matches_window_formulation(spark, queries):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mediaplaycounts_spark.queries._helpers import cents
    from mediaplaycounts_spark.tables import load_table

    got = {
        r.day: (r.top_user, r.top_value)
        for r in queries["agg_argmax_daily"](spark, SF_SMOKE).collect()
    }
    ev = load_table(spark, SF_SMOKE, "events")
    per_user = ev.groupBy(F.date_trunc("DAY", "ts").alias("day"), "user_id").agg(
        F.sum(cents("value")).alias("c")
    )
    w = Window.partitionBy("day").orderBy(F.desc("c"), "user_id")
    expect = {
        r.day: (r.user_id, r.c / 100.0)
        for r in per_user.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }
    assert got == expect


def test_unpivot_roundtrips_long_counts(spark, queries):
    from pyspark.sql import functions as F

    from mediaplaycounts_spark.tables import load_table

    df = queries["reshape_unpivot"](spark, SF_SMOKE)
    total = df.agg(F.sum("n")).collect()[0][0]
    assert total == load_table(spark, SF_SMOKE, "events").count()
    days = df.select("day").distinct().count()
    assert df.count() == days * 5  # zero-filled: every (day, type) cell


def test_variant_extract_stays_jvm_side(spark, queries):
    df = queries["json_variant_extract"](spark, SF_SMOKE)
    plan = plan_of(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    rows = {r.event_type: r for r in df.collect()}
    assert set(rows) == {"click", "error", "purchase", "signup", "view"}
    assert all(0 <= r.min_k <= r.max_k <= 99 for r in rows.values())


# --------------------------------------------- streaks + histogram


def test_streaks_hand_computed(spark, tmp_path, queries):
    import datetime as dt

    t0 = dt.datetime(2024, 5, 1)
    # user 1: days 0,1,2 then 5,6 -> longest 3, two streaks.
    # user 2: day 0 only -> longest 1, one streak.
    rows = [(i, t0 + dt.timedelta(days=d), u, "view", 1.0)
            for i, (u, d) in enumerate([(1, 0), (1, 1), (1, 2), (1, 5), (1, 6), (2, 0)])]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {r.user_id: r for r in queries["win_streak_runs"](spark, str(tmp_path)).collect()}
    assert out[1].longest_streak == 3 and out[1].n_streaks == 2
    assert out[2].longest_streak == 1 and out[2].n_streaks == 1
    assert out[1].first_day.date() == dt.date(2024, 5, 1)


def test_histogram_buckets_partition_counts(spark, queries):
    from mediaplaycounts_spark.tables import load_table

    rows = queries["agg_histogram_value"](spark, SF_SMOKE).collect()
    n_events = load_table(spark, SF_SMOKE, "events").count()
    assert sum(r.n for r in rows) == n_events
    for r in rows:
        assert r.hi - r.lo == 50.0
        assert r.n > 0


def test_attribution_last_touch_invariants(spark, queries):
    rows = queries["agg_attribution_last_touch"](spark, SF_SMOKE).collect()
    assert len(rows) > 0
    assert any(r.attributed == 1 for r in rows)
    for r in rows:
        if r.attributed:
            assert r.t_last_click <= r.t_purchase
            assert r.seconds_since_click >= 0
        else:
            assert r.t_last_click is None and r.seconds_since_click is None


def test_stream_static_join_weights(spark, queries):
    rows = queries["stream_join_static_dim"](spark, SF_SMOKE).collect()
    weights = {"view": 1, "click": 3, "signup": 5, "purchase": 10, "error": 0}
    assert {r.event_type for r in rows} == set(weights)
    for r in rows:
        assert r.weighted_n == r.n * weights[r.event_type]


def test_stream_stream_join_band(spark, queries):
    rows = queries["stream_stream_join"](spark, SF_SMOKE).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r.secs_to_purchase <= 3600


def test_streaming_checkpoint_is_exactly_once(spark, tmp_path):
    """Re-running an AvailableNow stream against an unchanged source
    with the SAME checkpoint must add zero rows to the sink."""
    from mediaplaycounts_spark.streaming.jobs import read_events_stream

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            read_events_stream(spark, SF_SMOKE)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n1 = spark.read.parquet(sink).count()
    run_once()
    n2 = spark.read.parquet(sink).count()
    assert n1 > 0
    assert n2 == n1  # checkpoint replays nothing


def test_corr_exact_in_range(spark, queries):
    rows = queries["agg_corr_exact"](spark, SF_SMOKE).collect()
    assert len(rows) == 3  # returnflags A, N, R
    for r in rows:
        assert -1.0 <= r.corr_qty_price <= 1.0


def test_embedding_centroid_grid(spark, queries):
    rows = queries["agg_embedding_centroid"](spark, SF_SMOKE).collect()
    by_label: dict = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(r)
    assert set(by_label) == set(range(10))
    for label, comps in by_label.items():
        assert len(comps) == 64, label  # one row per dimension
        assert len({c.n_vectors for c in comps}) == 1  # same count each dim


def test_gini_bounds_and_extremes(spark, tmp_path, queries):
    import datetime as dt

    t0 = dt.datetime(2024, 7, 1)
    # 'view': perfectly equal 4 users -> G = 0.
    rows = [(i, t0, u, "view", 10.0) for i, u in enumerate(range(1, 5))]
    # 'click': one whale among 4 users -> G = (n-1)/n * ... high.
    rows += [(10 + u, t0, u, "click", 0.01) for u in range(1, 4)]
    rows.append((14, t0, 4, "click", 1000.0))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {r.event_type: r for r in queries["agg_gini_concentration"](spark, str(tmp_path)).collect()}
    assert out["view"].gini == 0.0
    assert out["click"].gini > 0.7
    for r in out.values():
        assert 0.0 <= r.gini < 1.0


def test_lateral_topn_decorrelates(spark, queries):
    from tests.test_plans import plan_of

    df = queries["join_lateral_topn"](spark, SF_SMOKE)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan  # decorrelated, not N+1
    rows = queries["join_lateral_topn"](spark, SF_SMOKE).collect()
    assert len({r.c_custkey for r in rows}) == len(rows)  # one order each


def test_union_by_name_nullfills(spark, queries):
    rows = queries["setop_union_by_name_missing"](spark, SF_SMOKE).collect()
    v1 = [r for r in rows if r.src == "v1"]
    v2 = [r for r in rows if r.src == "v2"]
    assert v1 and v2
    assert all(r.o_orderpriority is None for r in v1)
    assert all(r.o_orderpriority is not None for r in v2)
