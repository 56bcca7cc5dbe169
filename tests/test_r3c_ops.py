"""Focused unit tests for the round-3 continuation operators: the
batches added after the 236-key gate (as-of nearest, interval merge,
chi-square, HITS, geo grid join, OLS, BPE rounds, image resize, sweep,
profiler, feature vectors). The sf0.01 oracle sweep grades values;
these assert the structural/mathematical guarantees the docstrings
promise."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mediaplaycounts_spark.registry import get
from mediaplaycounts_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def run(key, spark, sf=SF):
    return get(key).fn(spark, sf)


# ---------------------------------------------------------- as-of nearest


def test_asof_nearest_picks_true_minimum(spark):
    """Each click's |Δt| equals the true min over that user's purchases,
    with the documented backward tie preference."""
    out = run("join_asof_nearest", spark).toPandas()
    ev = load_table(spark, SF, "events").toPandas()
    purchases = ev[ev.event_type == "purchase"].groupby("user_id")["ts"].apply(list)
    for row in out.head(200).itertuples():
        plist = purchases.get(row.user_id)
        if plist is None:
            assert row.direction is None and pd.isna(row.abs_us)
            continue
        deltas = [abs((p - row.ts).value // 1000) for p in pd.Series(plist)]
        assert row.abs_us == min(deltas)
        back = [p for p in plist if p <= row.ts]
        if back and (row.ts - max(back)).value // 1000 == row.abs_us:
            assert row.direction == "backward"  # tie -> backward


# ---------------------------------------------------------- interval merge


def test_interval_merge_islands_disjoint_and_cover(spark):
    out = run("ts_interval_merge", spark).toPandas()
    ev_n = load_table(spark, SF, "events").count()
    assert out.n_events.sum() == ev_n
    for _, g in out.groupby("user_id"):
        g = g.sort_values("island_id")
        # islands strictly ordered and non-overlapping per user
        assert (g.start_ts.values[1:] > g.end_ts.values[:-1]).all()
        assert (g.end_ts >= g.start_ts).all()


# ------------------------------------------------------------- chi-square


def test_chi_square_marginals_consistent(spark):
    out = run("agg_chi_square_independence", spark).toPandas()
    n = out.o.sum()
    # expected counts (ppm) reproduce the grand total within floor error
    assert abs(out.expected_ppm.sum() - n * 1_000_000) <= len(out)
    assert (out.chi2_ppm >= 0).all()


# ------------------------------------------------------------------- HITS


def test_hits_normalized_and_bipartite(spark):
    out = run("graph_hits_int", spark).toPandas()
    hubs = out[out.kind == "hub"]
    auth = out[out.kind == "authority"]
    assert hubs.score_ppm.max() == 1_000_000
    assert auth.score_ppm.max() == 1_000_000
    assert (out.score_ppm >= 0).all()
    assert (hubs.node_id % 2 == 0).all() and (auth.node_id % 2 == 1).all()


# ----------------------------------------------------------- geo grid join


def test_geo_grid_matches_brute_force(spark):
    """The 3x3-cell blocked join finds EXACTLY the brute-force pair set."""
    out = run("join_geo_grid", spark).toPandas()
    cust = load_table(spark, SF, "customer").toPandas()
    lat = (cust.c_custkey * 48271) % 180000000 - 90000000
    lon = (cust.c_custkey * 69621) % 360000000 - 180000000
    pts = np.stack([lat.to_numpy(), lon.to_numpy()], axis=1)
    ids = cust.c_custkey.to_numpy()
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    ii, jj = np.where((d2 <= 250_000_000_000) & (ids[:, None] < ids[None, :]))
    expect = {(int(ids[i]), int(ids[j])) for i, j in zip(ii, jj)}
    got = {(int(a), int(b)) for a, b in zip(out.id_a, out.id_b)}
    assert got == expect


# -------------------------------------------------------------------- OLS


def test_ols_matches_numpy_centered_solution(spark):
    out = run("agg_ols_normal_eq", spark).toPandas().set_index("l_returnflag")
    li = load_table(spark, SF, "lineitem").toPandas()
    for flag, g in li.groupby("l_returnflag"):
        x1 = np.round(g.l_quantity).astype(np.int64)
        x2 = np.round(g.l_discount * 100).astype(np.int64)
        y = np.round(g.l_extendedprice * 100).astype(np.int64)
        X = np.stack([x1 - x1.mean(), x2 - x2.mean()], axis=1)
        b, *_ = np.linalg.lstsq(X, y - y.mean(), rcond=None)
        assert abs(out.loc[flag].slope_qty_e3 - b[0] * 1000) <= 2
        assert abs(out.loc[flag].slope_disc_e3 - b[1] * 1000) <= 2


# -------------------------------------------------------------- BPE rounds


def test_bpe_rounds_monotone_and_true_argmax(spark):
    out = run("text_bpe_merge_rounds", spark).toPandas().set_index("round")
    docs = load_table(spark, SF, "documents").toPandas()
    # round-1 winner is the true adjacency argmax (count desc, pair asc)
    from collections import Counter

    c = Counter()
    total0 = 0
    for t in docs.text:
        toks = t.split(" ")
        total0 += len(toks)
        c.update(zip(toks, toks[1:]))
    best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
    assert (out.loc[1].left_tok, out.loc[1].right_tok) == best[0]
    assert out.loc[1].pair_n == best[1]
    # each merge strictly shrinks the corpus; winner counts non-increasing
    assert out.loc[1].tokens_after < total0
    assert out.loc[2].tokens_after < out.loc[1].tokens_after
    assert out.loc[2].pair_n <= out.loc[1].pair_n


# ------------------------------------------------------------ image resize


def test_image_resize_matches_numpy_reference(spark):
    from mediaplaycounts_spark.operators import multimodal as M

    out = run("multimodal_image_resize", spark).toPandas().set_index("doc_id")
    for doc_id in (0, 7, 41, 80):
        w, h, px = M.parse_ppm(M.synth_ppm_bytes(doc_id))
        rr = (np.arange(4) * h) // 4
        cc = (np.arange(4) * w) // 4
        thumb = px[rr][:, cc].reshape(-1, 3).sum(axis=0, dtype=np.int64)
        row = out.loc[doc_id]
        assert (row.width, row.height) == (w, h)
        assert (row.r4_sum, row.g4_sum, row.b4_sum) == tuple(thumb)


# ------------------------------------------------------------ trend family


def test_rolling_slope_null_only_at_series_start(spark):
    out = run("win_rolling_slope", spark).toPandas()
    assert out.k.between(1, 7).all()
    assert (out.slope7_e6.isna() == (out.k == 1)).all()


def test_theil_sen_within_pairwise_range(spark):
    out = run("ts_theil_sen", spark).toPandas()
    daily = (
        load_table(spark, SF, "events")
        .groupBy("event_type", F.date_trunc("DAY", "ts").alias("d"))
        .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("c"))
        .toPandas()
    )
    for row in out.itertuples():
        g = daily[daily.event_type == row.event_type].sort_values("d")
        n = len(g)
        assert row.n_pairs == n * (n - 1) // 2
        x = (g.d - pd.Timestamp("2024-01-01")).dt.days.to_numpy()
        y = g.c.to_numpy()
        slopes = [
            (y[j] - y[i]) * 1_000_000 // (x[j] - x[i])
            if (y[j] - y[i]) * (x[j] - x[i]) >= 0
            else -((-(y[j] - y[i]) * 1_000_000) // (x[j] - x[i]))
            for i in range(n)
            for j in range(i + 1, n)
        ]
        assert min(slopes) <= row.theil_sen_e6 <= max(slopes)


# ---------------------------------------------------- corpus summary family


def test_dataset_card_rates_bounded(spark):
    out = run("pipeline_dataset_card", spark).toPandas()
    assert (out.dup_ppm.between(0, 1_000_000)).all()
    assert (out.n_langs >= 1).all()
    assert (out.mean_chars_e2 * out.n_docs <= out.total_chars * 100).all()


def test_vocab_coverage_bounded_and_consistent(spark):
    out = run("pipeline_vocab_coverage", spark).toPandas()
    assert (out.vocab_tokens <= out.total_tokens).all()
    assert (out.coverage_ppm.between(0, 1_000_000)).all()


def test_table_profile_consistency(spark):
    out = run("scan_table_profile", spark).toPandas().set_index("col_name")
    n = load_table(spark, SF, "events").count()
    assert (out.n_nulls >= 0).all()
    assert (out.n_distinct <= n).all()
    assert out.loc["event_id"].n_distinct == n  # primary key


def test_feature_vector_layout_contract(spark):
    out = run("pipeline_feature_vector_assemble", spark).toPandas()
    assert (out.feature_vec.map(len) == 6).all()
    # first five slots are the per-type counts and sum to n_events
    assert (
        out.feature_vec.map(lambda v: sum(v[:5])) == out.n_events
    ).all()


def test_threshold_sweep_monotone(spark):
    out = run("sim_threshold_sweep", spark).toPandas()
    for _, g in out.groupby("label"):
        g = g.sort_values("thr_ppm")
        assert (np.diff(g.n_pairs.to_numpy()) <= 0).all()


# ------------------------------------------------------- star / incremental


def test_star_cube_total_matches_flat_aggregate(spark):
    out = run("join_star_multi_dim", spark)
    total = out.agg(F.sum("revenue_e4"), F.sum("n_items")).collect()[0]
    li = load_table(spark, SF, "lineitem")
    flat = li.agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100, 0).cast("long")
            * (100 - F.round(F.col("l_discount") * 100, 0).cast("long"))
        ),
        F.count("*"),
    ).collect()[0]
    assert total[0] == flat[0] and total[1] == flat[1]


def test_maxfiles_incremental_is_multi_batch(spark):
    out = run("stream_maxfiles_incremental", spark).toPandas()
    assert out.multi_batch.all()
    assert out.n.sum() == load_table(spark, SF, "events").count()


def test_map_in_arrow_matches_python_reference(spark):
    out = run("udf_map_in_arrow", spark).toPandas().set_index("doc_id")
    docs = load_table(spark, SF, "documents").toPandas().set_index("doc_id")
    for doc_id in docs.index[:25]:
        t = docs.loc[doc_id].text
        assert out.loc[doc_id].n_bytes == len(t.encode("utf-8"))
        assert out.loc[doc_id].n_ws_tokens == len(t.split(" "))
        assert out.loc[doc_id].n_upper == sum(
            1 for ch in t if "A" <= ch <= "Z"
        )


# ----------------------------------------------------- storage layout


def test_sorted_write_rowgroup_stats_tight(spark, tmp_path):
    """write_ts_sorted must produce non-overlapping per-file ts ranges
    (range clustering) so footer stats can prune the one-day probe."""
    import pyarrow.parquet as pq
    from pathlib import Path

    from mediaplaycounts_spark.queries.scans import write_ts_sorted

    ev = load_table(spark, SF, "events").select("event_id", "ts", "value")
    out = str(tmp_path / "sorted")
    write_ts_sorted(ev, out, n_files=4)
    spans = []
    for f in Path(out).glob("*.parquet"):
        md = pq.ParquetFile(f).metadata
        col = {md.schema.column(i).name: i for i in range(md.num_columns)}["ts"]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col).statistics
            spans.append((st.min, st.max))
    spans.sort()
    assert len(spans) >= 4
    # ranges are internally ordered and pairwise non-overlapping
    for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
        assert a0 <= a1 and a1 <= b0


def test_basket_lift_self_consistent(spark):
    out = run("agg_basket_lift_pairs", spark).toPandas()
    assert (out.n_ab >= 2).all()
    assert (out.confidence_ppm.between(0, 1_000_000)).all()
    assert (out.lift_ppm > 0).all()


def test_rfm_scores_quintile_shape(spark):
    out = run("agg_rfm_scores", spark).toPandas()
    for c in ("r_score", "f_score", "m_score"):
        counts = out[c].value_counts()
        assert set(counts.index) <= {1, 2, 3, 4, 5}
        assert counts.max() - counts.min() <= 1  # ntile balance
    assert (out.segment.str.len() == 3).all()


def test_update_mode_reaches_batch_fixed_point(spark):
    out = run("stream_update_mode_final", spark).toPandas()
    batch = (
        load_table(spark, SF, "events")
        .groupBy("event_type")
        .count()
        .toPandas()
        .set_index("event_type")
    )
    for row in out.itertuples():
        assert row.n == batch.loc[row.event_type]["count"]


def test_pvm_effects_sum_to_delta(spark):
    """Price effect + volume effect must reconstruct the exact revenue
    delta (up to the two e-3 floors) — the decomposition identity."""
    out = run("agg_price_volume_mix", spark).toPandas()
    resid = out.delta_cents * 1000 - (out.price_effect_e3 + out.volume_effect_e3)
    assert (resid.abs() <= 2).all()


def test_cumulative_uniques_monotone_total(spark):
    out = run("ts_cumulative_uniques", spark).toPandas().sort_values("day")
    assert (out.users_to_date.diff().dropna() > 0).all() or len(out) == 1
    n_users = load_table(spark, SF, "events").select("user_id").distinct().count()
    assert out.users_to_date.iloc[-1] == n_users
    assert out.n_new.sum() == n_users


def test_pareto_shares_sum_to_whole(spark):
    out = run("agg_pareto_share", spark).toPandas()
    assert abs(out.event_share_ppm.sum() - 1_000_000) <= len(out)
    assert abs(out.value_share_ppm.sum() - 1_000_000) <= len(out)
    # deciles ordered by activity: first decile has the largest share
    assert out.set_index("decile").event_share_ppm.idxmax() == 1


def test_agg_pushdown_engages_and_restores_confs(spark):
    """The footer-pushdown key must (a) have executed via a plan with
    PushedAggregation (it self-asserts and raises otherwise) and
    (b) leave the session's source confs untouched for every other key."""
    before = spark.conf.get("spark.sql.sources.useV1SourceList")
    out = run("scan_agg_pushdown_footer", spark).toPandas()
    assert spark.conf.get("spark.sql.sources.useV1SourceList") == before
    li = load_table(spark, SF, "lineitem").toPandas()
    assert out.n_rows[0] == len(li)
    assert out.min_partkey[0] == li.l_partkey.min()
    assert out.max_partkey[0] == li.l_partkey.max()


def test_rate_limit_flags_match_pandas_window(spark):
    out = run("win_rate_limit_flags", spark).toPandas()
    ev = load_table(spark, SF, "events").toPandas()
    sample = out.sample(n=min(100, len(out)), random_state=7)
    by_user = {u: g.ts.sort_values().to_numpy() for u, g in ev.groupby("user_id")}
    for row in sample.itertuples():
        ts = ev[ev.event_id == row.event_id].ts.iloc[0]
        arr = by_user[row.user_id]
        lo = ts - pd.Timedelta(minutes=10)
        assert row.n_10m == ((arr >= lo) & (arr <= ts)).sum()


def test_mixture_temperature_flattens_distribution(spark):
    out = run("pipeline_mixture_temperature", spark).toPandas()
    assert abs(out.natural_ppm.sum() - 1_000_000) <= len(out)
    assert abs(out.tempered_ppm.sum() - 1_000_000) <= len(out)
    # temperature < 1 compresses the range of shares
    assert (out.tempered_ppm.max() - out.tempered_ppm.min()) <= (
        out.natural_ppm.max() - out.natural_ppm.min()
    )


# ------------------------------------------------- late-batch invariants


def test_shipping_sla_bounds(spark):
    out = run("agg_shipping_sla", spark).toPandas()
    assert (out.sla30_ppm.between(0, 1_000_000)).all()
    assert (out.p90_lag_days <= out.max_lag_days).all()


def test_abc_classes_ordered_by_revenue(spark):
    out = run("win_abc_classification", spark).toPandas()
    means = out.groupby("abc_class").cents.mean()
    present = [c for c in ("A", "B", "C") if c in means.index]
    assert means.reindex(present).is_monotonic_decreasing
    assert set(out.abc_class) <= {"A", "B", "C"} and "A" in set(out.abc_class)


def test_cluster_size_histogram_accounts_every_doc(spark):
    out = run("dedup_cluster_size_histogram", spark).toPandas()
    n_docs = load_table(spark, SF, "documents").count()
    assert out.n_docs.sum() == n_docs
    assert (out.n_docs == out.cluster_size * out.n_clusters).all()


def test_dow_index_weighted_mean_is_unity(spark):
    out = run("agg_dow_seasonality_index", spark).toPandas()
    daily = (
        load_table(spark, SF, "events")
        .groupBy("event_type", F.date_trunc("DAY", "ts").alias("d"))
        .count()
        .toPandas()
    )
    for et, g in out.groupby("event_type"):
        days = daily[daily.event_type == et]
        dow_days = (days.d.dt.dayofweek.map(lambda x: (x + 1) % 7 + 1)).value_counts()
        total_days = len(days)
        w = sum(
            row.seasonal_index_ppm * dow_days.get(row.dow, 0)
            for row in g.itertuples()
        )
        assert abs(w / total_days - 1_000_000) <= len(g) + 1


def test_first_touch_not_after_last_touch(spark):
    first = (
        run("agg_attribution_first_touch", spark)
        .toPandas()
        .set_index("purchase_id")
    )
    last = (
        run("agg_attribution_last_touch", spark)
        .toPandas()
        .set_index("purchase_id")
    )
    j = first.join(last, lsuffix="_f", rsuffix="_l")
    m = j.dropna(subset=["t_first_click", "t_last_click"])
    assert (m.t_first_click <= m.t_last_click).all()
    assert (first.attributed == last.attributed).all()


def test_image_histogram_covers_every_pixel(spark):
    out = run("multimodal_image_histogram", spark).toPandas()
    from mediaplaycounts_spark.operators import multimodal as M

    per = out.groupby(["doc_id", "channel"]).n_px.sum()
    for doc_id in (0, 40, 80):
        w, h, _ = M.parse_ppm(M.synth_ppm_bytes(doc_id))
        for ch in range(3):
            assert per.loc[(doc_id, ch)] == w * h


def test_cross_source_counts_consistent(spark):
    out = run("dedup_cross_source", spark).toPandas()
    if len(out):
        assert (out.n_sources <= out.n_docs).all()
        assert ((out.cross_source == 1) == (out.n_sources >= 2)).all()


def test_heatmap_accounts_every_event(spark):
    out = run("agg_activity_heatmap", spark).toPandas()
    assert out.n.sum() == load_table(spark, SF, "events").count()
    assert out.dow.between(1, 7).all() and out.hod.between(0, 23).all()


def test_star_except_column_contract(spark):
    out = run("sql_select_star_except", spark)
    cols = set(out.columns)
    assert "props" not in cols and "value" not in cols
    assert "value_cents" in cols and "event_id" in cols
