"""Semantics tests for the statistical-surface operators: independent
brute-force (pandas/numpy) implementations on sf0.001 cross-check each
query, so an error shared by the Spark and DuckDB SQL formulations
would still be caught."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from mediaplaycounts_spark.registry import all_queries
from tests.conftest import SF_SMOKE


def _round_half_away(a: np.ndarray) -> np.ndarray:
    # Spark/DuckDB round() is half-away-from-zero; numpy rounds half-even
    return np.sign(a) * np.floor(np.abs(a) + 0.5)


@pytest.fixture(scope="module")
def events_pd():
    df = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    if pd.api.types.is_integer_dtype(df["ts"]):
        df["ts"] = pd.to_datetime(df["ts"] // 1000, unit="us")
    else:
        df["ts"] = df["ts"].dt.floor("us")
    df["day"] = df["ts"].dt.normalize()
    df["cents"] = _round_half_away(df["value"].to_numpy() * 100).astype("int64")
    return df


def _run(spark, key):
    return all_queries()[key](spark, SF_SMOKE).toPandas()


def test_multi_distinct_bruteforce(spark, events_pd):
    out = _run(spark, "agg_multi_distinct").set_index("day")
    for d, grp in events_pd.groupby("day"):
        row = out.loc[d.date()]
        assert row["n_events"] == len(grp)
        assert row["n_users"] == grp["user_id"].nunique()
        assert row["n_types"] == grp["event_type"].nunique()
        assert (
            row["n_purchasers"]
            == grp[grp["event_type"] == "purchase"]["user_id"].nunique()
        )


def test_kurtosis_bruteforce(spark, events_pd):
    out = _run(spark, "agg_kurtosis_exact").set_index("event_type")
    for etype, grp in events_pd.groupby("event_type"):
        v = _round_half_away(grp["value"].to_numpy(dtype="float64"))
        m2 = (v**2).mean() - v.mean() ** 2
        m4 = (
            (v**4).mean()
            - 4 * v.mean() * (v**3).mean()
            + 6 * v.mean() ** 2 * (v**2).mean()
            - 3 * v.mean() ** 4
        )
        expect = m4 / m2**2 - 3
        assert abs(out.loc[etype, "kurtosis"] - expect) < 1e-4


def test_entropy_bruteforce(spark, events_pd):
    out = _run(spark, "agg_entropy_shannon").set_index("day")
    for d, grp in events_pd.groupby("day"):
        p = grp["event_type"].value_counts(normalize=True).to_numpy()
        expect = float(-(p * np.log(p)).sum())
        assert abs(out.loc[d.date(), "entropy_nats"] - expect) < 1e-5
        assert out.loc[d.date(), "n_events"] == len(grp)


def test_rolling_median_bruteforce(spark, events_pd):
    out = _run(spark, "win_rolling_median")
    daily = (
        events_pd.groupby(["event_type", "day"])["cents"].sum().reset_index()
    )
    for etype, grp in daily.groupby("event_type"):
        tots = grp.sort_values("day")["cents"].tolist()
        days = grp.sort_values("day")["day"].tolist()
        sub = out[out["event_type"] == etype].set_index("day")
        for i in (0, 3, len(tots) - 1):
            frame = sorted(tots[max(0, i - 6) : i + 1])
            m = len(frame)
            med2 = (
                2 * frame[(m - 1) // 2]
                if m % 2 == 1
                else frame[m // 2 - 1] + frame[m // 2]
            )
            assert sub.loc[days[i].date(), "med2_cents"] == med2


def test_range_value_frame_bruteforce(spark):
    out = _run(spark, "win_range_value_frame")
    orders = pd.read_parquet(
        f"{SF_SMOKE}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )
    orders["cents"] = _round_half_away(
        orders["o_totalprice"].to_numpy() * 100
    ).astype("int64")
    sample = out.sample(20, random_state=7)
    by_prio = dict(tuple(orders.groupby("o_orderpriority")))
    for _, row in sample.iterrows():
        peers = by_prio[row["o_orderpriority"]]
        band = peers[
            (peers["cents"] >= row["price_cents"] - 1_000_000)
            & (peers["cents"] <= row["price_cents"] + 1_000_000)
        ]
        assert row["band_n"] == len(band)
        assert row["band_sum_cents"] == band["cents"].sum()


def test_resample_weekly_bruteforce(spark, events_pd):
    out = _run(spark, "ts_resample_weekly")
    ev = events_pd.assign(
        week=events_pd["ts"].dt.to_period("W-SUN").dt.start_time
    )
    wk = ev.groupby(["event_type", "week"])["cents"].sum().reset_index()
    for etype, grp in wk.groupby("event_type"):
        grp = grp.sort_values("week").reset_index(drop=True)
        sub = out[out["event_type"] == etype].sort_values("week").reset_index(
            drop=True
        )
        assert list(sub["wk_cents"]) == list(grp["cents"])
        assert sub.loc[0, "delta_cents"] == 0
        if len(grp) > 1:
            assert (
                sub.loc[1, "delta_cents"]
                == grp.loc[1, "cents"] - grp.loc[0, "cents"]
            )


def test_zipf_slope_bruteforce(spark):
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet", columns=["lang", "text"])
    out = _run(spark, "text_zipf_exponent").set_index("lang")
    for lang, grp in docs.groupby("lang"):
        counts: dict[str, int] = {}
        for t in grp["text"]:
            for w in t.split(" "):
                counts[w] = counts.get(w, 0) + 1
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
        x = np.log(np.arange(1, len(top) + 1, dtype="float64"))
        y = np.log(np.array([f for _, f in top], dtype="float64"))
        n = len(top)
        slope = (n * (x * y).sum() - x.sum() * y.sum()) / (
            n * (x * x).sum() - x.sum() ** 2
        )
        assert out.loc[lang, "n_terms"] == n
        assert abs(out.loc[lang, "zipf_slope"] - slope) < 1e-3
        assert -3 < out.loc[lang, "zipf_slope"] < 0
