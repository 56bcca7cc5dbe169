"""Semantics tests for the time-series repair operators.

Value parity vs DuckDB runs via tools/check_correctness.py; these pin
the closed-form behaviors the oracle can't express — exact interpolated
values on a hand-built gap, dense-grid structure, and the 3-sigma
algebra flagging exactly the planted spike.
"""

from __future__ import annotations

import datetime as dt

import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as e

    return e.queries()


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_gapfill_interpolates_exactly(spark, tmp_path, queries):
    # Days 1,2,4,5 observed; day 3 missing. Daily totals (cents):
    # 100, 200, GAP, 1000, 500 -> day-3 lerp = (200+1000) div 2 = 600.
    t0 = dt.datetime(2024, 3, 1)
    rows = [
        (1, t0, 1, "view", 1.00),
        (2, t0 + dt.timedelta(days=1), 1, "view", 2.00),
        (3, t0 + dt.timedelta(days=3), 1, "view", 10.00),
        (4, t0 + dt.timedelta(days=4), 1, "view", 5.00),
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = {
        r.d.date(): r
        for r in queries["ts_gapfill_interpolate"](spark, sf).collect()
    }
    assert len(out) == 5  # dense: every day min..max present
    gap_day = dt.date(2024, 3, 3)
    assert out[gap_day].was_gap == 1
    assert out[gap_day].filled_value == 6.00
    assert out[dt.date(2024, 3, 1)].filled_value == 1.00
    assert sum(r.was_gap for r in out.values()) == 1


def test_gapfill_grid_is_dense_per_type(spark, queries):
    rows = queries["ts_gapfill_interpolate"](spark, SF_SMOKE).collect()
    days = {r.d for r in rows}
    types = {r.event_type for r in rows}
    assert len(rows) == len(days) * len(types)
    assert all(r.filled_value is not None for r in rows)


def test_anomaly_flags_exactly_the_spike(spark, tmp_path, queries):
    # 11 constant days + 1 spike: spike z = sqrt(11) > 3 -> flagged;
    # constant days z = sqrt(11)/11 < 1 -> not flagged.
    t0 = dt.datetime(2024, 3, 1)
    rows = [
        (i, t0 + dt.timedelta(days=i), 1, "view", 1.00) for i in range(11)
    ]
    rows.append((99, t0 + dt.timedelta(days=11), 1, "view", 100.00))
    sf = _write_events(spark, tmp_path, rows)
    out = queries["agg_anomaly_flag"](spark, sf).collect()
    flagged = {r.d.date() for r in out if r.is_anomaly == 1}
    assert flagged == {dt.date(2024, 3, 12)}
    assert len(out) == 12


def test_trend_slope_closed_form(spark, tmp_path, queries):
    # Perfect line: value = 1.00 * (day+1) -> slope 1.00/day exactly.
    t0 = dt.datetime(2024, 6, 1)
    rows = [
        (i, t0 + dt.timedelta(days=i), 1, "view", float(i + 1))
        for i in range(10)
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = queries["agg_trend_slope"](spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n == 10
    assert r.slope_per_day == 1.0
