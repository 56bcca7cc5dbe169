"""Golden plan-shape regression guard for the headline bench set.

VERDICT r2 #3: the bench wall-time gate only catches >2x blowups — a
config or Spark-version change that silently flips a broadcast join to
a sort-merge join, drops a parquet pushdown, or adds an Exchange can
hide inside the noise band at sf0.1 yet cost hours at 100 TB. This test
pins the scale-relevant features of each headline plan (shuffle count,
join strategies, pushdown, Python nodes) to tests/golden_plans.json.

On intentional plan changes, regenerate with
``python tools/plan_golden.py --regen`` and justify the diff in the
commit message.
"""

from __future__ import annotations

import json

import pytest

from tools.plan_golden import GOLDEN_PATH, KEYS, extract_features

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def golden():
    return json.loads(GOLDEN_PATH.read_text())


def test_golden_covers_headline():
    """The golden key list tracks bench.py's HEADLINE composition."""
    import bench

    assert KEYS == bench.HEADLINE


@pytest.mark.parametrize("key", KEYS)
def test_headline_plan_shape_matches_golden(spark, golden, key):
    got = extract_features(entrymod.queries()[key](spark, SF))
    assert key in golden, f"{key} missing from golden — regen tools/plan_golden.py"
    assert got == golden[key], (
        f"{key} plan shape drifted from golden.\n"
        f"  golden: {golden[key]}\n  actual: {got}\n"
        "If intentional: python tools/plan_golden.py --regen and justify."
    )
