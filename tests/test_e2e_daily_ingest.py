"""pipeline_e2e_daily_ingest: the reference's full product loop (dump ->
parse -> idempotent store -> serving read -> zero-filled API series) as
one graded lineage. The exact value oracle runs via
tools/check_correctness.py; these tests pin the invariants the value
hash can't articulate: corrupt routing reached the error sink, the
double write was idempotent (not doubled), and the serving read is the
pruned day-partitioned layout.
"""

from __future__ import annotations

import glob
import json
import re

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from mediaplaycounts_spark.queries.scans import SCRATCH, _E2E_PROBES
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def series(spark):
    # Snapshot scratch dirs before/after so the error-sink assertion
    # below reads THIS run's sink, not a stale one.
    before = set(glob.glob(str(SCRATCH / "e2e_errlog_*")))
    df = entrymod.queries()["pipeline_e2e_daily_ingest"](spark, SF_SMOKE)
    rows = df.collect()
    new_sinks = set(glob.glob(str(SCRATCH / "e2e_errlog_*"))) - before
    return rows, new_sinks


def test_series_shape_and_zero_fill(series):
    """3 probes x 4 spine days; the no-data day (2024-01-04) is
    zero-filled for every probe at the API boundary."""
    rows, _ = series
    assert len(rows) == 12
    by_file: dict[str, dict[str, int]] = {}
    for r in rows:
        by_file.setdefault(r.file, {})[str(r.date.date())] = r["count"]
    assert set(by_file) == set(_E2E_PROBES)
    for f in _E2E_PROBES:
        assert by_file[f]["2024-01-04"] == 0


def test_corrupt_rows_never_reach_the_store(series):
    """'Truncated.webm' exists ONLY as day 3's truncated line; its whole
    series must be zero — the end-to-end proof that PERMISSIVE corrupt
    routing kept malformed lines out of the serving table."""
    rows, _ = series
    assert all(r["count"] == 0 for r in rows if r.file == "Truncated.webm")
    # ...while a clean file the corrupt day also contains DID land
    acc = {str(r.date.date()): r["count"] for r in rows if r.file == "Accordion solo.ogg"}
    assert acc["2024-01-03"] > 0


def test_error_sink_captured_both_malformed_lines(series):
    """The side sink holds exactly day 3's two malformed lines ('oops'
    total_transfers + the truncated row), verbatim."""
    _, new_sinks = series
    assert len(new_sinks) == 1, f"expected one fresh error sink, got {new_sinks}"
    lines = []
    for part in glob.glob(next(iter(new_sinks)) + "/part-*"):
        with open(part) as fh:
            lines += [json.loads(ln) for ln in fh if ln.strip()]
    assert len(lines) == 2
    raws = sorted(ln["raw_line"] for ln in lines)
    assert any("oops" in r for r in raws)
    assert any("Truncated.webm" in r for r in raws)
    assert all(ln["dump_date"] == "2024-01-03" for ln in lines)


def test_double_write_was_idempotent_not_doubled(spark, series):
    """Day 1 is written twice (initial load + full re-run). Dynamic
    partition overwrite must leave exactly ONE copy: Accordion day-1
    count equals the single-file parse sum (10+25+0=35), not 70."""
    rows, _ = series
    acc = {str(r.date.date()): r["count"] for r in rows if r.file == "Accordion solo.ogg"}
    assert acc["2024-01-01"] == 35


def test_serving_scan_prunes_to_queried_days(spark):
    """The API read over the day-partitioned store must push its date
    predicates into PartitionFilters — an API hit reads days, not
    history."""
    from mediaplaycounts_spark.api.playcounts import date_range
    from mediaplaycounts_spark.api.serving import read_serving_parquet

    stores = sorted(glob.glob(str(SCRATCH / "e2e_daily_*")))
    assert stores, "e2e store missing (fixture ran first)"
    serving = read_serving_parquet(spark, stores[-1])
    q = date_range(serving, "Accordion solo.ogg", "2024-01-02", "2024-01-02")
    plan = q._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "date" in m.group(1), plan
