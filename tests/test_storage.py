"""Storage-layout operator tests: Morton-key algebra and the physical
plans the docstrings promise (range-partition clustering, ORC predicate
pushdown, a dynamic-pruning subquery on the partitioned scan)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.test_plans import plan_of


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as e

    return e.queries()


def test_zorder_key_is_exact_morton_interleave(spark):
    from pyspark.sql import functions as F

    from mediaplaycounts_spark.queries.storage import zorder_key

    df = spark.createDataFrame(
        [(3, 0), (0, 3), (65535, 0), (0, 65535), (65535, 65535)], "a long, b long"
    ).select(zorder_key(F.col("a"), F.col("b")).alias("z"))
    got = [r.z for r in df.collect()]
    assert got == [
        0b101,            # a occupies even bit positions
        0b1010,           # b occupies odd bit positions
        0x55555555,
        0xAAAAAAAA,
        0xFFFFFFFF,
    ]


def test_zorder_plan_range_partitions_on_key(spark, queries):
    plan = plan_of(queries["sort_zorder_cluster"](spark, SF_SMOKE))
    assert "rangepartitioning(zval" in plan
    assert "Sort" in plan


def test_orc_scan_pushes_predicate(spark, queries):
    plan = plan_of(queries["scan_orc"](spark, SF_SMOKE))
    assert "Scan orc" in plan
    assert "GreaterThanOrEqual(l_quantity" in plan


def test_dpp_scan_has_dynamic_pruning_and_prunes(spark, queries):
    df = queries["join_dpp_partition_pruned"](spark, SF_SMOKE)
    plan = plan_of(df)
    assert "dynamicpruning" in plan.lower()
    years = sorted(r.o_year for r in df.collect())
    assert years == [1995, 1996]


def test_schema_evolution_backfills_nulls(spark, queries):
    rows = {r.batch: r for r in queries["scan_schema_evolution"](spark, SF_SMOKE).collect()}
    assert set(rows) == {1, 2}
    assert rows[1].n_with_priority == 0          # column didn't exist yet
    assert rows[2].n_with_priority == rows[2].n  # fully populated
    assert rows[1].n > 0 and rows[2].n > 0


def test_compaction_reduces_file_count(spark, queries):
    import glob
    import os

    from mediaplaycounts_spark.queries.scans import SCRATCH

    before = set(glob.glob(f"{SCRATCH}/frag_orders_*"))
    queries["sink_compact_small_files"](spark, SF_SMOKE).collect()
    frag = (set(glob.glob(f"{SCRATCH}/frag_orders_*")) - before).pop()
    compact = max(
        glob.glob(f"{SCRATCH}/compact_orders_*"), key=os.path.getmtime
    )
    assert len(glob.glob(f"{frag}/part-*.parquet")) == 64
    assert len(glob.glob(f"{compact}/part-*.parquet")) == 4


def test_jdbc_scan_pushdown_and_stripes(spark, queries):
    df = queries["scan_jdbc"](spark, SF_SMOKE)
    plan = plan_of(df)
    # Predicate reaches the JDBC source (database-side filtering).
    assert "PushedFilters" in plan and "o_totalprice" in plan
    rows = {r.o_orderstatus: r.n for r in df.collect()}
    assert sum(rows.values()) > 0


def test_python_datasource_partitions(spark, queries):
    import datetime as dt

    df = queries["scan_python_datasource"](spark, SF_SMOKE)
    rows = {r.month: r for r in df.collect()}
    assert len(rows) == 12
    assert sum(r.n_days for r in rows.values()) == 365
    assert rows[dt.date(2024, 2, 1)].n_days == 29  # leap year
    # The generator itself must parallelize: 4 input partitions.
    from pyspark.sql import functions as F  # noqa: F401

    cal = (
        spark.read.format("pycalendar")
        .option("start", "2024-01-01")
        .option("days", "365")
        .load()
    )
    assert cal.rdd.getNumPartitions() == 4
