"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over :mod:`mediaplaycounts_spark.registry`: every operator
from SURVEY.md §2 registers a ``(spark, sf_dir) -> DataFrame`` callable
and (when SQL-expressible) a DuckDB oracle; this module just exposes the
registry to the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mediaplaycounts_spark import registry
from mediaplaycounts_spark.queries.aggregates import agg_daily_playcount

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's core capability: the daily playcount rollup
    (REF LogProcessor::parse -> per-(file,day) counts), run on the
    events play-log analog.
    """
    return agg_daily_playcount(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key (omitted => rows-only check)."""
    return registry.all_oracles()
