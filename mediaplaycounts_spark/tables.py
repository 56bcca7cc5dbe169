"""Table loaders for the driver-provided parquet testdata.

All graded queries load through :func:`load_table` so the two verified
gotchas are handled in exactly one place (SURVEY.md §7 watch-list):

- ``events.ts`` is parquet TIMESTAMP(NANOS): read as long nanos
  (``nanosAsLong``) and truncate to microseconds with integer division
  (``ts div 1000`` — NOT float division, whose rounding could round *up*
  near the next microsecond while DuckDB truncates), then present as
  TIMESTAMP_NTZ to match DuckDB's naive microsecond timestamps.
- Session timezone pinned UTC before any read.

At 100 TB these loaders are where partition pruning starts: the fact
tables would be date-partitioned parquet/Iceberg and these readers pass
predicates through untouched so Catalyst pushes them into the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mediaplaycounts_spark.session import configure

#: The ten driver tables (TESTDATA.md:13-15); also the DuckDB view names.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with schema normalization.

    ``events.ts`` arrives as TIMESTAMP_NTZ (microsecond, truncated from
    nanos) — bit-identical to what the DuckDB oracle sees.
    """
    configure(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz")
        )
    return df


def events_between(
    spark: SparkSession, sf_dir: str, start_day: str, end_day_exclusive: str
) -> DataFrame:
    """Events in [start_day, end_day_exclusive) with REAL scan pruning.

    A filter on the *converted* ts column wraps the parquet column in
    timestamp_micros(ts div 1000) — an expression parquet cannot prune
    row groups with. At 100 TB that is a full scan. This helper pushes
    the equivalent raw-nanosecond range predicate onto the long column
    BEFORE conversion, so it lands in PushedFilters (and, on a
    date-partitioned fact table, prunes partitions outright).
    """
    import datetime as _dt

    configure(spark)

    def _nanos(d: str) -> int:
        dt = _dt.datetime.fromisoformat(d).replace(tzinfo=_dt.timezone.utc)
        return int(dt.timestamp()) * 1_000_000_000

    raw = spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet")
    if dict(raw.dtypes).get("ts") == "bigint":
        raw = raw.filter(
            (F.col("ts") >= _nanos(start_day)) & (F.col("ts") < _nanos(end_day_exclusive))
        ).withColumn(
            "ts", F.expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz")
        )
    else:  # µs-native files (driver layout since r1 regen)
        raw = raw.filter(
            (F.col("ts") >= F.lit(start_day).cast("timestamp_ntz"))
            & (F.col("ts") < F.lit(end_day_exclusive).cast("timestamp_ntz"))
        )
    return raw


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several tables at once; defaults to all ten."""
    use = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in use}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register temp views so operators can also be phrased in Spark SQL."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
