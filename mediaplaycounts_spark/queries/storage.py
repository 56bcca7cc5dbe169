"""Storage-layout operators: the 100 TB data-placement toolkit.

The reference stored everything in one MySQL table behind a (file, date)
B-tree (SURVEY.md §2.1); at 100 TB, layout IS the index. Three
operators cover the placement levers a Spark lakehouse actually uses:

- `sort_zorder_cluster` — Z-order (Morton) clustering: interleave the
  bits of two filter dimensions into one sort key so range-partitioned
  files are simultaneously clustered on BOTH dimensions, and min/max
  row-group stats prune scans on either predicate. The bit-spread is
  pure int64 shift/mask arithmetic — exact on both engines.
- `scan_orc` — the second columnar format: parquet -> ORC round-trip,
  then an aggregate over the ORC scan with predicate pushdown (Spark
  ships the ORC reader in-box; same `spark.read` surface as parquet).
- `join_dpp_partition_pruned` — dynamic partition pruning: a
  date-partitioned fact joined to a filtered tiny dim on the partition
  column scans ONLY the partitions the dim selects, the lakehouse
  equivalent of the reference's B-tree date-range scan
  (REF GetData::date_range -> WHERE date BETWEEN, SURVEY.md §3.2).

100 TB posture: Z-order turns the "query by file AND by date" dual
access pattern into one layout instead of two copies; DPP turns
dim-driven date filters into partition skips (no fact-scan before the
filter); ORC/parquet symmetry keeps ingest format-agnostic.
"""

from __future__ import annotations

import pathlib
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mediaplaycounts_spark.registry import register
from mediaplaycounts_spark.tables import load_table

SCRATCH = pathlib.Path(__file__).resolve().parents[2] / ".scratch"

# ------------------------------------------------------------- Z-order

#: (shift, mask) rounds spreading a 16-bit int to even bit positions of
#: a 32-bit lane (classic Morton-code bit twiddling; masks are the
#: standard 0x00FF00FF / 0x0F0F0F0F / 0x33333333 / 0x55555555 series).
_SPREAD_ROUNDS = ((8, 16711935), (4, 252645135), (2, 858993459), (1, 1431655765))


def _spread_col(x: Column) -> Column:
    e = x.cast("long").bitwiseAND(F.lit(65535))
    for sh, m in _SPREAD_ROUNDS:
        e = e.bitwiseOR(F.shiftleft(e, sh)).bitwiseAND(F.lit(m))
    return e


def _spread_sql(x: str) -> str:
    e = f"(CAST({x} AS BIGINT) & 65535)"
    for sh, m in _SPREAD_ROUNDS:
        e = f"(({e} | ({e} << {sh})) & {m})"
    return e


def zorder_key(a: Column, b: Column) -> Column:
    """64-bit Morton interleave of two 16-bit-quantized dimensions."""
    return _spread_col(a).bitwiseOR(F.shiftleft(_spread_col(b), 1)).cast("long")


@register(
    "sort_zorder_cluster",
    oracle=f"""
        SELECT o_orderkey,
               CAST({_spread_sql('o_custkey % 65536')} |
                    ({_spread_sql(
                        "date_diff('day', DATE '1970-01-01',"
                        " CAST(o_orderdate AS DATE)) % 65536")} << 1)
                    AS BIGINT) AS zval
        FROM orders
    """,
)
def sort_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering key over (customer, order day): Morton-
    interleaved 16-bit quantizations, then range-repartition + local
    sort on the key — the write-side layout step that makes BOTH
    `o_custkey` point lookups and `o_orderdate` ranges prune row
    groups. All bit math is int64 shifts/masks inside whole-stage
    codegen; the only shuffle is the intentional range partitioning."""
    o = load_table(spark, sf_dir, "orders")
    day = F.datediff(
        F.col("o_orderdate").cast("date"), F.to_date(F.lit("1970-01-01"))
    )
    z = zorder_key(F.col("o_custkey") % 65536, day % 65536)
    return (
        o.select("o_orderkey", z.alias("zval"))
        .repartitionByRange(8, "zval")
        .sortWithinPartitions("zval")
    )


# ----------------------------------------------------------------- ORC


@register(
    "scan_orc",
    oracle="""
        SELECT l_returnflag, COUNT(*) AS n,
               CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS sum_price_cents
        FROM lineitem
        WHERE l_quantity >= 25.0
        GROUP BY l_returnflag
    """,
)
def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second columnar format: lineitem round-tripped through ORC, then
    aggregated off the ORC scan (predicate pushes into the ORC reader
    the same way it does for parquet — one `spark.read` surface per
    format, no operator changes downstream)."""
    out = str(SCRATCH / f"orc_lineitem_{uuid.uuid4().hex[:12]}")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    li.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return (
        back.filter(F.col("l_quantity") >= 25.0)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias(
                "sum_price_cents"
            ),
        )
    )


# ------------------------------------------------- dynamic partition pruning


@register(
    "join_dpp_partition_pruned",
    oracle="""
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS sum_price_cents
        FROM orders
        WHERE year(o_orderdate) IN (1995, 1996)
        GROUP BY o_year
    """,
)
def join_dpp_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: orders materialized partitioned by
    year, joined to a 2-row filtered year dim — Spark plants the dim's
    values as a runtime IN-subquery filter on the partition column, so
    the fact scan reads 2 of 7 partitions (explain shows
    `dynamicpruning` on the scan). This is the reference's indexed
    date-range lookup (REF GetData::date_range) reborn as layout: at
    100 TB the fact is date-partitioned and a calendar/dim filter skips
    whole partitions before any IO."""
    out = str(SCRATCH / f"dpp_orders_{uuid.uuid4().hex[:12]}")
    o = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    o.write.mode("overwrite").partitionBy("o_year").parquet(out)
    # Partition discovery types o_year as INT; keep the join/groupBy on
    # the native partition column (a cast would block the pruning
    # subquery) and widen to BIGINT only in the output projection.
    fact = spark.read.parquet(out)
    # The dim needs a real Filter node (not a pre-trimmed literal
    # relation) — DPP's planner only plants the runtime subquery when
    # the build side has a selective predicate.
    dim = spark.createDataFrame(
        [(y,) for y in range(1992, 1999)], "o_year int"
    ).filter(F.col("o_year").isin(1995, 1996))
    return (
        fact.join(dim, "o_year")
        .groupBy("o_year")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "sum_price_cents"
            ),
        )
        .select(
            F.col("o_year").cast("long").alias("o_year"),
            "n_orders",
            "sum_price_cents",
        )
    )


# ------------------------------------------------------ schema evolution


@register(
    "scan_schema_evolution",
    oracle="""
        WITH v1 AS (SELECT o_orderkey, o_totalprice,
                           CAST(NULL AS VARCHAR) AS o_orderpriority,
                           1 AS batch
                    FROM orders WHERE o_orderkey % 2 = 0),
        v2 AS (SELECT o_orderkey, o_totalprice, o_orderpriority, 2 AS batch
               FROM orders WHERE o_orderkey % 2 = 1),
        m AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
        SELECT batch,
               COUNT(*) AS n,
               CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS sum_price_cents,
               COUNT(o_orderpriority) AS n_with_priority
        FROM m GROUP BY batch
    """,
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: batch 1 written BEFORE a column existed,
    batch 2 written after — `mergeSchema=true` unions the file schemas
    and back-fills the missing column with NULLs, exactly the
    append-only lakehouse upgrade path (the reference's fixed MySQL DDL
    had no answer to this, SURVEY.md §2.1).

    At 100 TB: schema merge is a FOOTER-only operation (no data read)
    but still O(files) on the driver — production tables should pin the
    canonical schema in a catalog and use mergeSchema only for
    discovery/backfill audits like this one."""
    out = str(SCRATCH / f"evo_orders_{uuid.uuid4().hex[:12]}")
    o = load_table(spark, sf_dir, "orders")
    o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    ).write.parquet(f"{out}/batch=1")
    o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    ).write.parquet(f"{out}/batch=2")
    merged = spark.read.option("mergeSchema", "true").parquet(out)
    return merged.groupBy("batch").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "sum_price_cents"
        ),
        F.count("o_orderpriority").alias("n_with_priority"),
    )
