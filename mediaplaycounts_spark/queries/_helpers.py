"""Shared helpers for graded queries: FP stabilization via cents math.

The driver hashes values after sorting columns by name, so floating-
point aggregates must be bit-identical between Spark and DuckDB
(SURVEY.md §2 FP note). Strategy: quantize to integer cents BEFORE
aggregating —

    cents(x) = CAST(round(x * 100, 0) AS BIGINT)

— then sums are exact int64 arithmetic (order-independent, partial-agg
safe), and the final double division of two exactly-represented values
is deterministic on both engines. round() on the product x*100 is
unambiguous for any real-world double (a tie would need x to be exactly
k/200 in binary — measure zero), and both engines round the identical
product double to the identical integer.

Measured on sf0.1: long-cents sums are ~3x faster than DECIMAL(18,2)
sums (0.17s vs 0.52s for the Q1-style aggregate) with the same
bit-exactness guarantee — decimals pay 128-bit arithmetic per row,
cents stay in 64-bit whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def cents(col: str | Column) -> Column:
    """Exact integer cents of a ~2-decimal double column."""
    return F.round(_c(col) * 100, 0).cast("long")


def dec(col: str | Column) -> Column:
    """DECIMAL(18,2) cast — kept for sinks/schemas that want decimals."""
    return _c(col).cast("decimal(18,2)")


def dsum(col: str | Column, alias: str) -> Column:
    """Order-independent exact sum (int64 cents), emitted as double."""
    return (F.sum(cents(col)).cast("double") / F.lit(100.0)).alias(alias)


def davg(col: str | Column, alias: str) -> Column:
    """Deterministic average: exact cents sum / exact count."""
    c = _c(col)
    return (F.sum(cents(c)).cast("double") / (F.lit(100.0) * F.count(c))).alias(alias)


def dsum_sql(col: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST(round({col} * 100, 0) AS BIGINT)) AS DOUBLE) / 100.0"
        f" AS {alias}"
    )


def davg_sql(col: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST(round({col} * 100, 0) AS BIGINT)) AS DOUBLE)"
        f" / (100.0 * COUNT({col})) AS {alias}"
    )


def revenue_e4(price: str | Column, discount: str | Column) -> Column:
    """price*(1-discount) in exact 1e-4 units: cents x (100 - pct).

    int64 per-row product (max ~1e9), summable across ~1e9 rows before
    overflow; emitted as double by /1e4.
    """
    pct = F.round(_c(discount) * 100, 0).cast("long")
    return cents(price) * (F.lit(100).cast("long") - pct)


REVENUE_E4_SQL = (
    "CAST(round({price} * 100, 0) AS BIGINT)"
    " * (100 - CAST(round({discount} * 100, 0) AS BIGINT))"
)
