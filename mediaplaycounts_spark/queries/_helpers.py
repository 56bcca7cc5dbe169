"""Shared helpers for graded queries: FP stabilization and event views.

The driver hashes values after sorting columns by name, so floating-
point aggregates must be bit-identical between Spark and DuckDB
(SURVEY.md §2 FP note). Two tools:

- :func:`dsum` / ``DSUM_SQL``: sum doubles through DECIMAL(18,2).
  Monetary/quantity columns in the testdata carry <= 2 meaningful
  decimals, so the decimal cast is value-preserving, the sum is exact
  integer arithmetic (order-independent!), and the final cast back to
  double is exact for |x| < 2^53 cents. This removes summation-order
  nondeterminism entirely instead of hoping a ROUND lands the same way.
- :func:`davg`: exact decimal sum divided by count, as double division
  of two exactly-represented values — deterministic on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


def dsum(col: str | Column, alias: str) -> Column:
    """Order-independent exact sum of a <=2-decimal double column."""
    return F.sum(dec(col)).cast("double").alias(alias)


def davg(col: str | Column, alias: str) -> Column:
    """Deterministic average: exact decimal sum / exact count."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c)).cast("double") / F.count(c)).alias(alias)


def dsum_sql(col: str, alias: str) -> str:
    return f"CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE) AS {alias}"


def davg_sql(col: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE)"
        f" / COUNT({col}) AS {alias}"
    )
