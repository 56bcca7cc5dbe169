"""Playcount query API (REF GetData::date_range/last_30/last_90 +
category_* — SURVEY.md §3.2/§3.3), Spark-first.

Inputs are the playcount fact table ``(file string, date date/timestamp,
count bigint)`` produced by the ingest path, and (for category queries)
a membership table ``(category string, file string)``. The reference
resolved categories via live Commons API calls and looped one SQL query
per member file (N+1); here membership is a snapshot table and every
query is ONE Spark plan.

Underscores/spaces: the reference normalized page titles by swapping
underscores for spaces (⚠ SURVEY.md §3.2); :func:`normalize_title`
applies the same rule.

Every function returns a DataFrame with the zero-filled per-day series
(calendar spine join) — the reference API emitted every day in range
with count 0 for missing days (⚠ re-verify against real reference).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_title(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.replace(c, F.lit("_"), F.lit(" "))


def date_range(playcounts: DataFrame, file: str, start: str, end: str) -> DataFrame:
    """Per-day counts for one file over [start, end], zero-filled.

    REF GetData::date_range: SELECT date,count WHERE file=? AND date
    BETWEEN ? AND ? plus Python zero-fill. Here: partition/rowgroup-
    pruned scan + broadcast spine left join, one plan.
    """
    f = normalize_title(F.lit(file))
    counts = (
        playcounts.filter(
            (F.col("file") == f)
            & (F.col("date") >= F.lit(start).cast("date"))
            & (F.col("date") <= F.lit(end).cast("date"))
        )
        .groupBy(F.col("date").cast("date").alias("date"))
        .agg(F.sum("count").alias("count"))
    )
    spine = playcounts.sparkSession.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"),
                F.lit(end).cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("date")
    )
    return (
        F.broadcast(spine)
        .join(counts, "date", "left")
        .select("date", F.coalesce("count", F.lit(0)).alias("count"))
        .orderBy("date")
    )


def last_n(playcounts: DataFrame, file: str, n: int, today: str) -> DataFrame:
    """Last-N-days series ending the day before ``today``
    (REF GetData::last_30/last_90 with n=30/90)."""
    end = F.date_sub(F.lit(today).cast("date"), 1)
    start = F.date_sub(F.lit(today).cast("date"), n)
    # Resolve the two bounds driver-side is unnecessary: express via SQL dates
    spine = playcounts.sparkSession.range(1).select(
        F.explode(F.sequence(start, end, F.expr("INTERVAL 1 DAY"))).alias("date")
    )
    f = normalize_title(F.lit(file))
    counts = (
        playcounts.filter(
            (F.col("file") == f)
            & (F.col("date").cast("date") >= start)
            & (F.col("date").cast("date") <= end)
        )
        .groupBy(F.col("date").cast("date").alias("date"))
        .agg(F.sum("count").alias("count"))
    )
    return (
        F.broadcast(spine)
        .join(counts, "date", "left")
        .select("date", F.coalesce("count", F.lit(0)).alias("count"))
        .orderBy("date")
    )


def _category_counts(
    playcounts: DataFrame, members: DataFrame, category: str
) -> DataFrame:
    """Facts restricted to a category's member files: ONE semi-join plan
    (replaces the reference's per-member N+1 SQL loop, SURVEY.md §3.3)."""
    m = members.filter(F.col("category") == normalize_title(F.lit(category))).select(
        normalize_title("file").alias("file")
    )
    return playcounts.join(F.broadcast(m), "file", "leftsemi")


def category_date_range(
    playcounts: DataFrame, members: DataFrame, category: str, start: str, end: str
) -> DataFrame:
    """Per-day totals summed across a category's member files."""
    facts = _category_counts(playcounts, members, category)
    daily = (
        facts.filter(
            (F.col("date") >= F.lit(start).cast("date"))
            & (F.col("date") <= F.lit(end).cast("date"))
        )
        .groupBy(F.col("date").cast("date").alias("date"))
        .agg(F.sum("count").alias("count"))
    )
    spine = playcounts.sparkSession.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"), F.lit(end).cast("date"), F.expr("INTERVAL 1 DAY")
            )
        ).alias("date")
    )
    return (
        F.broadcast(spine)
        .join(daily, "date", "left")
        .select("date", F.coalesce("count", F.lit(0)).alias("count"))
        .orderBy("date")
    )


def category_last_n(
    playcounts: DataFrame, members: DataFrame, category: str, n: int, today: str
) -> DataFrame:
    """Category rolling window (REF GetData::category_last_30/90)."""
    import datetime as _dt

    t = _dt.date.fromisoformat(today)
    start = (t - _dt.timedelta(days=n)).isoformat()
    end = (t - _dt.timedelta(days=1)).isoformat()
    return category_date_range(playcounts, members, category, start, end)


def to_api_payload(series: DataFrame) -> dict:
    """JSON shape of the reference API: {total, counts: [[date, n]...]}
    (⚠ exact reference shape to re-verify; SURVEY.md §2.1). The ONLY
    collect in the engine — the serving result is a tiny per-day list.
    """
    rows = series.orderBy("date").collect()
    return {
        "total": int(sum(r["count"] for r in rows)),
        "counts": [[r["date"].isoformat(), int(r["count"])] for r in rows],
    }
