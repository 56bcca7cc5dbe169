"""Ingest-path tests: the reference's parse semantics on the committed
fixtures (REF LogProcessor::parse behaviors from SURVEY.md §3.1)."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from mediaplaycounts_spark.ingest import (
    corrupt_records,
    daily_playcounts,
    parse_raw,
    read_raw,
)

FIXTURES = str(Path(__file__).resolve().parents[1] / "fixtures" / "mediacounts")
CLEAN = f"{FIXTURES}/mediacounts.2024-01-0[12].v00.tsv"
CORRUPT = f"{FIXTURES}/mediacounts.2024-01-03.v00.tsv"


def test_media_extension_whitelist(spark):
    parsed = parse_raw(read_raw(spark, CLEAN))
    files = {r["file"] for r in parsed.select("file").distinct().collect()}
    assert "Portrait.jpg" not in files
    assert "Diagram.svg" not in files
    assert "Concert.ogv" in files


def test_url_decode(spark):
    parsed = parse_raw(read_raw(spark, CLEAN))
    files = {r["file"] for r in parsed.select("file").distinct().collect()}
    assert "Accordion solo.ogg" in files  # %20 decoded
    assert not any("%20" in f for f in files)


def test_plays_formula_and_duplicate_sum(spark):
    """plays = original + transcoded audio + transcoded video, SUMMED
    over duplicate rows of the same file (day 1 has Concert.ogv twice:
    100+0+180 and 2+0+5 -> 287)."""
    pc = daily_playcounts(spark, CLEAN)
    row = pc.filter(
        (F.col("file") == "Concert.ogv") & (F.col("date") == F.lit("2024-01-01"))
    ).head()
    assert row["count"] == 287


def test_date_from_filename(spark):
    pc = daily_playcounts(spark, CLEAN)
    days = {str(r["date"]) for r in pc.select("date").distinct().collect()}
    assert days == {"2024-01-01", "2024-01-02"}


def test_corrupt_record_routing(spark):
    raw = read_raw(spark, CORRUPT)
    bad = corrupt_records(raw).collect()
    assert len(bad) == 2
    lines = {b["raw_line"] for b in bad}
    assert any("Broken.ogv" in l for l in lines)      # non-numeric count
    assert any("Truncated.webm" in l for l in lines)  # short row
    # good rows still parse on the same day
    good = parse_raw(raw)
    assert good.count() == 4


def test_idempotent_daily_overwrite(spark, tmp_path):
    """Re-running a day replaces exactly that day's partition."""
    from mediaplaycounts_spark.ingest.mediacounts import write_daily

    out = str(tmp_path / "pc")
    pc = daily_playcounts(spark, CLEAN)
    write_daily(pc, out)
    before = spark.read.parquet(out).count()
    # re-run day 1 with doubled counts: day 1 replaced, day 2 untouched
    doubled = pc.filter(F.col("date") == "2024-01-01").withColumn(
        "count", F.col("count") * 2
    )
    write_daily(doubled, out)
    after = spark.read.parquet(out)
    assert after.count() == before
    row = after.filter(
        (F.col("file") == "Concert.ogv") & (F.col("date") == F.lit("2024-01-01"))
    ).head()
    assert row["count"] == 574  # 287 * 2
