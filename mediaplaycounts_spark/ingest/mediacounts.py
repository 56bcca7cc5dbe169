"""Mediacounts daily-dump ingest (REF LogProcessor, re-expressed Spark-first).

The reference's daily cron job (REF LogProcessor::download/parse per
SURVEY.md §3.1) downloads a bz2 TSV — one row per media asset path, 26
columns — then loops over lines in Python: split, whitelist audio/video
extensions, URL-decode the filename, compute
``plays = transfers_original + transcoded_audio + transcoded_video``
(cols 3/16/18), and inserts (file, date, count) rows into MySQL.

Here the whole job is ONE declarative plan:

- ``spark.read.csv`` with an explicit 26-column schema (Spark reads
  ``.bz2`` natively and in parallel — bz2 is block-splittable, so a
  single daily dump still fans out across executors);
- PERMISSIVE mode with ``_corrupt_record`` so malformed lines are routed
  to an error sink instead of killing the job (REF ErrorLog);
- the filter/decode/sum as Catalyst expressions (whole-stage codegen —
  no Python in the hot path);
- an explicit groupBy (file, date) SUM: the dump is *usually* one row
  per file but the pipeline must be correct under duplicates
  (SURVEY.md §3.1 stage 5);
- date derived from the dump filename (``mediacounts.YYYY-MM-DD.v00``),
  exactly as the reference names its downloads.

At 100 TB: each day is an independent partition; the only shuffle is the
(file, date) aggregation, which is map-side-combined; the output is
date-partitioned parquet so every downstream date-range query prunes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Audio/video extension whitelist (REF LogProcessor::parse ⚠ SURVEY.md
#: §1 item 2 — exact list to re-verify if the reference mount appears).
MEDIA_EXTENSIONS = ("ogg", "oga", "ogv", "webm", "wav", "flac", "mid")
MEDIA_EXTENSION_PATTERN = r"\.(" + "|".join(MEDIA_EXTENSIONS) + r")$"

#: 26-column mediacounts TSV: base path, response bytes, total
#: transfers, original transfers, 12 reserved, transcoded-audio,
#: reserved, transcoded-video, 7 reserved/referer columns.
_FIELDS: list[T.StructField] = (
    [
        T.StructField("base_path", T.StringType()),
        T.StructField("total_response_bytes", T.LongType()),
        T.StructField("total_transfers", T.LongType()),
        T.StructField("transfers_original", T.LongType()),
    ]
    + [T.StructField(f"reserved_{i}", T.StringType()) for i in range(4, 16)]
    + [
        T.StructField("transfers_transcoded_audio", T.LongType()),
        T.StructField("reserved_17", T.StringType()),
        T.StructField("transfers_transcoded_video", T.LongType()),
    ]
    + [T.StructField(f"reserved_{i}", T.StringType()) for i in range(19, 26)]
)

RAW_SCHEMA = T.StructType(_FIELDS + [T.StructField("_corrupt_record", T.StringType())])


def read_raw(spark: SparkSession, path: str) -> DataFrame:
    """Scan raw dump files (``.tsv`` or ``.tsv.bz2``; globs allowed).

    PERMISSIVE + ``_corrupt_record``: malformed lines survive the scan
    as raw text for the error sink instead of failing the day.
    """
    return (
        spark.read.option("sep", "\t")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(RAW_SCHEMA)
        .csv(path)
        .withColumn(
            "dump_date",
            F.to_date(
                F.regexp_extract(
                    F.input_file_name(), r"mediacounts\.(\d{4}-\d{2}-\d{2})", 1
                )
            ),
        )
    )


def corrupt_records(raw: DataFrame) -> DataFrame:
    """Rows rejected by the schema (REF ErrorLog): raw line + dump date.

    Spark disallows queries that reference ONLY ``_corrupt_record``
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN); the
    documented workaround is caching the parsed scan first. The error
    path is a tiny fraction of the data, and the cache is shared with
    the happy path when both run in one job.
    """
    return raw.cache().filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line"), "dump_date"
    )


def parse_raw(raw: DataFrame) -> DataFrame:
    """Media-extension whitelist + URL-decode + plays computation.

    One codegen'd select/filter — the reference's per-line Python loop
    (REF LogProcessor::parse) with zero Python in the data path.
    """
    filename = F.url_decode(F.regexp_extract(F.col("base_path"), r"([^/]+)$", 1))
    plays = (
        F.coalesce(F.col("transfers_original"), F.lit(0))
        + F.coalesce(F.col("transfers_transcoded_audio"), F.lit(0))
        + F.coalesce(F.col("transfers_transcoded_video"), F.lit(0))
    )
    return (
        raw.filter(F.col("_corrupt_record").isNull())
        .filter(F.lower(F.col("base_path")).rlike(MEDIA_EXTENSION_PATTERN))
        .select(
            filename.alias("file"),
            F.col("dump_date").alias("date"),
            plays.cast("long").alias("plays"),
        )
    )


def daily_playcounts(spark: SparkSession, path: str) -> DataFrame:
    """Full ingest plan: scan -> parse -> per-(file, date) SUM.

    Returns the playcount fact rows ``(file, date, count)`` — the
    reference's MySQL table (SURVEY.md §2.1), safe under duplicate
    input rows.
    """
    parsed = parse_raw(read_raw(spark, path))
    return parsed.groupBy("file", "date").agg(F.sum("plays").alias("count"))


def write_daily(df: DataFrame, out_dir: str) -> None:
    """Idempotent materialization: re-running a day replaces that day.

    Dynamic partition overwrite (set session-wide in session.py) is the
    Spark equivalent of the reference's per-date DELETE+INSERT.
    """
    df.write.partitionBy("date").mode("overwrite").parquet(out_dir)
