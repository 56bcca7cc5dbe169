"""§2.B Projection / filter / scalar expression operators.

The reference's only expressions live in its parse loop and date math
(REF LogProcessor::parse — extension whitelist, URL-decode;
REF GetData::date_range/last_30 — date arithmetic). Here each family is
a Catalyst expression inside whole-stage codegen; nothing in this module
leaves the JVM.

The two path-string operators (`filter_media_extension`,
`string_extract`) run the REAL ingest parser over the committed
mediacounts TSV fixtures (fixtures/mediacounts/, format per
FIXTURES.md §B); their oracles read the same files with DuckDB
``read_csv``. Escapes in the fixtures are limited to ``%20`` because
DuckDB 1.0 has no url_decode.
"""

from __future__ import annotations

import pathlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mediaplaycounts_spark.ingest.mediacounts import read_raw
from mediaplaycounts_spark.queries._helpers import revenue_e4
from mediaplaycounts_spark.registry import register
from mediaplaycounts_spark.tables import load_table

FIXTURE_DIR = str(pathlib.Path(__file__).resolve().parents[2] / "fixtures" / "mediacounts")
CLEAN_GLOB = f"{FIXTURE_DIR}/mediacounts.2024-01-0[12].v00.tsv"

# DuckDB scan of the same TSVs, all-varchar (casts happen per-oracle).
_DUCK_COLS = ", ".join(f"'c{i}': 'VARCHAR'" for i in range(26))
DUCK_RAW = (
    f"read_csv('{CLEAN_GLOB}', delim='\t', header=false, "
    f"columns={{{_DUCK_COLS}}}, filename=true)"
)


@register(
    "project_rename",
    oracle="""
        SELECT l_orderkey AS okey, l_linenumber AS line_no,
               l_extendedprice AS price, l_returnflag AS flag
        FROM lineitem
    """,
)
def project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column pruning + rename: the scan should read only 4 columns."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").cast("long").alias("line_no"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_returnflag").alias("flag"),
    )


@register(
    "filter_predicate",
    oracle="""
        SELECT l_orderkey, l_linenumber AS line_no, l_quantity
        FROM lineitem
        WHERE l_quantity > 30 AND l_returnflag IN ('A', 'R')
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    """,
)
def filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicates, all pushed to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 30)
        & F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
    ).select(
        "l_orderkey", F.col("l_linenumber").cast("long").alias("line_no"), "l_quantity"
    )


@register(
    "filter_media_extension",
    oracle=f"""
        SELECT c0 AS base_path, CAST(c2 AS BIGINT) AS total_transfers
        FROM {DUCK_RAW}
        WHERE regexp_matches(lower(c0), '\\.(ogg|oga|ogv|webm|wav|flac|mid)$')
    """,
)
def filter_media_extension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's extension whitelist (REF LogProcessor::parse).

    Runs the real ingest scanner over the committed fixture dumps; the
    .jpg/.svg/.pdf rows must be filtered out.
    """
    raw = read_raw(spark, CLEAN_GLOB)
    return raw.filter(
        F.lower(F.col("base_path")).rlike(r"\.(ogg|oga|ogv|webm|wav|flac|mid)$")
    ).select("base_path", "total_transfers")


@register(
    "string_extract",
    oracle=f"""
        SELECT c0 AS base_path,
               replace(regexp_extract(c0, '([^/]+)$', 1), '%20', ' ') AS file
        FROM {DUCK_RAW}
    """,
)
def string_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filename-from-path + URL-decode (REF LogProcessor::parse).

    Spark side uses the real ``F.url_decode``; the oracle emulates with
    replace('%20') — fixtures only use %20 by construction.
    """
    raw = read_raw(spark, CLEAN_GLOB)
    return raw.select(
        "base_path",
        F.url_decode(F.regexp_extract(F.col("base_path"), r"([^/]+)$", 1)).alias("file"),
    )


@register(
    "string_funcs",
    oracle="""
        SELECT c_custkey,
               lower(c_name) AS name_lower,
               upper(c_mktsegment) AS seg_upper,
               concat_ws('|', c_name, c_mktsegment) AS joined,
               substring(c_name, 1, 8) AS name_prefix,
               replace(c_name, 'Customer#', 'C') AS name_short,
               length(trim(c_name)) AS name_len
        FROM customer
        WHERE c_name LIKE '%1%'
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lower/upper/trim/concat/substring/replace/like in one projection."""
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_name").like("%1%")).select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.concat_ws("|", "c_name", "c_mktsegment").alias("joined"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.regexp_replace("c_name", "Customer#", "C").alias("name_short"),
        F.length(F.trim(F.col("c_name"))).cast("long").alias("name_len"),
    )


@register(
    "date_funcs",
    oracle="""
        SELECT o_orderkey,
               CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
               CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mth,
               CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS dom,
               date_trunc('month', o_orderdate) AS month_start,
               date_trunc('day', o_orderdate) + INTERVAL 30 DAY AS due_date,
               date_diff('day', date_trunc('day', o_orderdate),
                         TIMESTAMP '1998-01-01 00:00:00') AS days_to_98
        FROM orders
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_date / trunc / arithmetic / extraction (REF GetData date math)."""
    o = load_table(spark, sf_dir, "orders")
    d = F.date_trunc("DAY", "o_orderdate")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mth"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.date_trunc("MONTH", "o_orderdate").alias("month_start"),
        (d + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        F.datediff(F.lit("1998-01-01").cast("date"), d.cast("date"))
        .cast("long")
        .alias("days_to_98"),
    )


@register(
    "math_funcs",
    oracle="""
        SELECT l_orderkey, l_linenumber AS line_no,
               CAST(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))
                    AS DOUBLE) / 10000.0 AS revenue,
               abs(l_quantity - 25.0) AS qty_dev,
               CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
               CAST(ceil(l_quantity / 10) AS BIGINT) AS qty_bucket
        FROM lineitem
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic / round / abs / floor / ceil.

    revenue = cents x (100 - pct) / 1e4: exact int64 per-row math, so
    both engines emit the identical double (raw double rounding can
    disagree near ties; integer quantization cannot).
    """
    li = load_table(spark, sf_dir, "lineitem")
    revenue = revenue_e4("l_extendedprice", "l_discount").cast("double") / 10000.0
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("line_no"),
        revenue.alias("revenue"),
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
        F.floor(F.col("l_extendedprice") / 1000).cast("long").alias("price_k_floor"),
        F.ceil(F.col("l_quantity") / 10).cast("long").alias("qty_bucket"),
    )


@register(
    "conditional_expr",
    oracle="""
        SELECT o_orderkey,
               CASE o_orderstatus WHEN 'F' THEN 'finished'
                                  WHEN 'O' THEN 'open'
                                  ELSE 'pending' END AS status_label,
               CASE WHEN o_totalprice > 200000 THEN 'big'
                    WHEN o_totalprice > 50000 THEN 'mid'
                    ELSE 'small' END AS size_band,
               COALESCE(NULLIF(o_orderpriority, '4-NOT SPECIFIED'), 'none')
                 AS priority_clean
        FROM orders
    """,
)
def conditional_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN chains + NULL handling (zero-fill convention §2.B)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("pending")
        .alias("status_label"),
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
        .alias("size_band"),
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")), F.lit("none")
        ).alias("priority_clean"),
    )


@register(
    "json_funcs",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
                    THEN 'high' ELSE 'low' END AS k_band
        FROM events
    """,
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from the JSON props column (from_json -> struct).

    ``from_json`` with an explicit schema (not get_json_object string
    plucking) so the parse happens once and the field is typed.
    """
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k BIGINT")
    return ev.select(
        "event_id",
        parsed.getField("k").alias("k"),
        F.when(parsed.getField("k") >= 50, "high").otherwise("low").alias("k_band"),
    )


@register(
    "array_funcs",
    oracle="""
        SELECT vec_id,
               CAST(len(embedding) AS BIGINT) AS dim,
               CAST(embedding[1] AS DOUBLE) AS first_val,
               sqrt(list_reduce(
                    list_transform(CAST(embedding AS DOUBLE[]), x -> x * x),
                    (a, b) -> a + b)) AS l2_norm,
               CAST(len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0))
                    AS BIGINT) AS n_pos
        FROM embeddings
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size / element_at / higher-order transform-aggregate-filter.

    All float math is float64 with identical (sequential) fold order on
    both engines, so the norm is bit-exact — no rounding crutch needed.
    """
    em = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    sq_sum = F.aggregate(
        F.transform(vec, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    return em.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at(vec, 1).alias("first_val"),
        F.sqrt(sq_sum).alias("l2_norm"),
        F.size(F.filter(vec, lambda x: x > 0)).cast("long").alias("n_pos"),
    )


@register(
    "map_funcs",
    oracle="""
        SELECT event_id, event_type AS type_v, CAST(user_id AS VARCHAR) AS user_v
        FROM events
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map create / lookup; the oracle states the equivalent semantics
    without MAP (DuckDB map extraction returns lists — same values,
    different shape), so the check grades the lookup results."""
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("user"), F.col("user_id").cast("string"),
    )
    return ev.select(
        "event_id",
        m.getItem("type").alias("type_v"),
        m.getItem("user").alias("user_v"),
    )
