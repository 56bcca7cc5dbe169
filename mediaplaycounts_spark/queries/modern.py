"""Modern Spark-4 relational surface: argmax aggregates, wide<->long
reshape, and VariantType semi-structured access.

The reference's API returns "the count for file F" — the dual question
("which file/user topped day D?") is an argmax aggregate, here done
with `max_by` over a tie-proof composite ordering instead of a window
(one hash aggregate, no sort, no row_number shuffle — the cheapest
argmax at scale).

`json_variant_extract` routes `events.props` through Spark 4's
VariantType (`parse_json` -> `variant_get`): the open-schema path for
semi-structured ingest — unlike `from_json(schema)`, new keys arrive
without a schema migration, and shredded variant storage keeps
extraction columnar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mediaplaycounts_spark.queries._helpers import cents
from mediaplaycounts_spark.registry import register
from mediaplaycounts_spark.tables import load_table

# ---------------------------------------------------------------- argmax


@register(
    "agg_argmax_daily",
    oracle="""
        WITH per_user AS (
            SELECT date_trunc('day', ts) AS day, user_id,
                   SUM(CAST(round(value * 100, 0) AS BIGINT)) AS total_c
            FROM events GROUP BY day, user_id)
        SELECT day,
               max_by(user_id, total_c * 1000000 - user_id) AS top_user,
               CAST(MAX(total_c) AS DOUBLE) / 100.0 AS top_value
        FROM per_user GROUP BY day
    """,
)
def agg_argmax_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per day, the user with the highest exact value total. Ties are
    impossible by construction: the max_by ordering is the composite
    integer total_cents*1e6 - user_id (prefer the smaller user id), so
    both engines pick the identical winner — bare max_by under ties is
    engine-nondeterministic and would fail the value-hash. Two hash
    aggregates, no window, no sort."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy(
        F.date_trunc("DAY", "ts").alias("day"), "user_id"
    ).agg(F.sum(cents("value")).alias("total_c"))
    return per_user.groupBy("day").agg(
        F.max_by("user_id", F.col("total_c") * 1000000 - F.col("user_id")).alias(
            "top_user"
        ),
        (F.max("total_c").cast("double") / 100.0).alias("top_value"),
    )


# --------------------------------------------------------------- unpivot

_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "reshape_unpivot",
    oracle=f"""
        WITH wide AS (
            SELECT date_trunc('day', ts) AS day,
                   {", ".join(
                       f"COUNT(*) FILTER (event_type = '{t}') AS {t}"
                       for t in _TYPES
                   )}
            FROM events GROUP BY day)
        SELECT day, event_type, n
        FROM wide UNPIVOT (n FOR event_type IN ({", ".join(_TYPES)}))
    """,
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long melt: pivot the daily per-type counts wide (one column
    per event type, zero-filled), then unpivot back to (day, event_type,
    n). The melt is a narrow projection — each input row explodes to 5
    output rows with no shuffle beyond the pivot's aggregate. Zero-fill
    before the melt so neither engine's null-dropping UNPIVOT semantics
    can diverge."""
    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.groupBy(F.date_trunc("DAY", "ts").alias("day"))
        .pivot("event_type", list(_TYPES))
        .count()
        .select(
            "day", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _TYPES]
        )
    )
    return wide.unpivot("day", list(_TYPES), "event_type", "n")


# ---------------------------------------------------------------- variant


@register(
    "json_variant_extract",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k,
               MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
               MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
        FROM events GROUP BY event_type
    """,
)
def json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-schema JSON access via VariantType: parse once
    (`parse_json`), extract typed paths (`variant_get`) with no
    StructType declared — new props keys need no schema change. The
    extraction is codegen'd JVM-side; aggregation over the extracted
    BIGINT is exact integer math."""
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


# ------------------------------------------------- SQL pipe syntax


@register(
    "sql_pipe_syntax",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                 AS sum_cents
        FROM events
        WHERE user_id % 2 = 0
        GROUP BY event_type
        HAVING COUNT(*) > 10
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 `|>` operators): the same relational
    plan written as a linear pipeline — FROM |> WHERE |> AGGREGATE |>
    WHERE(having) — compiled by the same Catalyst rules as classic SQL
    (this is purely parser surface; the physical plan is identical, so
    everything in PLAN_AUDIT.md applies unchanged)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_pipe")
    return spark.sql(
        """
        FROM events_pipe
        |> WHERE user_id % 2 = 0
        |> AGGREGATE COUNT(*) AS n,
                     CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                       AS sum_cents
           GROUP BY event_type
        |> WHERE n > 10
        |> SELECT event_type, n, sum_cents
        """
    )


# ------------------------------------------------- collation grouping


@register(
    "string_collation_group",
    oracle="""
        WITH s AS (SELECT doc_id,
                          CASE WHEN doc_id % 3 = 0 THEN upper(source)
                               WHEN doc_id % 3 = 1 THEN source
                               ELSE concat(upper(substr(source, 1, 1)),
                                           substr(source, 2)) END AS src_mixed
                   FROM documents)
        SELECT lower(src_mixed) AS src_key, COUNT(*) AS n
        FROM s GROUP BY src_key
    """,
)
def string_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 collations): a mixed-case
    source column groups case-insensitively under UTF8_LCASE — the
    collation travels WITH the column through the aggregate, so no
    normalizing projection is needed mid-plan (the output key is
    lowercased only for the engine-neutral oracle comparison).

    At 100 TB collations beat `lower()`-everywhere because the scan,
    the shuffle key, and any join keys agree on equality without
    rewriting every expression — one declaration at the column level."""
    docs = load_table(spark, sf_dir, "documents")
    mixed = (
        F.when(F.col("doc_id") % 3 == 0, F.upper("source"))
        .when(F.col("doc_id") % 3 == 1, F.col("source"))
        .otherwise(
            F.concat(
                F.upper(F.substring("source", 1, 1)), F.expr("substr(source, 2)")
            )
        )
    )
    s = docs.select(mixed.alias("src_mixed")).select(
        F.expr("src_mixed COLLATE UTF8_LCASE").alias("src_ci")
    )
    return (
        s.groupBy("src_ci")
        .agg(F.count("*").alias("n"))
        .select(F.lower(F.col("src_ci")).alias("src_key"), "n")
    )


# -------------------------------------------- subquery decorrelation


@register(
    "sql_subquery_decorrelate",
    oracle="""
        SELECT c.c_custkey, c.c_name,
               (SELECT COUNT(*) FROM orders o
                WHERE o.o_custkey = c.c_custkey) AS n_orders
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
          AND c.c_nationkey IN (SELECT n_nationkey FROM nation
                                WHERE n_regionkey = 1)
    """,
)
def sql_subquery_decorrelate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery SQL surface: EXISTS (-> left-semi join),
    IN (-> left-semi against the nation filter), and a correlated
    scalar COUNT subquery (-> decorrelated to an aggregate + left
    outer join with null->0). The reference answers the category
    question with an N+1 per-file loop (REF GetData::category_*,
    SURVEY.md §3.3); Catalyst's RewriteCorrelatedScalarSubquery +
    RewritePredicateSubquery turn the same intent written as plain SQL
    into three joins in ONE plan — no per-row re-execution anywhere.

    Scale: orders aggregates once on o_custkey (single shuffle), the
    nation IN-list broadcasts, and AQE picks broadcast vs SMJ for the
    semi joins by runtime size.
    """
    for t in ("customer", "orders", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_sq")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name,
               (SELECT COUNT(*) FROM orders_sq o
                WHERE o.o_custkey = c.c_custkey) AS n_orders
        FROM customer_sq c
        WHERE EXISTS (SELECT 1 FROM orders_sq o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
          AND c.c_nationkey IN (SELECT n_nationkey FROM nation_sq
                                WHERE n_regionkey = 1)
        """
    )


@register(
    "sql_udf_params_lateral",
    oracle="""
        WITH a AS (
            SELECT l_returnflag,
                   COUNT(*) AS n_rows,
                   CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                            * CAST(round((1.0 - l_discount) * 10000, 0)
                                   AS BIGINT)) AS DOUBLE) / 1e6 AS revenue_e6
            FROM lineitem WHERE l_quantity > 10
            GROUP BY l_returnflag)
        SELECT l_returnflag, n_rows, revenue_e6,
               round(revenue_e6 / n_rows, 6) AS rev_per_row
        FROM a
    """,
)
def sql_udf_params_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three modern SQL-surface features in one graded plan:

    - a SQL-DEFINED function (CREATE TEMPORARY FUNCTION ... RETURN
      expr): user abstraction with ZERO UDF cost — the body inlines
      into Catalyst and stays in whole-stage codegen, unlike any
      Python/JVM UDF;
    - PARAMETERIZED spark.sql (named :minq binding — injection-safe
      templating, the serving layer's prepared-statement analog);
    - LATERAL COLUMN ALIAS: `rev_per_row` references `revenue_e6`
      defined in the same SELECT — no subquery wrapper.

    The revenue body is the integer-cents-exact expression from
    _helpers, so values hash-match the oracle exactly."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_sqludf")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION cents_rev_e6(p DOUBLE, d DOUBLE) "
        "RETURNS BIGINT RETURN cast(round(p * 100, 0) as bigint) "
        "* cast(round((1.0 - d) * 10000, 0) as bigint)"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n_rows,
               CAST(SUM(cents_rev_e6(l_extendedprice, l_discount)) AS DOUBLE)
                 / 1e6 AS revenue_e6,
               round(revenue_e6 / n_rows, 6) AS rev_per_row
        FROM li_sqludf WHERE l_quantity > :minq
        GROUP BY l_returnflag
        """,
        args={"minq": 10},
    )


@register(
    "sql_identifier_dynamic",
    oracle="""
        SELECT n_name, COUNT(*) AS n_customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
)
def sql_identifier_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic yet INJECTION-SAFE SQL via the IDENTIFIER() clause: the
    table names, join columns, and group-by column arrive as bound
    parameters (the multi-tenant / metadata-driven query pattern —
    "aggregate table X by column Y" from a config row), but unlike
    string interpolation they can only ever resolve as identifiers —
    a value like 'nation; DROP TABLE x' is a resolution error, not an
    executed statement. Catalyst sees a fully resolved static plan, so
    broadcast selection and pushdown work exactly as in the literal
    query (same plan as join_broadcast_dim's shape)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("idc_customer")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("idc_nation")
    return spark.sql(
        """
        SELECT IDENTIFIER(:name_col) AS n_name, COUNT(*) AS n_customers
        FROM IDENTIFIER(:fact) JOIN IDENTIFIER(:dim)
          ON IDENTIFIER(:fact_key) = IDENTIFIER(:dim_key)
        GROUP BY IDENTIFIER(:name_col)
        """,
        args={
            "fact": "idc_customer",
            "dim": "idc_nation",
            "fact_key": "c_nationkey",
            "dim_key": "n_nationkey",
            "name_col": "n_name",
        },
    )


@register(
    "reshape_explode_outer",
    oracle="""
        WITH base AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 5 = 0 THEN []
                        ELSE string_split(lang, '-') END AS tags
            FROM documents),
        ex AS (
            SELECT b.doc_id, t.tag
            FROM base b LEFT JOIN (
                SELECT doc_id, unnest(tags) AS tag FROM base) t
              ON b.doc_id = t.doc_id)
        SELECT doc_id, tag, CAST(tag IS NULL AS BIGINT) AS is_empty
        FROM ex
    """,
)
def reshape_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer semantics — the corner plain explode() silently
    gets wrong: a row whose array is EMPTY (here every 5th doc's tag
    list) must survive as one NULL-tagged row, not vanish. Losing
    empty-array parents is a classic silent-data-loss bug in
    normalization pipelines (docs with no tags disappear from every
    downstream count). The DuckDB twin is the LEFT JOIN against the
    unnested rows — exactly what explode_outer fuses into one
    generator."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, F.array().cast("array<string>"))
        .otherwise(F.split("lang", "-"))
        .alias("tags"),
    )
    return base.select(
        "doc_id", F.explode_outer("tags").alias("tag")
    ).withColumn("is_empty", F.col("tag").isNull().cast("long"))


@register(
    "sql_group_by_all",
    oracle="""
        SELECT event_type, date_trunc('day', ts) AS day,
               user_id % 4 AS cohort,
               COUNT(*) AS n,
               CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                 AS sum_cents
        FROM events
        GROUP BY event_type, day, cohort
    """,
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` (Spark 3.4+ / modern-SQL surface): the engine
    infers the grouping set as every non-aggregate select item —
    killing the copy-the-select-list boilerplate that drifts out of
    sync in wide rollups. Purely parser surface: Catalyst resolves it
    to the identical hash-aggregate plan the explicit GROUP BY (the
    oracle) produces, so pushdown/partial-agg behavior is unchanged."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_gba")
    return spark.sql(
        """
        SELECT event_type, date_trunc('DAY', ts) AS day,
               user_id % 4 AS cohort,
               COUNT(*) AS n,
               CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                 AS sum_cents
        FROM events_gba
        GROUP BY ALL
        """
    )


@register(
    "sql_try_arithmetic",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN CAST(round(o_totalprice * 100, 0) AS BIGINT) %
                         NULLIF(o_custkey % 7, 0) IS NULL THEN NULL
                    ELSE CAST(round(o_totalprice * 100, 0) AS BIGINT)
                         // NULLIF(o_custkey % 7, 0) END AS safe_div,
               TRY_CAST(o_orderpriority AS BIGINT) AS bad_cast,
               TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT)
                 AS prio_digit
        FROM orders
    """,
)
def sql_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ERROR-SAFE expression surface (`try_divide` / `try_cast`): the
    modern-SQL alternative to job-killing runtime errors — division by
    zero and unparseable casts yield NULL instead of failing the stage,
    which at 100 TB is the difference between quarantining a bad row
    and losing a 6-hour job. try_divide's integral result is floored
    identically to the oracle's NULLIF-guarded ``//``; try_cast of
    '1-URGENT' is NULL while its leading digit parses.

    Pure codegen projection, zero shuffle.
    """
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_try")
    return spark.sql(
        """
        SELECT o_orderkey,
               CAST(try_divide(CAST(round(o_totalprice * 100, 0) AS BIGINT),
                               o_custkey % 7) AS BIGINT) AS safe_div,
               try_cast(o_orderpriority AS BIGINT) AS bad_cast,
               try_cast(substr(o_orderpriority, 1, 1) AS BIGINT)
                 AS prio_digit
        FROM orders_try
        """
    )


@register(
    "sql_select_star_except",
    oracle="""
        SELECT * EXCLUDE (props, value),
               CAST(round(value * 100, 0) AS BIGINT) AS value_cents
        FROM events
    """,
)
def sql_select_star_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SELECT * EXCEPT (...)`` (Spark 4 parser surface; DuckDB spells
    it EXCLUDE): project everything BUT the wide/raw columns and append
    the derived one — the idiom that keeps wide-table queries from
    silently dragging a JSON blob column through every downstream
    exchange. Column pruning still reaches the scan (the excluded
    columns are never read), so this is plan-equivalent to an explicit
    narrow select with none of its 40-column maintenance burden."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_sse")
    return spark.sql(
        """
        SELECT * EXCEPT (props, value),
               CAST(round(value * 100, 0) AS BIGINT) AS value_cents
        FROM events_sse
        """
    )
