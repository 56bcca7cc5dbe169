"""§2.F Sort / limit / set operators.

The reference accumulates multi-day results by appending query outputs
in Python (SURVEY.md §2.F union rows); the engine gets TakeOrderedAndProject
for top-k and real set operators. Global ORDER BY ... LIMIT k compiles
to a per-partition top-k + driver merge — no full sort at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mediaplaycounts_spark.registry import register
from mediaplaycounts_spark.tables import load_table


@register(
    "sort_limit_topk",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: TakeOrderedAndProject, deterministic tie-break."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


@register(
    "setop_union_all",
    oracle="""
        SELECT o_orderkey, 'urgent' AS src FROM orders
        WHERE o_orderpriority = '1-URGENT'
        UNION ALL
        SELECT o_orderkey, 'big' AS src FROM orders WHERE o_totalprice > 400000
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append two branches by name (duplicates kept — both tags can hit
    the same order)."""
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", F.lit("urgent").alias("src")
    )
    big = o.filter(F.col("o_totalprice") > 400000).select(
        "o_orderkey", F.lit("big").alias("src")
    )
    return urgent.unionByName(big)


@register(
    "setop_union_distinct",
    oracle="""
        SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
        UNION
        SELECT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union with dedup (nations that have customers or suppliers)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("long").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("long").alias("nationkey")
    )
    return c.unionByName(s).distinct()


@register(
    "setop_intersect",
    oracle="""
        SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
        INTERSECT
        SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers active in both 1995 and 1996 (INTERSECT distinct)."""
    o = load_table(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.intersect(y96)


@register(
    "setop_except",
    oracle="""
        SELECT o_custkey FROM orders
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with orders but none finished (EXCEPT distinct)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_custkey").subtract(
        o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    )


@register(
    "setop_union_by_name_missing",
    oracle="""
        SELECT o_orderkey, o_totalprice,
               CAST(NULL AS VARCHAR) AS o_orderpriority, 'v1' AS src
        FROM orders WHERE o_orderkey % 3 = 0
        UNION ALL
        SELECT o_orderkey, o_totalprice, o_orderpriority, 'v2' AS src
        FROM orders WHERE o_orderkey % 3 = 1
    """,
)
def setop_union_by_name_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift union: `unionByName(allowMissingColumns=True)`
    aligns by COLUMN NAME and null-fills columns one side lacks — the
    batch twin of `scan_schema_evolution`'s read-side merge, and the
    correct tool when appending a pre-migration extract to a
    post-migration one (positional `union` would silently misalign).
    Narrow, zero-shuffle, order-preserving per side."""
    o = load_table(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_totalprice", F.lit("v1").alias("src")
    )
    v2 = o.filter(F.col("o_orderkey") % 3 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderpriority", F.lit("v2").alias("src")
    )
    return v1.unionByName(v2, allowMissingColumns=True).select(
        "o_orderkey", "o_totalprice", "o_orderpriority", "src"
    )


@register(
    "setop_except_all",
    oracle="""
        SELECT l_orderkey FROM lineitem
        EXCEPT ALL
        SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics EXCEPT ALL: multiplicities subtract instead of the
    distinct-set collapse — the form ledger/event reconciliation needs
    (one missing occurrence must surface as exactly one row). One
    shuffle on the compare key; no pre-distinct pass."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.select("l_orderkey")
    b = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return a.exceptAll(b)


@register(
    "setop_intersect_all",
    oracle="""
        SELECT l_orderkey FROM lineitem WHERE l_linenumber <= 2
        INTERSECT ALL
        SELECT l_orderkey FROM lineitem WHERE l_quantity > 10
    """,
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics INTERSECT ALL: min(multiplicity) per key survives —
    completes the set-op family (ALL variants beside the distinct
    forms)."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_linenumber") <= 2).select("l_orderkey")
    b = li.filter(F.col("l_quantity") > 10).select("l_orderkey")
    return a.intersectAll(b)
