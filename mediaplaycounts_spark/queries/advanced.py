"""Advanced relational surface: recursive CTE hierarchy closure, native
XML ingest, rolling distinct counts, sweep-line peak concurrency,
triangle counting, deterministic mode, exact-moment skewness, and
FILTER-clause aggregates.

The recursive CTE is the direct engine-side answer to the reference's
recursive category expansion (REF GetData::category_* walks Commons
subcategories to a depth bound with one API call per level, SURVEY.md
§3.3) — here the hierarchy closure runs as one Spark 4 `WITH RECURSIVE`
plan, no driver loop, no per-level round-trips.
"""

from __future__ import annotations

import pathlib
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mediaplaycounts_spark.registry import register
from mediaplaycounts_spark.tables import load_table

SCRATCH = pathlib.Path(__file__).resolve().parents[2] / ".scratch"

# ------------------------------------------------------ recursive CTE


@register(
    "sql_recursive_cte",
    oracle="""
        WITH RECURSIVE cats AS (
            SELECT DISTINCT source, CAST(substr(source, 4) AS INT) AS num
            FROM documents),
        tree AS (
            SELECT source, num, 0 AS depth FROM cats WHERE num = 0
            UNION ALL
            SELECT c.source, c.num, t.depth + 1 AS depth
            FROM cats c JOIN tree t ON (c.num - 1) // 2 = t.num
            WHERE c.num > 0)
        SELECT t.source, t.depth, COUNT(*) AS n_docs
        FROM tree t JOIN documents d ON d.source = t.source
        GROUP BY t.source, t.depth
    """,
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive hierarchy closure (Spark 4 `WITH RECURSIVE`): the 20
    document sources form a binary category tree (parent of srcK is
    src((K-1) div 2)); the recursion walks it from the root computing
    each category's depth, then joins back for per-category doc counts.

    This is the reference's category-resolution capability (recursive
    subcategory expansion, REF GetData::category_*) expressed as ONE
    declarative plan: Catalyst unrolls the recursion into iterative
    union steps engine-side, where the reference pays one Commons API
    round-trip per hierarchy level per query. Each recursion step is a
    join against the (tiny, broadcast) frontier — depth is bounded by
    the hierarchy (here ceil(log2(20)) = 5 levels), not by data volume,
    so the same plan holds when the leaf tables are 100 TB."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents_rc")
    return spark.sql(
        """
        WITH RECURSIVE cats AS (
            SELECT DISTINCT source, CAST(substr(source, 4) AS INT) AS num
            FROM documents_rc),
        tree AS (
            SELECT source, num, 0 AS depth FROM cats WHERE num = 0
            UNION ALL
            SELECT c.source, c.num, t.depth + 1 AS depth
            FROM cats c JOIN tree t ON (c.num - 1) DIV 2 = t.num
            WHERE c.num > 0)
        SELECT t.source, t.depth, COUNT(*) AS n_docs
        FROM tree t JOIN documents_rc d ON d.source = t.source
        GROUP BY t.source, t.depth
        """
    )


# ------------------------------------------------------------ XML scan


@register(
    "scan_xml",
    oracle="""
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               MIN(doc_id) AS min_doc_id
        FROM documents
        GROUP BY lang
    """,
)
def scan_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native XML source (built into Spark 4): documents metadata
    round-tripped through XML with an explicit read schema (no
    inference pass at scale — inference would double-read the corpus),
    then aggregated off the XML scan. XML lands as splittable row-tag
    records, so executors parse shards in parallel exactly like any
    other text source; fidelity is proven by value-exact aggregation
    against the original parquet."""
    from pyspark.sql import types as T

    out = str(SCRATCH / f"xml_docs_{uuid.uuid4().hex[:12]}")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    docs.write.format("xml").option("rowTag", "doc").mode("overwrite").save(out)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    back = spark.read.format("xml").option("rowTag", "doc").schema(schema).load(out)
    return back.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.min("doc_id").alias("min_doc_id"),
    )


# ------------------------------------------------ rolling distinct users


@register(
    "win_rolling_distinct",
    oracle="""
        WITH pairs AS (
            SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day,
                            user_id
            FROM events),
        days AS (SELECT DISTINCT day FROM pairs),
        contrib AS (
            SELECT user_id,
                   CAST(unnest(generate_series(day, day + INTERVAL 6 DAY,
                                               INTERVAL 1 DAY)) AS DATE)
                     AS out_day
            FROM pairs)
        SELECT d.day, COUNT(DISTINCT c.user_id) AS u7
        FROM contrib c JOIN days d ON c.out_day = d.day
        GROUP BY d.day
    """,
)
def win_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day — the rolling-window
    metric plain window frames CANNOT express (COUNT(DISTINCT) is not a
    frameable aggregate in either engine). Formulation: dedup to
    (day, user) pairs first (collapses the raw log by ~events-per-
    user-day), then each pair *fans out* to the ≤7 future days it keeps
    a user active for via `explode(sequence(...))` — turning the range
    join into a plain equi-join + hash aggregate. No BNLJ, no window
    over a global sort.

    Scale: fan-out is bounded (×7) and the join key (day) is low-
    cardinality but the aggregate key (day, user) shards fine; for 30/
    90-day windows at 100 TB swap the exact COUNT(DISTINCT) for the
    HLL-sketch path (agg_hll_sketch_merge) — same fan-out shape, sketch
    merge instead of exact dedup."""
    ev = load_table(spark, sf_dir, "events")
    pairs = (
        ev.select(
            F.date_trunc("DAY", "ts").cast("date").alias("day"), "user_id"
        )
        .distinct()
    )
    days = pairs.select("day").distinct()
    contrib = pairs.select(
        "user_id",
        F.explode(F.expr("sequence(day, date_add(day, 6))")).alias("out_day"),
    )
    return (
        contrib.join(days.withColumnRenamed("day", "out_day"), "out_day")
        .groupBy(F.col("out_day").alias("day"))
        .agg(F.countDistinct("user_id").alias("u7"))
    )


# ------------------------------------------------- peak concurrency


@register(
    "agg_peak_concurrency",
    oracle="""
        WITH b AS (
            SELECT event_type, ts AS t, 1 AS delta, event_id FROM events
            UNION ALL
            SELECT event_type,
                   ts + to_seconds(CAST(round(value, 0) AS BIGINT)) AS t,
                   -1 AS delta, event_id
            FROM events),
        r AS (
            SELECT event_type,
                   SUM(delta) OVER (PARTITION BY event_type
                                    ORDER BY t, delta, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS running
            FROM b)
        SELECT event_type, CAST(MAX(running) AS BIGINT) AS peak,
               CAST(COUNT(*) / 2 AS BIGINT) AS n_events
        FROM r GROUP BY event_type
    """,
)
def agg_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line peak concurrency: each event opens an interval
    [ts, ts + value seconds); the classic +1/-1 boundary union with a
    running sum gives instantaneous concurrency, and the max per
    event_type is the peak. Ordering (t, delta, event_id) is total and
    puts closes (-1) before opens (+1) at the same instant — half-open
    interval semantics, identical on both engines.

    Scale: the running sum needs a total order *per partition key* —
    here event_type. At 100 TB you partition the sweep by a time bucket
    (e.g. day) instead, run the same local sweep per bucket, and add a
    prefix-correction pass: per-bucket net-delta totals are tiny, so a
    second window over bucket subtotals re-bases each bucket's running
    sum — two shuffles total, no global sort of raw boundaries."""
    ev = load_table(spark, sf_dir, "events")
    starts = ev.select(
        "event_type",
        F.col("ts").alias("t"),
        F.lit(1).alias("delta"),
        "event_id",
    )
    ends = ev.select(
        "event_type",
        F.expr(
            "timestampadd(SECOND, CAST(round(value, 0) AS BIGINT), ts)"
        ).alias("t"),
        F.lit(-1).alias("delta"),
        "event_id",
    )
    b = starts.unionByName(ends)
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = b.select("event_type", F.sum("delta").over(w).alias("running"))
    return r.groupBy("event_type").agg(
        F.max("running").alias("peak"),
        (F.count("*") / 2).cast("bigint").alias("n_events"),
    )


# ---------------------------------------------------- triangle count


@register(
    "graph_triangle_count",
    oracle="""
        WITH ps AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk
                    FROM lineitem),
        e AS (SELECT DISTINCT a.sk AS s1, b.sk AS s2
              FROM ps a JOIN ps b ON a.pk = b.pk AND a.sk < b.sk),
        tri AS (SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
                FROM e e1
                JOIN e e2 ON e1.s2 = e2.s1
                JOIN e e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2)
        SELECT (SELECT COUNT(*) FROM e) AS n_edges,
               (SELECT COUNT(*) FROM tri) AS n_triangles
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the supplier co-supply graph (suppliers
    are adjacent iff they ship the same part). Edges are oriented
    s1 < s2, so each triangle a<b<c is generated exactly once by the
    canonical two-hop-plus-closing-edge join — no /6 correction, no
    duplicate elimination on the output.

    Scale: co-supply edge generation is a per-part self-join — bounded
    because TPC-H parts have ≤4 suppliers (real graphs: cap or sample
    hub keys). The triangle join shuffles edges twice on supplier keys;
    the standard 100 TB refinement is degree-based orientation (orient
    edges low-degree → high-degree instead of by id), which provably
    bounds the two-hop intermediate at O(E^1.5) even on power-law
    graphs."""
    from mediaplaycounts_spark.session import checkpoint_df

    li = load_table(spark, sf_dir, "lineitem")
    ps = li.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).distinct()
    a, b = ps.alias("a"), ps.alias("b")
    # Materialize the edge table once: it feeds FOUR plan branches
    # (e1/e2/e3 + the edge count) and the co-supply self-join is the
    # expensive part to recompute. The checkpoint also severs the
    # size-underestimated lineage — without it AQE coalesced the wedge
    # join down to a handful of tasks at sf1 and a multi-billion-row
    # sort OOMed the heap (found by the r5 sf0.1->sf1 decade).
    e = checkpoint_df(
        a.join(b, (F.col("a.pk") == F.col("b.pk")) & (F.col("a.sk") < F.col("b.sk")))
        .select(F.col("a.sk").alias("s1"), F.col("b.sk").alias("s2"))
        .distinct()
    )
    # Degree orientation: re-orient each edge from the (degree, id)-
    # LESSER endpoint to the greater. Every triangle is still produced
    # exactly once (by its minimal vertex in that total order), and the
    # two-hop intermediate is bounded by sum(out_deg^2) with
    # out_deg = O(sqrt(E)) — the standard power-law-proof refinement
    # the id-ordering lacks (a low-ID hub keeps its full degree as
    # out-degree; a low-ORDER vertex by construction cannot).
    deg = (
        e.select(F.col("s1").alias("v"))
        .unionAll(e.select(F.col("s2").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    n_parts = spark.sparkContext.defaultParallelism * 4
    o = (
        e.join(deg.withColumnRenamed("v", "s1").withColumnRenamed("d", "d1"), "s1")
        .join(deg.withColumnRenamed("v", "s2").withColumnRenamed("d", "d2"), "s2")
        .select(
            F.when(
                (F.col("d1") < F.col("d2"))
                | ((F.col("d1") == F.col("d2")) & (F.col("s1") < F.col("s2"))),
                F.struct(
                    F.col("s1").alias("src"),
                    F.col("s2").alias("dst"),
                    F.col("d2").alias("ddeg"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("s2").alias("src"),
                    F.col("s1").alias("dst"),
                    F.col("d1").alias("ddeg"),
                )
            )
            .alias("oe")
        )
        .select("oe.src", "oe.dst", "oe.ddeg")
    )
    o = checkpoint_df(o)
    # Wedge at the minimal vertex: (a->b, a->c) with b before c in the
    # (deg, id) order, closed by the oriented edge b->c. Explicit
    # NUMBERED repartitions pin the join parallelism (user-specified
    # counts are exempt from AQE coalescing) so the wedge stream fans
    # out across cores instead of sorting billions of rows in one task.
    x = o.repartition(n_parts, "src").alias("x")
    y = o.repartition(n_parts, "src").alias("y")
    wedges = x.join(
        y,
        (F.col("x.src") == F.col("y.src"))
        & (
            (F.col("x.ddeg") < F.col("y.ddeg"))
            | (
                (F.col("x.ddeg") == F.col("y.ddeg"))
                & (F.col("x.dst") < F.col("y.dst"))
            )
        ),
    ).select(F.col("x.dst").alias("b"), F.col("y.dst").alias("c"))
    closing = o.select(
        F.col("src").alias("b"), F.col("dst").alias("c")
    ).repartition(n_parts, "b", "c")
    tri = wedges.repartition(n_parts, "b", "c").join(closing, ["b", "c"])
    return e.agg(F.count("*").alias("n_edges")).crossJoin(
        tri.agg(F.count("*").alias("n_triangles"))
    )


# ------------------------------------------------------ exact mode


@register(
    "agg_mode_exact",
    oracle="""
        WITH c AS (SELECT user_id, event_type, COUNT(*) AS n
                   FROM events GROUP BY user_id, event_type),
        r AS (SELECT user_id, event_type, n,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY n DESC, event_type ASC) AS rn
              FROM c)
        SELECT user_id, event_type AS mode_type, n AS n_mode
        FROM r WHERE rn = 1
    """,
)
def agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-user mode (most frequent event_type): count per
    (user, type), then rank within user by (count DESC, type ASC) and
    keep rank 1. Native `mode()` exists in both engines but its
    tie-break is engine-defined (Spark picks per its deterministic
    flag, DuckDB picks first-seen) — the explicit composite ordering is
    the only formulation two engines agree on under ties, and ties are
    common (30 days x 5 types).

    Scale: one hash aggregate + one window partitioned by the same key
    the aggregate grouped on — with matching partitioning Catalyst
    reuses the exchange, so the window adds a per-partition sort but no
    second shuffle."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("n").desc(), F.col("event_type").asc()
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_type"),
            F.col("n").alias("n_mode"),
        )
    )


# ------------------------------------------------- exact-moment skewness


@register(
    "agg_skewness_exact",
    oracle="""
        WITH m AS (SELECT event_type,
                          COUNT(*) AS n,
                          SUM(CAST(round(value, 0) AS BIGINT)) AS s1,
                          SUM(CAST(round(value, 0) AS BIGINT)
                              * CAST(round(value, 0) AS BIGINT)) AS s2,
                          SUM(CAST(round(value, 0) AS BIGINT)
                              * CAST(round(value, 0) AS BIGINT)
                              * CAST(round(value, 0) AS BIGINT)) AS s3
                   FROM events GROUP BY event_type)
        SELECT event_type, n,
               round((CAST(s3 AS DOUBLE) / n
                      - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
                      + 2 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                        * (CAST(s1 AS DOUBLE) / n))
                     / (sqrt(CAST(s2 AS DOUBLE) / n
                             - (CAST(s1 AS DOUBLE) / n)
                               * (CAST(s1 AS DOUBLE) / n))
                        * sqrt(CAST(s2 AS DOUBLE) / n
                               - (CAST(s1 AS DOUBLE) / n)
                                 * (CAST(s1 AS DOUBLE) / n))
                        * sqrt(CAST(s2 AS DOUBLE) / n
                               - (CAST(s1 AS DOUBLE) / n)
                                 * (CAST(s1 AS DOUBLE) / n))),
                     6) AS skew
        FROM m
    """,
)
def agg_skewness_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness per event_type from exact integer moments
    (n, Σv, Σv², Σv³ over v = round(value) as int64) — extending the
    variance/correlation moment strategy to the third moment. Native
    `skewness()` is a streaming double accumulation whose result
    depends on partition order — unhashable across engines; exact
    int64 partials + one identically-parenthesized final double
    formula is order-independent.

    Overflow bound: |v| ≤ ~10³ here so Σv³ ≤ 10⁹ per 10⁹ rows — safe in
    int64 through ~10⁹ rows/group; past that promote the S3 partial to
    DECIMAL(38,0) (still partial-agg safe, ~3x slower)."""
    ev = load_table(spark, sf_dir, "events")
    v = F.round(F.col("value"), 0).cast("long")
    m = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(v).alias("s1"),
        F.sum(v * v).alias("s2"),
        F.sum(v * v * v).alias("s3"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / nd
    m2 = F.col("s2").cast("double") / nd - mean * mean
    m3 = (
        F.col("s3").cast("double") / nd
        - F.lit(3) * mean * (F.col("s2").cast("double") / nd)
        + F.lit(2) * mean * mean * mean
    )
    skew = m3 / (F.sqrt(m2) * F.sqrt(m2) * F.sqrt(m2))
    return m.select("event_type", "n", F.round(skew, 6).alias("skew"))


# ------------------------------------------------ FILTER-clause aggs


@register(
    "agg_count_if_filtered",
    oracle="""
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               COUNT(*) AS n,
               COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
               CAST(COALESCE(SUM(CAST(round(value * 100, 0) AS BIGINT))
                             FILTER (WHERE event_type = 'purchase'), 0)
                    AS BIGINT) AS purchase_cents,
               COALESCE(MAX(CAST(round(value * 100, 0) AS BIGINT))
                        FILTER (WHERE event_type = 'error'), -1)
                 AS max_error_cents
        FROM events
        GROUP BY day
    """,
)
def agg_count_if_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditionally-filtered aggregates in ONE pass over the fact table
    (`count_if` + the ANSI `FILTER (WHERE ...)` clause): per-day totals
    alongside purchase-only and error-only aggregates without
    re-scanning per segment — the reference would issue one SQL query
    per segment (SURVEY.md §3.2 N+1 shape). All conditions evaluate
    map-side inside the same partial hash aggregate, so k segment
    metrics cost one shuffle, not k scans. COALESCE pins the
    no-matching-rows groups to engine-agnostic sentinels (NULL handling
    of empty filtered sets is the classic cross-engine trap)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_cif")
    return spark.sql(
        """
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               COUNT(*) AS n,
               count_if(event_type = 'purchase') AS n_purchase,
               COALESCE(SUM(CAST(round(value * 100, 0) AS BIGINT))
                        FILTER (WHERE event_type = 'purchase'), 0)
                 AS purchase_cents,
               COALESCE(MAX(CAST(round(value * 100, 0) AS BIGINT))
                        FILTER (WHERE event_type = 'error'), -1)
                 AS max_error_cents
        FROM events_cif
        GROUP BY day
        """
    )


def _bound_rolling_hll(
    spark: SparkSession, sf_dir: str, result: DataFrame
) -> str:
    """Raw HLL rolling estimates within 5% of exact for every day."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("DAY", "ts").cast("date").alias("day")
    ).agg(F.hll_sketch_agg("user_id", 14).alias("sk"))
    w = Window.orderBy("day").rowsBetween(-6, 0)
    est = {
        r.day: r.est
        for r in daily.select(
            "day",
            F.hll_sketch_estimate(F.hll_union_agg("sk").over(w)).alias("est"),
        ).collect()
    }
    exact = {r.day: r.u7 for r in win_rolling_distinct(spark, sf_dir).collect()}
    assert set(est) == set(exact)
    for d, x in exact.items():
        assert abs(est[d] - x) <= max(1, 0.05 * x), (d, est[d], x)
    flags = [r.within_bound for r in result.collect()]
    assert flags and all(flags), "registered within_bound has FALSE rows"
    return f"rolling HLL estimate within 5% of exact on all {len(exact)} days"


@register(
    "win_rolling_distinct_hll",
    oracle="""
        WITH pairs AS (
            SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day,
                            user_id
            FROM events),
        days AS (SELECT DISTINCT day FROM pairs),
        contrib AS (
            SELECT user_id,
                   CAST(unnest(generate_series(day, day + INTERVAL 6 DAY,
                                               INTERVAL 1 DAY)) AS DATE)
                     AS out_day
            FROM pairs)
        SELECT d.day, COUNT(DISTINCT c.user_id) AS u7_exact,
               TRUE AS within_bound
        FROM contrib c JOIN days d ON c.out_day = d.day
        GROUP BY d.day
    """,
    bound=_bound_rolling_hll,
)
def win_rolling_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB path `win_rolling_distinct` documents, now graded:
    trailing-7-day distinct users via MERGEABLE HLL SKETCHES in a
    window frame — one tiny sketch per day, each day's answer a union
    of 7 blobs (`hll_union_agg(...).over(rowsBetween(-6, 0))`). No ×7
    row fan-out, no exact distinct state: the rolling-distinct cost
    collapses from |day×user| to |days| sketches regardless of corpus
    size (30/90-day windows just widen the frame over the same blobs).

    Driver-checkable within_bound form: exact rolling distincts (the
    fan-out formulation, grading-only at this scale) plus a boolean
    pinning every day's estimate within 5% (lgK=14 ⇒ ~0.8% rsd)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("DAY", "ts").cast("date").alias("day")
    ).agg(F.hll_sketch_agg("user_id", 14).alias("sk"))
    w = Window.orderBy("day").rowsBetween(-6, 0)
    est = daily.select(
        "day",
        F.hll_sketch_estimate(F.hll_union_agg("sk").over(w)).alias("est"),
    )
    exact = win_rolling_distinct(spark, sf_dir).select(
        F.col("day"), F.col("u7").alias("u7_exact")
    )
    return exact.join(F.broadcast(est), "day").select(
        "day",
        "u7_exact",
        (
            F.abs(F.col("est") - F.col("u7_exact"))
            <= F.greatest(F.lit(1.0), 0.05 * F.col("u7_exact"))
        ).alias("within_bound"),
    )
