"""§2.C Join operators.

The reference has exactly one join-shaped computation — category
membership resolved via the Commons API then an N+1 per-file SQL loop
(REF GetData::category_*, SURVEY.md §3.3). Here that becomes a single
semi-join plan; the rest of the family (broadcast dim, shuffle equi,
date-spine outer, anti, interval, as-of, cross) is the standard surface
a general engine needs (SURVEY.md §2.C).

Scale notes per operator are in the docstrings; the common rules:
small dims are broadcast (no shuffle), big-big joins shuffle on the
equi-key and AQE handles skew, and the as-of join avoids the
join-then-filter row explosion entirely via a union + running-last
window (one shuffle, no N×M intermediate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mediaplaycounts_spark.queries._helpers import REVENUE_E4_SQL, cents, revenue_e4
from mediaplaycounts_spark.registry import register
from mediaplaycounts_spark.tables import load_table, maybe_broadcast


@register(
    "join_broadcast_dim",
    oracle="""
        SELECT o.o_orderkey, c.c_name, n.n_name, r.r_name
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact × small dims with explicit broadcast hints.

    customer/nation/region are broadcast — the fact table never
    shuffles. At 100 TB this is the difference between a map-only stage
    and a full fact-table exchange.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(maybe_broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("o_orderkey", "c_name", "n_name", "r_name")
    )


@register(
    "join_shuffle_equi",
    oracle="""
        SELECT l.l_orderkey, l.l_linenumber AS line_no, o.o_orderdate,
               CAST(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))
                    AS DOUBLE) / 10000.0 AS revenue
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
    """,
)
def join_shuffle_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big × big equi-join: sort-merge on the shuffled key.

    Both sides shuffle on l_orderkey/o_orderkey once; AQE may flip to
    broadcast at small SF and splits skewed keys at large SF. The
    status filter is pushed below the join into the orders scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    revenue = revenue_e4("l_extendedprice", "l_discount").cast("double") / 10000.0
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("line_no"),
        "o_orderdate",
        revenue.alias("revenue"),
    )


@register(
    "join_left_outer_datespine",
    oracle="""
        WITH bounds AS (
            SELECT date_trunc('day', MIN(ts)) AS mn, date_trunc('day', MAX(ts)) AS mx
            FROM events
        ),
        spine AS (
            SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day FROM bounds
        ),
        counts AS (
            SELECT date_trunc('day', ts) AS day, COUNT(*) AS n
            FROM events WHERE event_type = 'purchase' GROUP BY day
        )
        SELECT s.day, COALESCE(c.n, 0) AS n_purchases
        FROM spine s LEFT JOIN counts c ON s.day = c.day
    """,
)
def join_left_outer_datespine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine LEFT JOIN: zero-fill days with no plays.

    The reference zero-fills missing days in Python when serializing
    date_range results (REF GetData::date_range ⚠); here the spine is
    generated in-plan (sequence+explode — no driver loop) and the join
    broadcasts the tiny spine.
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("DAY", "ts")
    spine = (
        ev.agg(
            F.min(day).alias("mn"), F.max(day).alias("mx")
        )
        .select(
            F.explode(F.sequence("mn", "mx", F.expr("INTERVAL 1 DAY"))).alias("day")
        )
    )
    counts = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(day.alias("day"))
        .agg(F.count("*").alias("n"))
    )
    return (
        F.broadcast(spine)
        .join(counts, "day", "left")
        .select("day", F.coalesce("n", F.lit(0)).alias("n_purchases"))
    )


@register(
    "join_semi_membership",
    oracle="""
        SELECT l_orderkey, l_linenumber AS line_no, l_partkey
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size < 10)
    """,
)
def join_semi_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Category membership as a leftsemi join (REF GetData::category_*).

    The reference resolved a category to member files via the Commons
    API, then ran one SQL query per member (N+1). Here membership is a
    table and the whole category query is ONE broadcast semi-join — the
    definitive Spark win in SURVEY.md §3.3.
    """
    li = load_table(spark, sf_dir, "lineitem")
    members = load_table(spark, sf_dir, "part").filter(F.col("p_size") < 10)
    return li.join(
        F.broadcast(members), li.l_partkey == members.p_partkey, "leftsemi"
    ).select("l_orderkey", F.col("l_linenumber").cast("long").alias("line_no"), "l_partkey")


@register(
    "join_anti",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join: entities with zero facts (files with zero plays)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "leftanti").select(
        "c_custkey", "c_name"
    )


_INTERVALS = [
    ("w1", "2024-01-01 00:00:00", "2024-01-11 00:00:00"),
    ("w2", "2024-01-11 00:00:00", "2024-01-21 00:00:00"),
    ("w3", "2024-01-21 00:00:00", "2024-02-01 00:00:00"),
]


@register(
    "join_range_interval",
    oracle="""
        WITH iv(label, s, e) AS (VALUES
            ('w1', TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-11 00:00:00'),
            ('w2', TIMESTAMP '2024-01-11 00:00:00', TIMESTAMP '2024-01-21 00:00:00'),
            ('w3', TIMESTAMP '2024-01-21 00:00:00', TIMESTAMP '2024-02-01 00:00:00'))
        SELECT iv.label, ev.event_type, COUNT(*) AS n_events
        FROM events ev JOIN iv ON ev.ts >= iv.s AND ev.ts < iv.e
        GROUP BY iv.label, ev.event_type
    """,
)
def join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: event ts within [start, end).

    With a tiny broadcast interval table this is a broadcast
    nested-loop — fine. At scale with many intervals, pre-bucketize:
    assign each event an interval-granularity bucket key and equi-join
    on the bucket first (turns BNLJ into a shuffle join); that variant
    lives in the docs because these 3 literal windows don't need it.
    """
    ev = load_table(spark, sf_dir, "events")
    iv = spark.createDataFrame(_INTERVALS, "label string, s string, e string").select(
        "label",
        F.col("s").cast("timestamp_ntz").alias("s"),
        F.col("e").cast("timestamp_ntz").alias("e"),
    )
    return (
        ev.join(F.broadcast(iv), (ev.ts >= iv.s) & (ev.ts < iv.e))
        .groupBy("label", "event_type")
        .agg(F.count("*").alias("n_events"))
    )


#: Bucket granularity for the bucketized interval join (seconds). Rule:
#: pick g <= min interval length so each interval explodes to a bounded
#: handful of buckets (48h / 6h = 9 here).
_BKT_SECONDS = 6 * 3600
_EPOCH_2024_01_01 = 1704067200  # 2024-01-01 00:00:00 UTC


@register(
    "join_range_bucketized",
    oracle="""
        WITH iv AS (
            SELECT 'w' || CAST(i AS VARCHAR) AS label,
                   TIMESTAMP '2024-01-01 00:00:00' + INTERVAL 1 HOUR * (12 * i) AS s,
                   TIMESTAMP '2024-01-01 00:00:00' + INTERVAL 1 HOUR * (12 * i + 48) AS e
            FROM range(0, 58) t(i))
        SELECT iv.label, ev.event_type, COUNT(*) AS n_events
        FROM events ev JOIN iv ON ev.ts >= iv.s AND ev.ts < iv.e
        GROUP BY iv.label, ev.event_type
    """,
)
def join_range_bucketized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB scale path for interval joins (SURVEY.md §7 watch-list
    item 3): 58 sliding 48-hour windows, equi-joined on a 6-hour bucket.

    Each interval explodes to its covered buckets (<= 9 rows each); each
    event computes one bucket. The theta condition becomes bucket
    equality + a residual range filter — a HASH join Catalyst can
    shuffle or broadcast, never the O(|events| x |intervals|) BNLJ the
    naive theta join runs. The oracle is the plain theta join: results
    must be identical (an event's single bucket can't duplicate a
    match within one interval; overlapping intervals multi-match by
    design, same as the theta join).
    """
    ev = load_table(spark, sf_dir, "events")
    iv = spark.range(58).select(
        F.concat(F.lit("w"), F.col("id").cast("string")).alias("label"),
        (F.lit(_EPOCH_2024_01_01) + F.col("id") * (12 * 3600)).alias("s_sec"),
        (F.lit(_EPOCH_2024_01_01) + F.col("id") * (12 * 3600) + 48 * 3600).alias(
            "e_sec"
        ),
    )
    ivb = iv.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.expr(f"s_sec div {_BKT_SECONDS}"),
                F.expr(f"(e_sec - 1) div {_BKT_SECONDS}"),
            )
        ),
    ).select(
        "label",
        "bucket",
        F.timestamp_seconds("s_sec").cast("timestamp_ntz").alias("s"),
        F.timestamp_seconds("e_sec").cast("timestamp_ntz").alias("e"),
    )
    evb = ev.withColumn(
        "bucket", F.expr(f"unix_timestamp(ts) div {_BKT_SECONDS}")
    )
    return (
        evb.join(F.broadcast(ivb), "bucket")
        .filter((F.col("ts") >= F.col("s")) & (F.col("ts") < F.col("e")))
        .groupBy("label", "event_type")
        .agg(F.count("*").alias("n_events"))
    )


@register(
    "join_asof",
    oracle="""
        SELECT e.event_id, e.user_id, e.ts, s.ts AS signup_ts
        FROM events e
        ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
        ON e.user_id = s.user_id AND e.ts >= s.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest right row at-or-before each left row's time.

    Spark has no native as-of; the scalable formulation is union the two
    streams, sort within each key once, and carry the right side's value
    forward with last(ignorenulls) — one shuffle, no join-then-filter
    row explosion, no per-key skew blowup (cf. the row_number-over-
    theta-join alternative which materializes |events|x|signups| per
    user). Right rows sort BEFORE left rows at equal ts so ties match
    (ASOF's >= semantics), verified against DuckDB's native ASOF JOIN.
    """
    ev = load_table(spark, sf_dir, "events")
    left = ev.select(
        "user_id", "ts", "event_id",
        F.lit(None).cast("timestamp_ntz").alias("signup_ts"),
        F.lit(1).alias("is_left"),
    )
    right = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts",
        F.lit(None).cast("long").alias("event_id"),
        F.col("ts").alias("signup_ts"),
        F.lit(0).alias("is_left"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_left", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = left.unionByName(right).withColumn(
        "asof_ts", F.last("signup_ts", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("is_left") == 1).select(
        "event_id", "user_id", "ts", F.col("asof_ts").alias("signup_ts")
    )


@register(
    "join_cross_small",
    oracle="""
        SELECT r.r_name, s.o_orderstatus AS status
        FROM region r CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
)
def join_cross_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Guarded Cartesian for spine/grid building (both sides tiny)."""
    r = load_table(spark, sf_dir, "region")
    statuses = load_table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(F.broadcast(statuses)).select(
        "r_name", F.col("o_orderstatus").alias("status")
    )


@register(
    "join_skew_salted",
    oracle=f"""
        SELECT o.o_orderpriority,
               CAST(SUM({REVENUE_E4_SQL.format(price='l.l_extendedprice',
                                               discount='l.l_discount')})
                    AS DOUBLE) / 10000.0 AS revenue,
               COUNT(*) AS n_items
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated equi-join: explicit key salting.

    Popular media files are Zipfian (SURVEY.md §4.2) — one hot join key
    can pin a whole shuffle partition to one task. The classic fix, shown
    here end-to-end: facts get a deterministic salt in [0, N) (xxhash64
    of non-key columns — no RNG, so the run is replayable), the other
    side is replicated N ways via explode, and the join key becomes
    (key, salt), fanning the hot key over N tasks. The result is
    provably identical to the unsalted join — the oracle IS the unsalted
    join — because every fact row still meets its matching dim row in
    exactly one salt bucket. AQE's skew-join split handles moderate skew
    automatically; explicit salting is the tool for pathological keys
    (or non-AQE engines) and costs only N-fold duplication of the SMALL
    side.
    """
    n_salt = 8
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li_s = li.withColumn(
        "salt",
        F.pmod(F.xxhash64("l_extendedprice", "l_discount"), F.lit(n_salt)).cast("int"),
    )
    o_s = o.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    joined = li_s.join(
        o_s, (li_s.l_orderkey == o_s.o_orderkey) & (li_s.salt == o_s.salt)
    )
    return joined.groupBy("o_orderpriority").agg(
        (
            F.sum(revenue_e4("l_extendedprice", "l_discount")).cast("double")
            / F.lit(10000.0)
        ).alias("revenue"),
        F.count("*").alias("n_items"),
    )


@register(
    "join_asof_tolerance",
    oracle="""
        SELECT e.event_id, e.user_id, e.ts,
               CASE WHEN s.ts IS NOT NULL
                     AND date_diff('second', s.ts, e.ts) <= 86400
                    THEN s.ts END AS signup_ts,
               CAST(s.ts IS NOT NULL
                    AND date_diff('second', s.ts, e.ts) <= 86400
                    AS BIGINT) AS matched
        FROM events e
        ASOF LEFT JOIN (SELECT user_id, ts FROM events
                        WHERE event_type = 'signup') s
        ON e.user_id = s.user_id AND e.ts >= s.ts
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with bounded staleness (pandas `merge_asof` tolerance
    semantics): the latest signup at-or-before each event matches only
    if it is <= 24 h old — older matches are nulled, NOT replaced by an
    even older row. Same union+window formulation as `join_asof`
    (one user-keyed shuffle, no row explosion); the tolerance is one
    extra projection on top.

    At 100 TB the tolerance is also the state bound: a streaming
    deployment of this op keeps only 24 h of right-side state per key
    (cf. stream_stream_join's watermark band)."""
    base = join_asof(spark, sf_dir)
    fresh = F.col("signup_ts").isNotNull() & (
        (F.unix_timestamp("ts") - F.unix_timestamp("signup_ts")) <= 86400
    )
    return base.select(
        "event_id",
        "user_id",
        "ts",
        F.when(fresh, F.col("signup_ts")).alias("signup_ts"),
        fresh.cast("bigint").alias("matched"),
    )


@register(
    "join_lateral_topn",
    oracle="""
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
        FROM customer c,
             LATERAL (SELECT o_orderkey, o_totalprice
                      FROM orders
                      WHERE o_custkey = c.c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey
                      LIMIT 1) o
        WHERE c.c_custkey <= 50
    """,
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: each customer's single most
    expensive order, written as a per-row dependent subquery — the SQL
    surface users reach for before they learn the window formulation.
    Catalyst DECORRELATES it (DecorrelateInnerQuery) into the same
    join+window plan `win_topk_per_group` builds by hand, so the
    lateral form costs nothing extra at scale — one shuffle, no
    N+1 re-execution (the reference's category loop, SURVEY.md §3.3,
    was exactly the un-decorrelated version of this)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_l")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_l")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
        FROM customer_l c,
             LATERAL (SELECT o_orderkey, o_totalprice
                      FROM orders_l
                      WHERE o_custkey = c.c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey
                      LIMIT 1) o
        WHERE c.c_custkey <= 50
        """
    )


@register(
    "join_null_safe",
    oracle="""
        WITH o AS (SELECT CASE WHEN o_orderstatus = 'P' THEN NULL
                               ELSE o_orderstatus END AS nk,
                          o_totalprice
                   FROM orders),
        d(st, label) AS (VALUES ('F', 'finished'), ('O', 'open'),
                                (NULL, 'unknown'))
        SELECT d.label, COUNT(*) AS n,
               CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS sum_cents
        FROM o JOIN d ON o.nk IS NOT DISTINCT FROM d.st
        GROUP BY d.label
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match NULL dim rows instead of silently dropping — the
    sentinel-bucket pattern for dirty dimension keys (unknown status,
    unparseable category) where a plain equi-join would lose rows and
    an outer-join + COALESCE would double-handle the sentinel.

    EqualNullSafe is a valid hash-join key in Spark (NULL hashes to a
    regular bucket), so with the 3-row dim broadcast this stays a
    BroadcastHashJoin — zero shuffle on the fact side, identical to
    the plain broadcast-dim plan.
    """
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        F.when(F.col("o_orderstatus") == "P", None)
        .otherwise(F.col("o_orderstatus"))
        .alias("nk"),
        cents("o_totalprice").alias("c"),
    )
    dim = spark.createDataFrame(
        [("F", "finished"), ("O", "open"), (None, "unknown")],
        "st string, label string",
    )
    j = o.join(F.broadcast(dim), o["nk"].eqNullSafe(dim["st"]), "inner")
    return j.groupBy("label").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("sum_cents"),
    )


@register(
    "join_asof_forward",
    oracle="""
        WITH c AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'click'),
             p AS (SELECT user_id, ts FROM events
                   WHERE event_type = 'purchase'),
             nx AS (SELECT c.event_id, c.user_id, c.ts,
                           (SELECT MIN(p.ts) FROM p
                            WHERE p.user_id = c.user_id AND p.ts >= c.ts)
                             AS next_purchase_ts
                    FROM c)
        SELECT event_id, user_id, ts, next_purchase_ts,
               CAST(next_purchase_ts IS NOT NULL AS BIGINT) AS matched,
               CASE WHEN next_purchase_ts IS NOT NULL
                    THEN date_diff('microsecond', ts, next_purchase_ts)
               END AS micros_to_purchase
        FROM nx
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (pandas merge_asof direction='forward'): for
    every click, the EARLIEST purchase at-or-after it by the same user
    — the time-to-conversion direction `join_asof` (backward: latest
    signup before) can't express. Same union-free formulation: one
    (user, event-time) window with a RANGE frame from the current
    instant to +∞ carrying min(purchase ts); RANGE (on microseconds,
    not ROWS) makes equal-timestamp purchases visible regardless of
    event_id order, matching the oracle's ts >= ts semantics exactly.

    Scale: one shuffle on user_id, running-min window state is one
    value — the same plan shape as every as-of key here; no range
    join, no correlated subquery (the oracle uses one; Catalyst
    would decorrelate it to the same window)."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(
        F.col("event_type").isin("click", "purchase")
    ).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tus")
        .rangeBetween(Window.currentRow, Window.unboundedFollowing)
    )
    nxt = base.withColumn(
        "next_purchase_ts",
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).over(w),
    )
    return nxt.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        "ts",
        "next_purchase_ts",
        F.col("next_purchase_ts").isNotNull().cast("bigint").alias("matched"),
        F.when(
            F.col("next_purchase_ts").isNotNull(),
            F.unix_micros(F.col("next_purchase_ts").cast("timestamp")) - F.col("tus"),
        ).alias("micros_to_purchase"),
    )


@register(
    "join_interval_overlap",
    oracle="""
        WITH s AS (
            SELECT user_id,
                   date_trunc('day', ts) AS day,
                   MIN(ts) AS t0, MAX(ts) AS t1
            FROM events GROUP BY user_id, day),
        p AS (
            SELECT a.user_id AS u1, b.user_id AS u2, a.day,
                   CAST(date_diff('microsecond',
                        greatest(a.t0, b.t0), least(a.t1, b.t1)) AS BIGINT)
                     AS overlap_us
            FROM s a JOIN s b
              ON a.day = b.day AND a.user_id < b.user_id
             AND a.t0 <= b.t1 AND b.t0 <= a.t1)
        SELECT u1, u2, COUNT(*) AS n_days,
               CAST(SUM(overlap_us) AS BIGINT) AS total_overlap_us
        FROM p GROUP BY u1, u2
        HAVING COUNT(*) >= 5
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL-OVERLAP join: user pairs whose daily activity spans
    [first event, last event] overlap, with total overlap time —
    the co-presence primitive (concurrent sessions, co-editing,
    fraud-ring detection). The quadratic trap is joining every span
    against every span; here spans are BLOCKED on the calendar day
    before the overlap theta-predicate runs — the same
    block-then-verify shape as the dedup family (`join_range_bucketized`
    generalizes the blocking to bucket grids for multi-day spans).
    Overlap time is microsecond-integer (both engines' timestamp diff),
    pairs thresholded to ≥5 shared days.

    One span agg (user, day), one day-blocked equi-join + codegen
    predicate, one pair agg — all keys near-uniform."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.groupBy(
        "user_id", F.date_trunc("DAY", "ts").alias("day")
    ).agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    a = s.select(
        F.col("user_id").alias("u1"),
        "day",
        F.col("t0").alias("a0"),
        F.col("t1").alias("a1"),
    )
    b = s.select(
        F.col("user_id").alias("u2"),
        "day",
        F.col("t0").alias("b0"),
        F.col("t1").alias("b1"),
    )
    pairs = (
        a.join(b, "day")
        .filter(
            (F.col("u1") < F.col("u2"))
            & (F.col("a0") <= F.col("b1"))
            & (F.col("b0") <= F.col("a1"))
        )
        .select(
            "u1",
            "u2",
            (
                F.unix_micros(F.least("a1", "b1").cast("timestamp"))
                - F.unix_micros(F.greatest("a0", "b0").cast("timestamp"))
            ).alias("overlap_us"),
        )
    )
    return (
        pairs.groupBy("u1", "u2")
        .agg(
            F.count("*").alias("n_days"),
            F.sum("overlap_us").cast("long").alias("total_overlap_us"),
        )
        .filter(F.col("n_days") >= 5)
    )


@register(
    "join_asof_nearest",
    oracle="""
        WITH c AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'click'),
             p AS (SELECT user_id, ts FROM events
                   WHERE event_type = 'purchase'),
             cand AS (
                SELECT c.event_id, c.user_id, c.ts,
                       (SELECT MAX(p.ts) FROM p
                        WHERE p.user_id = c.user_id AND p.ts <= c.ts)
                         AS back_ts,
                       (SELECT MIN(p.ts) FROM p
                        WHERE p.user_id = c.user_id AND p.ts >= c.ts)
                         AS fwd_ts
                FROM c),
             pick AS (
                SELECT *,
                       CASE WHEN back_ts IS NULL AND fwd_ts IS NULL THEN NULL
                            WHEN back_ts IS NOT NULL AND (fwd_ts IS NULL
                                 OR date_diff('microsecond', back_ts, ts)
                                    <= date_diff('microsecond', ts, fwd_ts))
                            THEN 'backward' ELSE 'forward' END AS direction
                FROM cand)
        SELECT event_id, user_id, ts,
               CASE direction WHEN 'backward' THEN back_ts
                              WHEN 'forward' THEN fwd_ts END
                 AS nearest_purchase_ts,
               CASE direction
                    WHEN 'backward' THEN date_diff('microsecond', back_ts, ts)
                    WHEN 'forward' THEN date_diff('microsecond', ts, fwd_ts)
               END AS abs_us,
               direction
        FROM pick
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of join (pandas merge_asof
    direction='nearest'): for every click, the same user's purchase
    with the smallest absolute time distance, ties broken toward the
    earlier (backward) candidate — completing the as-of triple with
    `join_asof` (backward) and `join_asof_forward` (forward).

    Formulation: ONE shuffle on user_id, two window frames over the
    same (user_id, event-time) sort — a running max of purchase-ts over
    RANGE (-inf, now] and a running min over RANGE [now, +inf) — then a
    codegen CASE picks the closer candidate in exact microsecond
    integers. Catalyst plans both frames off a single Exchange+Sort
    (same partitioning and ordering), so "nearest" costs the same as
    one directional as-of; no range join, no |clicks|x|purchases|
    blowup on hot users. The oracle's two correlated subqueries are
    the semantics spec; DuckDB decorrelates them the same way.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("tus")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("tus")
        .rangeBetween(Window.currentRow, Window.unboundedFollowing)
    )
    p_ts = F.when(F.col("event_type") == "purchase", F.col("ts"))
    cand = base.select(
        "event_id",
        "user_id",
        "ts",
        "tus",
        "event_type",
        F.max(p_ts).over(wb).alias("back_ts"),
        F.min(p_ts).over(wf).alias("fwd_ts"),
    )
    back_us = F.col("tus") - F.unix_micros(F.col("back_ts").cast("timestamp"))
    fwd_us = F.unix_micros(F.col("fwd_ts").cast("timestamp")) - F.col("tus")
    direction = (
        F.when(F.col("back_ts").isNull() & F.col("fwd_ts").isNull(), F.lit(None))
        .when(
            F.col("back_ts").isNotNull()
            & (F.col("fwd_ts").isNull() | (back_us <= fwd_us)),
            F.lit("backward"),
        )
        .otherwise(F.lit("forward"))
    )
    return (
        cand.filter(F.col("event_type") == "click")
        .withColumn("direction", direction)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.when(F.col("direction") == "backward", F.col("back_ts"))
            .when(F.col("direction") == "forward", F.col("fwd_ts"))
            .alias("nearest_purchase_ts"),
            F.when(F.col("direction") == "backward", back_us)
            .when(F.col("direction") == "forward", fwd_us)
            .alias("abs_us"),
            "direction",
        )
    )


@register(
    "join_geo_grid",
    oracle="""
        WITH pts AS (
            SELECT c_custkey AS id,
                   (c_custkey * 48271) % 180000000 - 90000000 AS lat_u,
                   (c_custkey * 69621) % 360000000 - 180000000 AS lon_u
            FROM customer)
        SELECT a.id AS id_a, b.id AS id_b,
               (a.lat_u - b.lat_u) * (a.lat_u - b.lat_u)
               + (a.lon_u - b.lon_u) * (a.lon_u - b.lon_u) AS dist2_u
        FROM pts a JOIN pts b
          ON a.id < b.id
         AND (a.lat_u - b.lat_u) * (a.lat_u - b.lat_u)
             + (a.lon_u - b.lon_u) * (a.lon_u - b.lon_u)
             <= 250000000000
    """,
)
def join_geo_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRID-BLOCKED spatial proximity join: all point pairs within a
    0.5-degree radius, found by hashing points into 1-degree grid
    cells and equi-joining each point's 3x3 neighborhood — the
    canonical scale shape for spatial joins (same block-then-verify
    family as the LSH dedup path), vs the oracle's O(n^2) theta join
    which is the semantics spec only.

    Coordinates are synthesized DETERMINISTICALLY from c_custkey via
    integer modular congruences (micro-degrees, identical expression on
    both engines); distance is exact int64 squared micro-degrees
    (planar — no wraparound at the antimeridian, documented), so no
    trig and no float ever enters the plan.

    Scale math: one side explodes x9 cell offsets, then the join is a
    pure equi-join on cell id — shuffle is 9|A| + |B| rows, candidate
    pairs are only same-neighborhood points, and each qualifying pair
    is emitted exactly once (the non-exploded side keeps its single
    home cell). Skewed cells (urban hotspots) split via AQE skew
    handling like any hash join.
    """
    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select(
        F.col("c_custkey").alias("id"),
        (F.col("c_custkey") * 48271 % 180000000 - 90000000).alias("lat_u"),
        (F.col("c_custkey") * 69621 % 360000000 - 180000000).alias("lon_u"),
    )
    cell = 1000000  # 1-degree grid; radius 0.5 degree => 3x3 suffices
    a = pts.select(
        F.col("id").alias("id_a"),
        F.col("lat_u").alias("lat_a"),
        F.col("lon_u").alias("lon_a"),
        F.explode(
            F.array(*[F.lit(i) for i in (-1, 0, 1)])
        ).alias("dx"),
    ).select(
        "id_a",
        "lat_a",
        "lon_a",
        "dx",
        F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])).alias("dy"),
    ).select(
        "id_a",
        "lat_a",
        "lon_a",
        (F.floor(F.col("lat_a") / cell) + F.col("dx")).alias("cx"),
        (F.floor(F.col("lon_a") / cell) + F.col("dy")).alias("cy"),
    )
    b = pts.select(
        F.col("id").alias("id_b"),
        F.col("lat_u").alias("lat_b"),
        F.col("lon_u").alias("lon_b"),
        F.floor(F.col("lat_u") / cell).alias("cx"),
        F.floor(F.col("lon_u") / cell).alias("cy"),
    )
    d2 = (F.col("lat_a") - F.col("lat_b")) * (
        F.col("lat_a") - F.col("lat_b")
    ) + (F.col("lon_a") - F.col("lon_b")) * (F.col("lon_a") - F.col("lon_b"))
    return (
        a.join(b, ["cx", "cy"])
        .filter((F.col("id_a") < F.col("id_b")) & (d2 <= F.lit(250000000000)))
        .select("id_a", "id_b", d2.alias("dist2_u"))
    )


@register(
    "join_star_multi_dim",
    oracle=f"""
        SELECT r.r_name AS region, c.c_mktsegment AS segment,
               p.p_brand AS brand,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                        * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)))
                    AS BIGINT) AS revenue_e4
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY region, segment, brand
    """,
)
def join_star_multi_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STAR-SCHEMA multi-dimension rollup: one fact scan joined through
    FIVE dimensions (orders -> customer -> nation -> region, plus part)
    to a (region, segment, brand) revenue cube — the canonical BI plan
    every warehouse engine is judged on.

    Plan discipline: nation/region/part are unconditionally broadcast
    (broadcast-sized at ANY scale factor); orders/customer go through
    the SIZE-GATED :func:`maybe_broadcast` — at bench scale Catalyst's
    optimized-plan stats fit the gate, the hint fires, the fact table
    is scanned ONCE and never shuffled, and the only exchange is the
    final (region, segment, brand) hash agg (map-side partials first).
    At true 100 TB orders/customer exceed the gate, the hint is
    withheld, and planning degrades to a shuffle join one dimension at
    a time instead of OOMing the driver on a forced multi-TB broadcast
    (tests/test_broadcast_gate.py exercises both branches). Revenue
    is the exact e4-integer ladder (price cents x (100 - pct)).
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = revenue_e4("l_extendedprice", "l_discount")
    return (
        li.join(maybe_broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("r_name").alias("region"),
            F.col("c_mktsegment").alias("segment"),
            F.col("p_brand").alias("brand"),
        )
        .agg(
            F.count("*").alias("n_items"),
            F.sum(rev).alias("revenue_e4"),
        )
    )


@register(
    "join_full_outer_reconcile",
    oracle="""
        WITH a AS (
            SELECT o_orderkey AS ok,
                   CAST(round(o_totalprice * 100, 0) AS BIGINT) AS a_cents
            FROM orders),
        b AS (
            SELECT l_orderkey AS ok,
                   CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                        AS BIGINT) AS b_cents
            FROM lineitem GROUP BY l_orderkey),
        j AS (
            SELECT COALESCE(a.ok, b.ok) AS ok, a_cents, b_cents,
                   CASE WHEN b.ok IS NULL THEN 'a_only'
                        WHEN a.ok IS NULL THEN 'b_only'
                        WHEN a_cents = b_cents THEN 'match'
                        ELSE 'mismatch' END AS status
            FROM a FULL OUTER JOIN b ON a.ok = b.ok)
        SELECT status, COUNT(*) AS n,
               CAST(SUM(abs(COALESCE(a_cents, 0) - COALESCE(b_cents, 0)))
                    AS BIGINT) AS abs_diff_cents
        FROM j GROUP BY status
    """,
)
def join_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL-OUTER RECONCILIATION report: compare two independent
    computations of the same business quantity (the order header total
    vs the sum of its line items) and classify every key as a_only /
    b_only / match / mismatch with the absolute cent drift — the
    migration/dual-write audit every pipeline cutover runs before
    flipping traffic.

    One hash agg builds the B side, then a single full outer join on
    the shared key (both sides already orderkey-partitioned, so the
    exchange is reused) and one 4-row status rollup. Exact cents
    throughout — a reconciliation that itself used floats would
    manufacture phantom mismatches.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("a_cents"),
    )
    b = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("ok"))
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("long")
            ).alias("b_cents")
        )
    )
    j = o.alias("a").join(b.alias("b"), "ok", "full_outer").select(
        F.when(F.col("b.b_cents").isNull(), "a_only")
        .when(F.col("a.a_cents").isNull(), "b_only")
        .when(F.col("a.a_cents") == F.col("b.b_cents"), "match")
        .otherwise("mismatch")
        .alias("status"),
        (
            F.abs(
                F.coalesce(F.col("a.a_cents"), F.lit(0))
                - F.coalesce(F.col("b.b_cents"), F.lit(0))
            )
        ).alias("d"),
    )
    return j.groupBy("status").agg(
        F.count("*").alias("n"),
        F.sum("d").cast("long").alias("abs_diff_cents"),
    )


# ----------------------------------------- runtime-filter (Bloom) join

_RF_BITS = 1 << 14  # 16 Kbit = 2 KiB bitmap; ~40 keys/nation at sf0.1
_RF_WORDS = _RF_BITS // 64
_RF_K = 5


@register(
    "join_bloom_pruned",
    oracle="""
        SELECT s.s_suppkey, s.s_name,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS revenue_cents
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE s.s_nationkey = 7
        GROUP BY s.s_suppkey, s.s_name
    """,
)
def join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RUNTIME-FILTER JOIN: revenue per supplier of one nation, with the
    fact side pre-pruned by a BLOOM FILTER built from the selective dim
    — the runtime-filter / sideways-information-passing pattern every
    warehouse engine applies when a selective dim predicate should
    shrink the fact scan BEFORE the join exchange.

    Build: the dim's join keys (suppliers of nation 7, ~4% of the dim)
    explode into k=5 xxhash64 bit positions, bit_or-folded into a 2 KiB
    bitmap (one tiny shuffle), collected once and constant-folded into
    the probe predicate — the same distributed-build/codegen-probe shape
    as text_contamination_bloom. Probe: the fact scan tests all 5 bits
    JVM-side; only ~4% of fact rows (+ FP noise, ~2^-5 per hash with
    this sizing) survive into the join. The join itself then removes
    Bloom false positives, so the RESULT is exactly the plain join —
    which is what the oracle asserts. At 100 TB the win is the exchange:
    96% of the fact never shuffles (with an SMJ dim side) and never
    leaves the scan stage; Spark's own `runtimeFilter` does this
    automatically only for DPP-eligible partition columns, while the
    explicit bitmap works on ANY equi-join key.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice"
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    keys = sup.filter(F.col("s_nationkey") == 7).select("s_suppkey")
    # distributed Bloom build: key -> k bit positions -> bit_or words
    # Cast both build and probe keys to BIGINT before xxhash64: the hash
    # is input-type-sensitive, so an int vs bigint width mismatch between
    # the dim and fact key columns would otherwise make every probe miss
    # and silently drop matching fact rows (ADVICE r4).
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(
                        F.xxhash64(
                            F.col("s_suppkey").cast("long"), F.lit(i)
                        ),
                        F.lit(_RF_BITS),
                    )
                    for i in range(_RF_K)
                ]
            )
        ).alias("p")
    )
    words = (
        pos.select(
            (F.col("p") / 64).cast("long").alias("w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(p, 64) AS INT))"
            ).alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
    )
    bitmap = {r.w: r.bits for r in words.collect()}
    bits_lit = F.array(
        *[F.lit(bitmap.get(i, 0)).cast("long") for i in range(_RF_WORDS)]
    )
    probe = F.lit(True)
    for i in range(_RF_K):
        p = f"pmod(xxhash64(CAST(l_suppkey AS BIGINT), {i}), {_RF_BITS})"
        w = f"CAST({p} / 64 AS INT)"
        b = f"shiftleft(CAST(1 AS BIGINT), CAST(pmod({p}, 64) AS INT))"
        probe = probe & (
            F.element_at(bits_lit, F.expr(w) + 1).bitwiseAND(F.expr(b)) != 0
        )
    pruned = li.filter(probe)
    dim = sup.filter(F.col("s_nationkey") == 7).select("s_suppkey", "s_name")
    return (
        pruned.join(dim, pruned.l_suppkey == dim.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(cents("l_extendedprice")).cast("long").alias(
                "revenue_cents"
            ),
        )
    )



@register(
    "join_geo_nearest",
    oracle="""
        WITH pts AS (
            SELECT c_custkey AS id,
                   (c_custkey * 48271) % 180000000 - 90000000 AS lat_u,
                   (c_custkey * 69621) % 360000000 - 180000000 AS lon_u
            FROM customer),
        cand AS (
            SELECT a.id AS id, b.id AS nn_id,
                   (a.lat_u - b.lat_u) * (a.lat_u - b.lat_u)
                   + (a.lon_u - b.lon_u) * (a.lon_u - b.lon_u) AS d2
            FROM pts a JOIN pts b
              ON a.id != b.id
             AND (a.lat_u - b.lat_u) * (a.lat_u - b.lat_u)
                 + (a.lon_u - b.lon_u) * (a.lon_u - b.lon_u)
                 <= 250000000000),
        best AS (
            SELECT id, nn_id, d2,
                   ROW_NUMBER() OVER (PARTITION BY id
                                      ORDER BY d2, nn_id) AS rn
            FROM cand)
        SELECT p.id, best.nn_id, best.d2 AS nn_dist2_u
        FROM pts p LEFT JOIN best ON p.id = best.id AND best.rn = 1
    """,
)
def join_geo_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-NEIGHBOR-WITHIN-RADIUS spatial join: for every point,
    its closest other point within 0.5 degrees (NULL when isolated) —
    the store-to-nearest-depot / user-to-nearest-POI assignment. The
    radius bound is what makes the grid path EXACT: the true nearest
    neighbor within r is always inside the 3x3 neighborhood of
    1-degree cells, so blocking loses nothing (an unbounded NN would
    need ring-expansion search — documented, different operator).

    Same deterministic integer micro-degree points and cell layout as
    `join_geo_grid`; candidates from the 9-cell equi-join, winner by
    one (id)-partitioned min window with a deterministic (d2, id)
    tie-break, left-joined back so isolated points keep a row. Shuffle
    is 9|A|+|B| candidate build + one id-keyed window — linear,
    skew-split by AQE like any hash join.
    """
    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") * 48271) % 180000000 - 90000000).alias("lat_u"),
        ((F.col("c_custkey") * 69621) % 360000000 - 180000000).alias("lon_u"),
    )
    cell = 1000000  # 1-degree grid in micro-degrees
    a = pts.select(
        F.col("id").alias("ida"), F.col("lat_u").alias("la"),
        F.col("lon_u").alias("lo"),
    ).select(
        "ida", "la", "lo",
        F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])).alias("dx"),
    ).select(
        "ida", "la", "lo", "dx",
        F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])).alias("dy"),
    ).select(
        "ida", "la", "lo",
        (F.floor(F.col("la") / cell) + F.col("dx")).alias("cx"),
        (F.floor(F.col("lo") / cell) + F.col("dy")).alias("cy"),
    )
    b = pts.select(
        F.col("id").alias("idb"), F.col("lat_u").alias("lb"),
        F.col("lon_u").alias("lob"),
        F.floor(F.col("lat_u") / cell).alias("cx"),
        F.floor(F.col("lon_u") / cell).alias("cy"),
    )
    d2 = (F.col("la") - F.col("lb")) * (F.col("la") - F.col("lb")) + (
        F.col("lo") - F.col("lob")
    ) * (F.col("lo") - F.col("lob"))
    cand = (
        a.join(b, ["cx", "cy"])
        .filter((F.col("ida") != F.col("idb")) & (d2 <= F.lit(250000000000)))
        .select(F.col("ida").alias("id"), F.col("idb").alias("nn_id"),
                d2.alias("d2"))
    )
    best = cand.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("id").orderBy("d2", "nn_id")
        ),
    ).filter(F.col("rn") == 1)
    return pts.select("id").join(
        best.select("id", "nn_id", F.col("d2").alias("nn_dist2_u")),
        "id",
        "left",
    )


@register(
    "join_range_overlap_duration",
    oracle="""
        WITH w(label, s, e) AS (VALUES
            ('wk1', TIMESTAMP '2024-01-03 00:00:00',
                    TIMESTAMP '2024-01-10 00:00:00'),
            ('wk2', TIMESTAMP '2024-01-12 12:00:00',
                    TIMESTAMP '2024-01-20 06:00:00')),
        sess AS (
            SELECT user_id, MIN(ts) AS s_start, MAX(ts) AS s_end
            FROM events GROUP BY user_id),
        ov AS (
            SELECT w.label, sess.user_id,
                   date_diff('second',
                             greatest(sess.s_start, w.s),
                             least(sess.s_end, w.e)) AS secs
            FROM sess JOIN w
              ON sess.s_start < w.e AND sess.s_end > w.s)
        SELECT label,
               COUNT(*) AS n_users,
               CAST(SUM(secs) AS BIGINT) AS overlap_seconds
        FROM ov GROUP BY label
    """,
)
def join_range_overlap_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OVERLAP-DURATION join: per campaign window, how many user
    activity spans intersect it and for how many TOTAL seconds — the
    exposure-attribution primitive (ad flight × user session co-time)
    that `join_interval_overlap` (pair detection) and
    `agg_peak_concurrency` (count over time) bracket but don't answer.
    Overlap length = least(ends) − greatest(starts), guarded by the
    strict-intersection predicate so it is always positive.

    One user agg builds the spans, then a broadcast theta join against
    the 2-row window table (at many-windows scale: bucketize on window
    granularity and equi-join like `join_range_bucketized`). Whole-
    second integers end to end.
    """
    ev = load_table(spark, sf_dir, "events")
    sess = ev.groupBy("user_id").agg(
        F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
    )
    w = spark.createDataFrame(
        [
            ("wk1", "2024-01-03 00:00:00", "2024-01-10 00:00:00"),
            ("wk2", "2024-01-12 12:00:00", "2024-01-20 06:00:00"),
        ],
        "label string, s string, e string",
    ).select(
        "label",
        F.col("s").cast("timestamp_ntz").alias("s"),
        F.col("e").cast("timestamp_ntz").alias("e"),
    )
    ov = sess.join(
        F.broadcast(w),
        (F.col("s_start") < F.col("e")) & (F.col("s_end") > F.col("s")),
    ).select(
        "label",
        F.expr(
            "CAST(unix_timestamp(least(s_end, e))"
            " - unix_timestamp(greatest(s_start, s)) AS BIGINT)"
        ).alias("secs"),
    )
    return ov.groupBy("label").agg(
        F.count("*").alias("n_users"),
        F.sum("secs").cast("long").alias("overlap_seconds"),
    )
