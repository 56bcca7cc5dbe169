"""§2.E Window-function operators.

The reference's flagship queries are rolling last-30/last-90-day totals
per file (REF GetData::last_30/last_90) — executed there as indexed SQL
range scans plus Python summing. Here they are range-frame window
aggregates over the daily rollup: one shuffle on the partition key, then
a sorted in-partition pass (WindowExec), no driver-side loops.

Scale notes: every window below partitions by a key (event_type /
user_id) so state is bounded per partition; none uses a global
unpartitioned window (which would serialize on one task at 100 TB).
Ties are always broken explicitly (ts, then id) so results are
deterministic and hash-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mediaplaycounts_spark.registry import register
from mediaplaycounts_spark.tables import load_table


def _daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared base: per-(day, type) event counts."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("DAY", "ts").alias("day"), "event_type"
    ).agg(F.count("*").alias("n"))


_DAILY_SQL = """
        SELECT date_trunc('day', ts) AS day, event_type, COUNT(*) AS n
        FROM events GROUP BY day, event_type
"""


@register(
    "win_topk_per_group",
    oracle=f"""
        WITH daily AS (
            SELECT date_trunc('day', ts) AS day, user_id, COUNT(*) AS n
            FROM events GROUP BY day, user_id
        )
        SELECT day, user_id, n, rn FROM (
            SELECT day, user_id, n,
                   ROW_NUMBER() OVER (PARTITION BY day
                                      ORDER BY n DESC, user_id) AS rn
            FROM daily) t
        WHERE rn <= 3
    """,
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N most-active users per day (top-played files per day in the
    reference's terms). Aggregate first, then rank the small rollup —
    never rank raw events."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("DAY", "ts").alias("day"), "user_id").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("day").orderBy(F.desc("n"), "user_id")
    return (
        daily.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("day", "user_id", "n", F.col("rn").cast("long").alias("rn"))
    )


@register(
    "win_rank_dense",
    oracle="""
        SELECT o_orderkey, o_orderstatus,
               RANK() OVER w AS rnk,
               DENSE_RANK() OVER w AS drnk,
               CAST(NTILE(4) OVER w AS BIGINT) AS quartile
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile with explicit tie-breaks."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@register(
    "win_lag_delta",
    oracle=f"""
        WITH daily AS ({_DAILY_SQL})
        SELECT day, event_type, n,
               n - LAG(n) OVER (PARTITION BY event_type ORDER BY day) AS delta
        FROM daily
    """,
)
def win_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day delta per type (NULL on each partition's first day)."""
    daily = _daily_counts(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("day")
    return daily.select(
        "day", "event_type", "n", (F.col("n") - F.lag("n").over(w)).alias("delta")
    )


@register(
    "win_rolling_30d",
    oracle=f"""
        WITH daily AS ({_DAILY_SQL})
        SELECT day, event_type, n,
               CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY day
                    RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS last_7,
               CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY day
                    RANGE BETWEEN INTERVAL 29 DAY PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS last_30
        FROM daily
    """,
)
def win_rolling_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship rolling totals (REF GetData::last_30/90).

    RANGE frames over days (not ROWS — gap days must not stretch the
    window). The frame is expressed on unix_date day numbers; the DuckDB
    twin uses RANGE BETWEEN INTERVAL, same semantics. 7- and 30-day
    variants in one pass over the daily rollup.
    """
    daily = _daily_counts(spark, sf_dir).withColumn(
        "day_num", F.unix_date(F.col("day").cast("date"))
    )
    base = Window.partitionBy("event_type").orderBy("day_num")
    w7 = base.rangeBetween(-6, 0)
    w30 = base.rangeBetween(-29, 0)
    return daily.select(
        "day",
        "event_type",
        "n",
        F.sum("n").over(w7).alias("last_7"),
        F.sum("n").over(w30).alias("last_30"),
    )


@register(
    "win_cumulative",
    oracle=f"""
        WITH daily AS ({_DAILY_SQL})
        SELECT day, event_type, n,
               CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS running_total
        FROM daily
    """,
)
def win_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running all-time total per type (cumulative playcount per file)."""
    daily = _daily_counts(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "day", "event_type", "n", F.sum("n").over(w).alias("running_total")
    )


@register(
    "win_first_last",
    oracle="""
        SELECT DISTINCT user_id,
               FIRST_VALUE(event_type) OVER w AS first_type,
               LAST_VALUE(event_type) OVER w AS last_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last value per partition with an explicit full frame."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
    ).distinct()


@register(
    "win_percent_rank_ntile",
    oracle="""
        WITH d AS (
            SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                     AS tot_cents
            FROM events GROUP BY event_type, day)
        SELECT event_type, day, tot_cents,
               percent_rank() OVER w AS pr,
               CAST(ntile(4) OVER w AS BIGINT) AS quartile
        FROM d
        WINDOW w AS (PARTITION BY event_type ORDER BY tot_cents, day)
    """,
)
def win_percent_rank_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative standing of each day inside its event type:
    percent_rank (exact (rank-1)/(n-1) — one double division over
    integers, engine-identical) and ntile(4) quartile buckets. The
    ordering key (tot_cents, day) is a total order, so ntile's
    row-position semantics are deterministic on both engines.

    One shuffle to (type, day) cents, one window partitioned by type —
    type cardinality bounds the window's partition count, not the fact
    volume."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.date_trunc("DAY", "ts").cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("tot_cents")
    )
    w = Window.partitionBy("event_type").orderBy("tot_cents", "day")
    return d.select(
        "event_type",
        "day",
        "tot_cents",
        F.percent_rank().over(w).alias("pr"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@register(
    "win_pattern_sequence",
    oracle="""
        WITH o AS (
            SELECT user_id, ts, event_id, event_type,
                   LEAD(event_type, 1) OVER w AS e1,
                   LEAD(event_type, 2) OVER w AS e2
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id,
               COUNT(*) AS n_matches,
               MIN(ts) AS first_match_ts
        FROM o
        WHERE event_type = 'view' AND e1 = 'click' AND e2 = 'purchase'
        GROUP BY user_id
    """,
)
def win_pattern_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-SEQUENCE pattern matching (MATCH_RECOGNIZE emulation):
    find every CONSECUTIVE view → click → purchase run per user (no
    intervening events) — the strict-contiguity funnel that
    `agg_funnel_steps` (any-order containment) can't express. Fixed-
    length patterns compile to a LEAD chain over one (user, time)
    window — a single shuffle, no state machine, no path blowup; the
    total (ts, event_id) order makes duplicate timestamps
    deterministic. Variable-length patterns (A B+ C) extend this with
    the streak-run trick (`win_streak_runs`): group-change cumsum then
    match on the run table.

    At 100 TB: the window partitions by user (near-uniform), LEAD
    needs 2 rows of lookahead state — nothing holistic."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.lead("event_type", 1).over(w).alias("e1"),
        F.lead("event_type", 2).over(w).alias("e2"),
    )
    return (
        o.filter(
            (F.col("event_type") == "view")
            & (F.col("e1") == "click")
            & (F.col("e2") == "purchase")
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_matches"),
            F.min("ts").alias("first_match_ts"),
        )
    )


@register(
    "win_rate_limit_flags",
    oracle="""
        WITH w AS (
            SELECT event_id, user_id, ts,
                   COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                                  RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING
                                        AND CURRENT ROW) AS n_10m
            FROM events)
        SELECT event_id, user_id, CAST(n_10m AS BIGINT) AS n_10m,
               CAST(n_10m > 3 AS BIGINT) AS rate_limited
        FROM w
    """,
)
def win_rate_limit_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING RATE-LIMIT screen: for every event, how many events the
    same user fired in the trailing 10 minutes (event-time RANGE frame,
    inclusive), flagging violations of a >3-per-10-min policy — the
    abuse/bot screen an ingestion edge runs, expressed as one window
    (no self-join, no per-event probe).

    RANGE on unix microseconds keeps equal-timestamp events mutually
    visible (ROWS would order-split them); one user_id shuffle, running
    count state only. At 100 TB this is the same shape as every
    event-time window here: partition by the entity, sort once, frame
    state O(window).
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-600_000_000, Window.currentRow)
    )
    out = ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).cast("long").alias("n_10m"),
    )
    return out.withColumn(
        "rate_limited", (F.col("n_10m") > 3).cast("bigint")
    )


# ----------------------------------- week-over-week change (round 4)


@register(
    "win_percent_change_wow",
    oracle="""
        WITH w AS (
            SELECT event_type, date_trunc('week', ts) AS week,
                   COUNT(*) AS n
            FROM events GROUP BY event_type, week),
        l AS (
            SELECT *, LAG(n) OVER (PARTITION BY event_type
                                   ORDER BY week) AS prev_n
            FROM w)
        SELECT event_type, week, n, prev_n,
               CASE WHEN prev_n IS NULL THEN NULL
                    ELSE CAST(floor((n - prev_n) * 1000000.0 / prev_n)
                              AS BIGINT)
               END AS wow_change_ppm
        FROM l
    """,
)
def win_percent_change_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEEK-OVER-WEEK change per event type (exact ppm, floored toward
    -inf on both engines) — the growth-rate column every weekly
    business review leads with. NULL for each series' first week (no
    prior), never a fake 0%.

    One hash agg to weekly grain (map-side partial over the fact), one
    lag window over the tiny (type, week) table. Change can be
    NEGATIVE, and integer-division conventions differ on negatives
    (DuckDB's // truncates toward zero, floor() rounds toward -inf),
    so BOTH engines floor explicitly — one deterministic convention,
    exact at the ppm grain (counts x 1e6 sit far inside float64's 2^53
    integer range).
    """
    ev = load_table(spark, sf_dir, "events")
    w = ev.groupBy(
        "event_type",
        F.date_trunc("week", "ts").alias("week"),
    ).agg(F.count("*").alias("n"))
    l = w.withColumn(
        "prev_n",
        F.lag("n").over(Window.partitionBy("event_type").orderBy("week")),
    )
    return l.select(
        "event_type",
        "week",
        "n",
        "prev_n",
        F.when(
            F.col("prev_n").isNotNull(),
            F.floor(
                (F.col("n") - F.col("prev_n"))
                * F.lit(1000000).cast("long")
                / F.col("prev_n")
            ).cast("long"),
        ).alias("wow_change_ppm"),
    )


# --------------------------------- activity gaps-and-islands (round 4)


@register(
    "win_active_day_islands",
    oracle="""
        WITH d AS (
            SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE)
                     AS day
            FROM events),
        g AS (
            SELECT user_id, day,
                   day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                                 ORDER BY day) AS INT)
                     AS grp
            FROM d),
        isl AS (
            SELECT user_id, grp, COUNT(*) AS streak_days
            FROM g GROUP BY user_id, grp)
        SELECT user_id,
               CAST(SUM(streak_days) AS BIGINT) AS n_active_days,
               COUNT(*) AS n_islands,
               CAST(MAX(streak_days) AS BIGINT) AS longest_streak_days
        FROM isl GROUP BY user_id
    """,
)
def win_active_day_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GAPS-AND-ISLANDS over user activity days: maximal runs of
    consecutive active days per user — active-day totals, island count,
    and the longest streak (the engagement-streak metric product
    dashboards ship, and the canonical interview-classic SQL pattern
    done at engine scale).

    day − row_number() is constant within a consecutive run, so one
    ranking window + two hash aggs solve it — no self-join, no
    recursion. One user_id shuffle shared by the window and both aggs;
    distinct-day dedup happens map-side first.
    """
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    g = d.withColumn(
        "grp",
        F.date_sub(
            "day",
            F.row_number()
            .over(Window.partitionBy("user_id").orderBy("day"))
        ),
    )
    isl = g.groupBy("user_id", "grp").agg(F.count("*").alias("streak_days"))
    return isl.groupBy("user_id").agg(
        F.sum("streak_days").cast("long").alias("n_active_days"),
        F.count("*").alias("n_islands"),
        F.max("streak_days").cast("long").alias("longest_streak_days"),
    )


# ----------------------------------- recency-decay score (round 4)


@register(
    "win_time_decay_score",
    oracle="""
        WITH mx AS (SELECT MAX(ts) AS now FROM events),
        d AS (
            SELECT e.user_id,
                   CAST(round(e.value * 100, 0) AS BIGINT) AS cents,
                   date_diff('day', CAST(e.ts AS DATE),
                             CAST(mx.now AS DATE)) // 7 AS half_lives
            FROM events e CROSS JOIN mx)
        SELECT user_id,
               COUNT(*) AS n_events,
               CAST(SUM(cents * (1000000 >> CAST(least(half_lives, 20)
                                               AS INT))) AS BIGINT)
                 AS decayed_value_e6,
               CAST(SUM(cents) AS BIGINT) AS raw_value_cents
        FROM d GROUP BY user_id
    """,
)
def win_time_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECENCY-DECAYED engagement score per user: each event's value is
    halved for every 7 days of age relative to the corpus's newest
    event — the recommender/churn feature that makes last week matter
    twice as much as the week before. The decay is an INTEGER shift
    (weight = 1e6 >> half_lives, capped at 20 halvings ≈ zero): a
    step-wise exponential that is bit-exact across engines, where a
    float pow(0.5, age/7.0) would be a rounding lottery.

    One 1-row max-ts broadcast onto the fact scan, one user agg —
    map-side combinable, one shuffle, linear at any scale.
    """
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("now"))
    d = ev.crossJoin(F.broadcast(mx)).selectExpr(
        "user_id",
        "CAST(round(value * 100, 0) AS BIGINT) AS cents",
        "datediff(CAST(now AS DATE), CAST(ts AS DATE)) div 7"
        " AS half_lives",
    )
    return d.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.expr(
            "CAST(SUM(cents * shiftright(1000000,"
            " CAST(least(half_lives, 20) AS INT))) AS BIGINT)"
        ).alias("decayed_value_e6"),
        F.sum("cents").cast("long").alias("raw_value_cents"),
    )
