"""Log-analytics classics the reference's domain implies but never had.

The reference answers "plays per file per day" (REF GetData::date_range,
SURVEY.md §3.2) — the canonical next questions a play-log analyst asks
are cohort retention ("of users first seen on day D, how many came back
k days later?") and funnels ("how many users did view -> click ->
purchase, in order?"). Both are pure DataFrame compositions over the
`events` table, SQL-oracled.

`agg_variance_exact` extends the FP-stabilization strategy
(queries/_helpers.py) from sums/averages to second moments: population
variance from exact integer cents moments (n, Σc, Σc²), so the result
is bit-identical across engines and partitionings — Spark's native
`var_pop` is a streaming double accumulation whose value depends on
partition order, which would fail the driver's value-hash.

100 TB posture: retention/funnel shuffle on user_id only (hash keys are
near-uniform user ids — no skew); variance is a single partial+final
hash aggregate on integer columns, all map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mediaplaycounts_spark.queries._helpers import cents
from mediaplaycounts_spark.registry import register
from mediaplaycounts_spark.tables import load_table, maybe_broadcast

# ------------------------------------------------------ cohort retention


@register(
    "agg_retention_cohorts",
    oracle="""
        WITH daily AS (SELECT user_id, date_trunc('day', ts) AS d FROM events),
             coh AS (SELECT user_id, MIN(d) AS cohort
                     FROM daily GROUP BY user_id)
        SELECT coh.cohort,
               CAST(date_diff('day', coh.cohort, daily.d) AS BIGINT)
                 AS day_offset,
               COUNT(DISTINCT daily.user_id) AS n_users
        FROM daily JOIN coh ON daily.user_id = coh.user_id
        GROUP BY coh.cohort, day_offset
    """,
)
def agg_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-seen day, counted
    per days-since-first-seen. Two shuffles, both on user_id (cohort
    assignment reuses the join's hash partitioning under AQE); the final
    (cohort, offset) grid is tiny regardless of input scale."""
    ev = load_table(spark, sf_dir, "events").select(
        # Midnight timestamps, not DateType: pandas dtype parity with
        # DuckDB's fetchdf on the driver's compare (same rule as
        # agg_daily_playcount).
        "user_id",
        F.date_trunc("DAY", "ts").alias("d"),
    )
    coh = ev.groupBy("user_id").agg(F.min("d").alias("cohort"))
    return (
        ev.join(coh, "user_id")
        .groupBy(
            "cohort",
            F.datediff(F.col("d"), F.col("cohort")).cast("long").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# --------------------------------------------------------------- funnel


@register(
    "agg_funnel_steps",
    oracle="""
        WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
                   WHERE event_type = 'view' GROUP BY user_id),
             c AS (SELECT e.user_id, MIN(e.ts) AS t_click
                   FROM events e JOIN v ON e.user_id = v.user_id
                   WHERE e.event_type = 'click' AND e.ts > v.t_view
                   GROUP BY e.user_id),
             p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
                   FROM events e JOIN c ON e.user_id = c.user_id
                   WHERE e.event_type = 'purchase' AND e.ts > c.t_click
                   GROUP BY e.user_id)
        SELECT (SELECT COUNT(*) FROM v) AS n_view,
               (SELECT COUNT(*) FROM c) AS n_click_after_view,
               (SELECT COUNT(*) FROM p) AS n_purchase_after_click
    """,
)
def agg_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase: a user advances a step
    only with an event strictly after their previous step's first event.
    Each stage filters by type BEFORE joining (the join input is ~1/5 of
    events), joins on user_id, and re-aggregates; the three final counts
    are single-row aggregates crossed together."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_click_after_view")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase_after_click")))
    )


# ------------------------------------------------- exact-moment variance


@register(
    "agg_variance_exact",
    oracle="""
        WITH m AS (SELECT event_type,
                          COUNT(*) AS n,
                          SUM(CAST(round(value * 100, 0) AS BIGINT)) AS s1,
                          SUM(CAST(round(value * 100, 0) AS BIGINT)
                              * CAST(round(value * 100, 0) AS BIGINT)) AS s2
                   FROM events GROUP BY event_type)
        SELECT event_type, n,
               round(CAST(s1 AS DOUBLE) / n / 100.0, 6) AS mean_value,
               round((CAST(s2 AS DOUBLE)
                      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                     / n / 10000.0, 6) AS var_pop,
               round(sqrt((CAST(s2 AS DOUBLE)
                           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                          / n / 10000.0), 6) AS std_pop
        FROM m
    """,
)
def agg_variance_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population variance/stddev of `events.value` per type from exact
    integer moments (n, Σcents, Σcents²): order-independent, map-side
    combinable, bit-identical across engines. Σc² of 490.02-max values
    stays < 2^63 up to ~3.8e12 rows per group; past that, promote s2 to
    DECIMAL(38,0) partial sums."""
    ev = load_table(spark, sf_dir, "events")
    c = cents("value")
    m = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(c).alias("s1"),
        F.sum(c * c).alias("s2"),
    )
    s1d = F.col("s1").cast("double")
    var_raw = (F.col("s2").cast("double") - s1d * s1d / F.col("n")) / F.col("n") / 10000.0
    return m.select(
        "event_type",
        "n",
        F.round(s1d / F.col("n") / 100.0, 6).alias("mean_value"),
        F.round(var_raw, 6).alias("var_pop"),
        F.round(F.sqrt(var_raw), 6).alias("std_pop"),
    )


# ------------------------------------------------- gaps-and-islands streaks


@register(
    "win_streak_runs",
    oracle="""
        WITH daily AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d
                       FROM events),
        g AS (SELECT user_id, d,
                     CAST(date_diff('day', DATE '1970-01-01', CAST(d AS DATE))
                          AS BIGINT)
                     - row_number() OVER (PARTITION BY user_id ORDER BY d)
                       AS grp
              FROM daily),
        runs AS (SELECT user_id, grp, COUNT(*) AS len,
                        MIN(d) AS streak_start
                 FROM g GROUP BY user_id, grp)
        SELECT user_id,
               CAST(MAX(len) AS BIGINT) AS longest_streak,
               CAST(COUNT(*) AS BIGINT) AS n_streaks,
               MIN(streak_start) AS first_day
        FROM runs GROUP BY user_id
    """,
)
def win_streak_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user (gaps-and-
    islands): epoch_day(d) - row_number() is constant within a
    consecutive run, so runs fall out of one groupBy on that integer
    key — no self-joins, no iteration, all date/int arithmetic.

    Plan: distinct (user, day) grid -> one window partitioned by
    user_id -> two hash aggs. Everything shuffles on user_id once; the
    run-key trick keeps streak detection O(n) and order-exact, where a
    lag-based loop would serialize per user.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(
        "user_id", F.date_trunc("DAY", "ts").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    epoch_day = F.datediff(F.col("d").cast("date"), F.to_date(F.lit("1970-01-01")))
    g = daily.withColumn(
        "grp", epoch_day.cast("long") - F.row_number().over(w)
    )
    runs = g.groupBy("user_id", "grp").agg(
        F.count("*").alias("len"), F.min("d").alias("streak_start")
    )
    return runs.groupBy("user_id").agg(
        F.max("len").cast("long").alias("longest_streak"),
        F.count("*").cast("long").alias("n_streaks"),
        F.min("streak_start").alias("first_day"),
    )


# ------------------------------------------------------ value histogram

_HIST_WIDTH_CENTS = 5000  # 50.00-wide buckets over events.value


@register(
    "agg_histogram_value",
    oracle=f"""
        WITH b AS (SELECT event_type,
                          CAST(round(value * 100, 0) AS BIGINT)
                            // {_HIST_WIDTH_CENTS} AS bucket
                   FROM events)
        SELECT event_type, bucket,
               CAST(bucket * {_HIST_WIDTH_CENTS} AS DOUBLE) / 100.0 AS lo,
               CAST((bucket + 1) * {_HIST_WIDTH_CENTS} AS DOUBLE) / 100.0 AS hi,
               COUNT(*) AS n
        FROM b GROUP BY event_type, bucket
    """,
)
def agg_histogram_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event_type: bucket boundaries
    computed in integer cents (floor division), so bucket assignment is
    exact on both engines — `width_bucket` over doubles would put
    boundary values on different sides per-engine rounding.

    One map-side-combinable hash agg; the output is O(types x buckets)
    regardless of input scale — the standard first look at any metric's
    distribution at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.expr(
        f"cast(round(value * 100, 0) as bigint) div {_HIST_WIDTH_CENTS}"
    ).alias("bucket")
    return (
        ev.select("event_type", bucket)
        .groupBy("event_type", "bucket")
        .agg(F.count("*").alias("n"))
        .select(
            "event_type",
            "bucket",
            (F.col("bucket") * _HIST_WIDTH_CENTS / 100.0)
            .cast("double")
            .alias("lo"),
            ((F.col("bucket") + 1) * _HIST_WIDTH_CENTS / 100.0)
            .cast("double")
            .alias("hi"),
            "n",
        )
    )


# --------------------------------------------------- last-touch attribution


@register(
    "agg_attribution_last_touch",
    oracle="""
        WITH ce AS (SELECT event_id, user_id, ts, event_type
                    FROM events
                    WHERE event_type IN ('click', 'purchase')),
        w AS (SELECT event_id, user_id, ts, event_type,
                     last_value(CASE WHEN event_type = 'click' THEN ts END
                                IGNORE NULLS)
                         OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS t_last_click
              FROM ce)
        SELECT event_id AS purchase_id, user_id, ts AS t_purchase,
               t_last_click,
               CAST(t_last_click IS NOT NULL AS BIGINT) AS attributed,
               CASE WHEN t_last_click IS NOT NULL
                    THEN CAST(date_diff('second', t_last_click, ts) AS BIGINT)
               END AS seconds_since_click
        FROM w WHERE event_type = 'purchase'
    """,
)
def agg_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the same
    user's most recent click strictly before it (ties broken by
    event_id, identically on both engines). One running
    `last(ignorenulls)` window does per-event as-of matching WITHOUT a
    self-join — the same union+window trick as `join_asof`, applied
    within one table.

    Plan: filter to the two event types BEFORE the shuffle (~2/5 of
    rows), one user_id-keyed window, then a narrow filter projection.
    At 100 TB the user_id partitioning is near-uniform; no skew, no
    broadcast, one exchange total."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t_last_click = F.last(
        F.when(F.col("event_type") == "click", F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        ev.select(
            "event_id",
            "user_id",
            "ts",
            "event_type",
            t_last_click.alias("t_last_click"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("t_purchase"),
            "t_last_click",
            F.col("t_last_click").isNotNull().cast("bigint").alias("attributed"),
            F.when(
                F.col("t_last_click").isNotNull(),
                (
                    F.unix_timestamp("ts") - F.unix_timestamp("t_last_click")
                ).cast("bigint"),
            ).alias("seconds_since_click"),
        )
    )


# --------------------------------------------- exact-moment correlation


@register(
    "agg_corr_exact",
    oracle="""
        WITH m AS (SELECT l_returnflag,
                          COUNT(*) AS n,
                          SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS sx,
                          SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS sy,
                          SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)
                              * CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS sxy,
                          SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)
                              * CAST(round(l_quantity * 100, 0) AS BIGINT)) AS sxx,
                          SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                              * CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS syy
                   FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, n,
               round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                        * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
                     6) AS corr_qty_price
        FROM m
    """,
)
def agg_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation (quantity vs price per returnflag) from exact
    integer moments — n, Σx, Σy, Σxy, Σx², Σy² in int64 cents — so the
    partial-aggregable shuffle payload is six integers per group and
    the final double formula is evaluated identically on both engines
    (Spark's native `corr` is a streaming double accumulation, partition-
    order-dependent — unhashable). Extends the agg_variance_exact
    moment strategy to covariance. Σ(x·y) of cents pairs stays < 2^63
    through ~10^5-cent values x ~10^9 rows; past that promote to
    DECIMAL(38,0) partials."""
    li = load_table(spark, sf_dir, "lineitem")
    cx = cents("l_quantity")
    cy = cents("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(cx).alias("sx"),
        F.sum(cy).alias("sy"),
        F.sum(cx * cy).alias("sxy"),
        F.sum(cx * cx).alias("sxx"),
        F.sum(cy * cy).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    num = nd * F.col("sxy") - sxd * F.col("sy")
    den = F.sqrt(nd * F.col("sxx") - sxd * F.col("sx")) * F.sqrt(
        nd * F.col("syy") - syd * F.col("sy")
    )
    return m.select(
        "l_returnflag", "n", F.round(num / den, 6).alias("corr_qty_price")
    )


# --------------------------------------------------- Gini concentration


@register(
    "agg_gini_concentration",
    oracle="""
        WITH t AS (SELECT event_type, user_id,
                          SUM(CAST(round(value * 100, 0) AS BIGINT)) AS x
                   FROM events GROUP BY event_type, user_id),
        r AS (SELECT event_type, x,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY x, user_id) AS rn
              FROM t),
        m AS (SELECT event_type, COUNT(*) AS n,
                     SUM(x) AS sx, SUM(rn * x) AS srx
              FROM r GROUP BY event_type)
        SELECT event_type, n,
               round(CAST(2 * srx AS DOUBLE) / (CAST(n AS DOUBLE) * sx)
                     - (CAST(n AS DOUBLE) + 1) / n, 6) AS gini
        FROM m
    """,
)
def agg_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user engagement concentration, per
    event_type — "is spend dominated by whales?" — via the sorted-rank
    identity ``G = 2*Σ(i·x_i)/(n·Σx) − (n+1)/n`` with ranks assigned by
    one deterministic window (total, then user_id tie-break). All
    moments are int64 (Σx, Σ rank·x), one final double formula, so the
    statistic value-hashes across engines.

    Plan: one (type, user) hash agg, one type-keyed window over the
    user-totals grid (O(users) rows, not O(events)), one tiny moment
    agg. The reference's Zipfian "popular files" skew (SURVEY.md §4.2)
    is exactly what this measures."""
    ev = load_table(spark, sf_dir, "events")
    t = ev.groupBy("event_type", "user_id").agg(F.sum(cents("value")).alias("x"))
    w = Window.partitionBy("event_type").orderBy("x", "user_id")
    r = t.withColumn("rn", F.row_number().over(w))
    m = r.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("rn") * F.col("x")).alias("srx"),
    )
    nd = F.col("n").cast("double")
    return m.select(
        "event_type",
        "n",
        F.round(
            (2 * F.col("srx")).cast("double") / (nd * F.col("sx"))
            - (nd + 1) / F.col("n"),
            6,
        ).alias("gini"),
    )


@register(
    "reshape_scd2_history",
    oracle="""
        WITH e AS (
            SELECT user_id, ts, event_id, event_type,
                   LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_type
            FROM events),
        ch AS (
            SELECT user_id, ts, event_id, event_type FROM e
            WHERE prev_type IS NULL OR event_type <> prev_type)
        SELECT user_id, event_type, ts AS valid_from,
               LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS valid_to,
               CAST(CASE WHEN LEAD(ts) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) IS NULL
                         THEN 1 ELSE 0 END AS BIGINT) AS is_current
        FROM ch
    """,
)
def reshape_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) history build: collapse each
    user's event-type stream into change segments with
    [valid_from, valid_to) validity and an is_current flag — the
    dimension-versioning op every warehouse load runs, derived here
    from the raw event log in two windows (change detection via LAG,
    interval close via LEAD; ties broken by event_id for a total
    order).

    One shuffle keyed by user_id serves both windows (same partition
    key and ordering — Catalyst reuses the sort). At 100 TB the
    segment table is |changes|, typically orders of magnitude smaller
    than the event log."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    ch = e.filter(
        F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lead_ts = F.lead("ts").over(w2)
    return ch.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        lead_ts.alias("valid_to"),
        lead_ts.isNull().cast("long").alias("is_current"),
    )


@register(
    "agg_session_bounce_rate",
    oracle="""
        WITH l AS (
            SELECT user_id, ts, event_id,
                   LAG(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS pts
            FROM events),
        f AS (SELECT user_id, ts, event_id,
                     CASE WHEN pts IS NULL
                               OR ts - pts >= INTERVAL '30 minutes'
                          THEN 1 ELSE 0 END AS brk
              FROM l),
        s AS (SELECT user_id, ts,
                     SUM(brk) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM f),
        sess AS (SELECT user_id, sid,
                        CAST(date_trunc('day', MIN(ts)) AS DATE) AS day,
                        COUNT(*) AS n_events
                 FROM s GROUP BY user_id, sid)
        SELECT day,
               COUNT(*) AS n_sessions,
               CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_bounces,
               CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000
                    // COUNT(*) AS BIGINT) AS bounce_ppm
        FROM sess GROUP BY day
    """,
)
def agg_session_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: share of 30-minute-gap sessions containing a
    single event, grouped by session-start day — the engagement metric
    built on the same lag+cumsum sessionization as
    stream_session_window's oracle, in exact integer ppm.

    One user_id-keyed shuffle powers both windows and the session
    rollup; the daily grid is tiny regardless of event volume."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = (
        F.col("pts").isNull()
        | (F.col("ts") - F.col("pts") >= F.expr("interval 30 minutes"))
    ).cast("int")
    s = (
        ev.select("user_id", "ts", "event_id", F.lag("ts").over(w).alias("pts"))
        .withColumn("brk", brk)
        .withColumn(
            "sid",
            F.sum("brk").over(
                Window.partitionBy("user_id")
                .orderBy("ts", "event_id")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    sess = s.groupBy("user_id", "sid").agg(
        F.date_trunc("DAY", F.min("ts")).cast("date").alias("day"),
        F.count("*").alias("n_events"),
    )
    return sess.groupBy("day").agg(
        F.count("*").alias("n_sessions"),
        F.sum((F.col("n_events") == 1).cast("int")).cast("long").alias("n_bounces"),
        F.expr(
            "cast(sum(cast(n_events = 1 as int)) * 1000000 div count(*) as bigint)"
        ).alias("bounce_ppm"),
    )


@register(
    "join_temporal_scd2_asof",
    oracle="""
        WITH e AS (
            SELECT user_id, ts, event_id, event_type,
                   LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS pt
            FROM events),
        m AS (SELECT user_id, ts, event_id, event_type,
                     CASE WHEN pt IS NULL OR event_type <> pt
                          THEN ts END AS chg
              FROM e),
        r AS (SELECT user_id, ts, event_id, event_type,
                     MAX(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS run_start
              FROM m)
        SELECT event_id, user_id, event_type, run_start FROM r
    """,
)
def join_temporal_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) lookup against an SCD2 dimension: each
    event joins the type-history segment valid at its timestamp
    (user equi-key + [valid_from, valid_to) band, NULL-open current
    row) — the warehouse pattern for 'what was this entity's attribute
    WHEN the fact happened'. Cross-validated formulation: the oracle
    derives the same answer windows-only (cumulative MAX of change
    points), so the join's interval semantics are value-checked against
    an independent derivation, not a replay of itself.

    Scale: the history table is |changes| (orders of magnitude smaller
    than facts); the join is an equi-join on user_id with a residual
    band filter — hash join, never BNLJ. (user_id, ts) is unique in
    this data, so the band's half-open edges are unambiguous."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = ev.select(
        "user_id", "ts", "event_id", "event_type",
        F.lag("event_type").over(w).alias("pt"),
    )
    ch = e.filter(F.col("pt").isNull() | (F.col("event_type") != F.col("pt")))
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hist = ch.select(
        F.col("user_id").alias("h_user"),
        F.col("event_type").alias("run_type"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
    )
    joined = ev.join(
        hist,
        (ev.user_id == hist.h_user)
        & (ev.ts >= hist.valid_from)
        & (hist.valid_to.isNull() | (ev.ts < hist.valid_to)),
    )
    return joined.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("valid_from").alias("run_start"),
    )


@register(
    "win_session_paths",
    oracle="""
        WITH l AS (
            SELECT user_id, ts, event_id, event_type,
                   LAG(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS pts
            FROM events),
        f AS (SELECT user_id, ts, event_id, event_type,
                     CASE WHEN pts IS NULL
                               OR ts - pts >= INTERVAL '30 minutes'
                          THEN 1 ELSE 0 END AS brk
              FROM l),
        s AS (SELECT user_id, ts, event_id, event_type,
                     SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM f)
        SELECT user_id, MIN(ts) AS session_start,
               COUNT(*) AS n_events,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM s GROUP BY user_id, sid
    """,
)
def win_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session event-type PATH strings ('view>click>purchase') over
    30-minute-gap sessions — the input to funnel/path-mining analyses.
    Order inside the path is pinned by (ts, event_id), so the string
    aggregation is deterministic on both engines (Spark: sort the
    collected (ts, event_id, type) structs, then join; DuckDB: ordered
    string_agg).

    Same single user_id-keyed shuffle as the other sessionized keys;
    path assembly happens per session group, output is |sessions|."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = (
        F.col("pts").isNull()
        | (F.col("ts") - F.col("pts") >= F.expr("interval 30 minutes"))
    ).cast("int")
    s = (
        ev.select("user_id", "ts", "event_id", "event_type",
                  F.lag("ts").over(w).alias("pts"))
        .withColumn("brk", brk)
        .withColumn(
            "sid",
            F.sum("brk").over(
                Window.partitionBy("user_id")
                .orderBy("ts", "event_id")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    path = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            lambda x: x["event_type"],
        ),
        ">",
    )
    return s.groupBy("user_id", "sid").agg(
        F.min("ts").alias("session_start"),
        F.count("*").alias("n_events"),
        path.alias("path"),
    ).drop("sid")


@register(
    "agg_markov_transitions",
    oracle="""
        WITH o AS (
            SELECT user_id, event_type, ts, event_id,
                   LEAD(event_type, 1) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                     AS next_type
            FROM events),
        t AS (SELECT event_type AS from_type, next_type AS to_type,
                     COUNT(*) AS n
              FROM o WHERE next_type IS NOT NULL
              GROUP BY from_type, to_type),
        tot AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS row_total
                FROM t GROUP BY from_type)
        SELECT t.from_type, t.to_type, CAST(t.n AS BIGINT) AS n,
               CAST(t.n * 1000000 // tot.row_total AS BIGINT) AS p_ppm
        FROM t JOIN tot ON t.from_type = tot.from_type
    """,
)
def agg_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order MARKOV transition matrix over per-user event
    sequences: counts and row-normalized probabilities (ppm, floor
    division — integer-exact) for every (from → to) event-type pair —
    the behavioral model behind next-action prediction, anomaly scoring
    (improbable transitions), and funnel leak analysis. Total
    (ts, event_id) order makes duplicate timestamps deterministic.

    One (user, time) window for the LEAD, one pair agg, a tiny
    row-total broadcast — the matrix is |types|² rows regardless of
    corpus size."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "event_type", F.lead("event_type", 1).over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    t = o.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count("*").alias("n"))
    tot = t.groupBy("from_type").agg(F.sum("n").cast("long").alias("row_total"))
    return t.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        F.col("n").cast("long").alias("n"),
        F.expr("cast(n * 1000000 div row_total as bigint)").alias("p_ppm"),
    )


@register(
    "agg_basket_lift_pairs",
    oracle="""
        WITH items AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
            FROM lineitem),
        nn AS (SELECT COUNT(DISTINCT ok) AS n FROM items),
        pc AS (SELECT pk, COUNT(*) AS np FROM items GROUP BY pk),
        pairs AS (
            SELECT a.pk AS part_a, b.pk AS part_b, COUNT(*) AS n_ab
            FROM items a JOIN items b
              ON a.ok = b.ok AND a.pk < b.pk
            GROUP BY a.pk, b.pk
            HAVING COUNT(*) >= 2)
        SELECT p.part_a, p.part_b, p.n_ab,
               CAST(p.n_ab * 1000000 // ca.np AS BIGINT) AS confidence_ppm,
               CAST(CAST(p.n_ab AS HUGEINT) * nn.n * 1000000
                    // (CAST(ca.np AS HUGEINT) * cb.np) AS BIGINT)
                 AS lift_ppm
        FROM pairs p
        JOIN pc ca ON p.part_a = ca.pk
        JOIN pc cb ON p.part_b = cb.pk
        CROSS JOIN nn
    """,
)
def agg_basket_lift_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MARKET-BASKET association pairs: for part pairs co-bought in >= 2
    orders, exact support / confidence / lift in integer ppm — the
    frequent-itemset primitive (Apriori's k=2 layer) behind
    recommenders and co-occurrence mining.

    Scale shape: pair generation is a self-join ON THE ORDER KEY only
    (fanout bounded by items-per-order squared, never |parts|^2 — the
    same block-then-count discipline as the dedup family); per-part
    counts join back BROADCAST (the part dimension is small relative to
    facts), and the single corpus total crosses in as a 1-row
    broadcast. Lift's fraction is cleared to one floored integer
    division, so values hash-match DuckDB exactly.
    """
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    nn = items.agg(F.countDistinct("ok").alias("n"))
    pc = items.groupBy("pk").agg(F.count("*").alias("np"))
    a = items.select(F.col("ok"), F.col("pk").alias("part_a"))
    b = items.select(F.col("ok"), F.col("pk").alias("part_b"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )
    ca = pc.select(F.col("pk").alias("part_a"), F.col("np").alias("na"))
    cb = pc.select(F.col("pk").alias("part_b"), F.col("np").alias("nb"))
    return (
        pairs.join(F.broadcast(ca), "part_a")
        .join(F.broadcast(cb), "part_b")
        .join(F.broadcast(nn))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            F.expr("CAST(n_ab * 1000000 div na AS BIGINT)").alias(
                "confidence_ppm"
            ),
            # lift's cross-moment product exceeds int64 on large
            # corpora with hot parts (ADVICE r3): clear the fraction in
            # DECIMAL(38,0)/HUGEINT like agg_target_encoding, one
            # floored division at the end
            F.expr(
                "CAST(CAST(n_ab AS DECIMAL(38,0)) * n * 1000000"
                " div (CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )


@register(
    "agg_rfm_scores",
    oracle="""
        WITH m AS (
            SELECT o_custkey AS c_custkey,
                   MAX(o_orderdate) AS last_order,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                        AS BIGINT) AS monetary_cents
            FROM orders GROUP BY o_custkey),
        r AS (SELECT *, date_diff('day', last_order,
                                  (SELECT MAX(o_orderdate) FROM orders))
                          AS r_days
              FROM m),
        s AS (SELECT c_custkey, r_days, n_orders, monetary_cents,
                     6 - ntile(5) OVER (ORDER BY r_days, c_custkey)
                       AS r_score,
                     6 - ntile(5) OVER (ORDER BY n_orders DESC, c_custkey)
                       AS f_score,
                     6 - ntile(5) OVER (ORDER BY monetary_cents DESC,
                                        c_custkey) AS m_score
              FROM r)
        SELECT c_custkey, CAST(r_days AS BIGINT) AS r_days, n_orders,
               monetary_cents,
               CAST(r_score AS BIGINT) AS r_score,
               CAST(f_score AS BIGINT) AS f_score,
               CAST(m_score AS BIGINT) AS m_score,
               CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
                 || CAST(m_score AS VARCHAR) AS segment
        FROM s
    """,
)
def agg_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM SEGMENTATION: per-customer recency / frequency / monetary
    metrics quintile-scored 5-to-1 (5 = best) with fully deterministic
    tie-breaking (metric, then custkey) — the classic CRM scoring table,
    exact end to end (day integers, cents, ntile bucket arithmetic
    identical across engines).

    One (custkey) hash agg over orders builds the metric table; the
    corpus max date is a window max over that AGGREGATED table; the
    three ntiles are global windows over |customers| rows — fine here
    because the scoring table is orders-of-magnitude smaller than the
    fact table, and the documented scale path for a truly huge customer
    base is percent_rank over a range-partitioned sort (same scores,
    no single-partition window).
    """
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "monetary_cents"
        ),
    )
    wall = Window.partitionBy()
    r = m.withColumn(
        "r_days",
        F.datediff(F.max("last_order").over(wall), F.col("last_order")).cast(
            "long"
        ),
    )
    nt = lambda *cols: (6 - F.ntile(5).over(Window.orderBy(*cols))).cast("long")
    s = r.select(
        "c_custkey",
        "r_days",
        "n_orders",
        "monetary_cents",
        nt(F.col("r_days"), F.col("c_custkey")).alias("r_score"),
        nt(F.col("n_orders").desc(), F.col("c_custkey")).alias("f_score"),
        nt(F.col("monetary_cents").desc(), F.col("c_custkey")).alias(
            "m_score"
        ),
    )
    return s.withColumn(
        "segment",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


@register(
    "agg_new_vs_returning",
    oracle="""
        WITH act AS (
            SELECT DISTINCT user_id, date_trunc('day', ts) AS day
            FROM events),
        first_seen AS (
            SELECT user_id, MIN(day) AS d0 FROM act GROUP BY user_id)
        SELECT a.day,
               COUNT(*) FILTER (a.day = f.d0) AS n_new,
               COUNT(*) FILTER (a.day > f.d0) AS n_returning
        FROM act a JOIN first_seen f ON a.user_id = f.user_id
        GROUP BY a.day
    """,
)
def agg_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEW vs RETURNING daily actives: each (user, day) activity row is
    classified by whether it is the user's first active day — the
    growth-accounting split (acquisition vs retention) on every product
    dashboard.

    Two hash aggs on near-uniform keys: distinct (user, day) activity,
    then per-user first day; the flag join is keyed on user_id (both
    sides already user-partitioned from the aggs, so the exchange is
    reused), and one (day) agg with FILTER-clause conditional counts
    emits the split — no pivot, no second scan of raw events. A
    user's first day is a one-row-per-user table at any scale.
    """
    ev = load_table(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.date_trunc("DAY", "ts").alias("day")
    ).distinct()
    first = act.groupBy("user_id").agg(F.min("day").alias("d0"))
    j = act.join(first, "user_id")
    return j.groupBy("day").agg(
        F.count(F.when(F.col("day") == F.col("d0"), 1)).alias("n_new"),
        F.count(F.when(F.col("day") > F.col("d0"), 1)).alias(
            "n_returning"
        ),
    )


@register(
    "win_rank_movers",
    oracle="""
        WITH b AS (SELECT MIN(o_orderdate) AS d0, MAX(o_orderdate) AS d1
                   FROM orders),
        fact AS (
            SELECT p.p_brand AS brand,
                   CASE WHEN o.o_orderdate <= b.d0 + (b.d1 - b.d0) / 2
                        THEN 1 ELSE 2 END AS period,
                   CAST(round(l.l_extendedprice * 100, 0) AS BIGINT) AS cents
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN part p ON l.l_partkey = p.p_partkey
            CROSS JOIN b),
        rev AS (SELECT brand, period,
                       CAST(SUM(cents) AS BIGINT) AS revenue_cents
                FROM fact GROUP BY brand, period),
        rk AS (SELECT brand, period, revenue_cents,
                      ROW_NUMBER() OVER (PARTITION BY period
                                         ORDER BY revenue_cents DESC, brand)
                        AS rnk
               FROM rev)
        SELECT a.brand, CAST(a.rnk AS BIGINT) AS rank_p1,
               CAST(c.rnk AS BIGINT) AS rank_p2,
               CAST(a.rnk - c.rnk AS BIGINT) AS rank_gain
        FROM rk a JOIN rk c
          ON a.brand = c.brand AND a.period = 1 AND c.period = 2
    """,
)
def win_rank_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK MOVERS report: brand revenue rank in the first half of the
    order-date range vs the second half, with the rank gain — the
    period-over-period movers/shakers table every BI deck has. The
    period split point is computed FROM the data (min + half the span,
    exact date arithmetic) so the key is scale-factor-robust.

    One fact pass (orders+part broadcast-joined, 1-row date-bounds
    broadcast), one (brand, period) agg, per-period ranks as windows
    over the tiny brand table, self-joined on brand. Deterministic
    tie-break (revenue desc, brand asc).
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    b = o.agg(
        F.min("o_orderdate").alias("d0"), F.max("o_orderdate").alias("d1")
    )
    fact = (
        li.join(maybe_broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(b))
        .select(
            F.col("p_brand").alias("brand"),
            F.when(
                F.col("o_orderdate")
                <= F.expr("d0 + (d1 - d0) / 2"),
                F.lit(1),
            )
            .otherwise(F.lit(2))
            .alias("period"),
            F.round(F.col("l_extendedprice") * 100, 0)
            .cast("long")
            .alias("cents"),
        )
    )
    rev = fact.groupBy("brand", "period").agg(
        F.sum("cents").alias("revenue_cents")
    )
    w = Window.partitionBy("period").orderBy(
        F.desc("revenue_cents"), F.col("brand")
    )
    rk = rev.withColumn("rnk", F.row_number().over(w))
    a = rk.filter(F.col("period") == 1).select(
        "brand", F.col("rnk").cast("long").alias("rank_p1")
    )
    c = rk.filter(F.col("period") == 2).select(
        "brand", F.col("rnk").cast("long").alias("rank_p2")
    )
    return a.join(c, "brand").select(
        "brand",
        "rank_p1",
        "rank_p2",
        (F.col("rank_p1") - F.col("rank_p2")).alias("rank_gain"),
    )


@register(
    "agg_dau_mau_stickiness",
    oracle="""
        WITH act AS (
            SELECT DISTINCT user_id,
                   date_trunc('month', ts) AS month,
                   date_trunc('day', ts) AS day
            FROM events),
        daily AS (SELECT month, day, COUNT(*) AS dau
                  FROM act GROUP BY month, day),
        monthly AS (SELECT month, COUNT(DISTINCT user_id) AS mau
                    FROM act GROUP BY month)
        SELECT d.month,
               CAST(SUM(d.dau) AS BIGINT) AS dau_day_sum,
               COUNT(*) AS n_days,
               CAST(m.mau AS BIGINT) AS mau,
               CAST(SUM(d.dau) * 1000000 // (COUNT(*) * m.mau) AS BIGINT)
                 AS stickiness_ppm
        FROM daily d JOIN monthly m ON d.month = m.month
        GROUP BY d.month, m.mau
    """,
)
def agg_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU STICKINESS per month: average daily actives over monthly
    actives in exact ppm — the engagement ratio product teams steer by.
    Computed fraction-free: (sum of daily distinct counts) * 1e6 div
    (days x monthly distinct), never an average of floats.

    One distinct (user, month, day) pass feeds both the daily and
    monthly rollups (same exchange key prefix); the final join is on
    the O(months) table. Scale: distinct activity is the only big agg,
    keyed near-uniform."""
    ev = load_table(spark, sf_dir, "events")
    act = ev.select(
        "user_id",
        F.date_trunc("MONTH", "ts").alias("month"),
        F.date_trunc("DAY", "ts").alias("day"),
    ).distinct()
    daily = act.groupBy("month", "day").agg(F.count("*").alias("dau"))
    monthly = act.groupBy("month").agg(
        F.countDistinct("user_id").alias("mau")
    )
    return (
        daily.join(F.broadcast(monthly), "month")
        .groupBy("month", "mau")
        .agg(
            F.sum("dau").cast("long").alias("dau_day_sum"),
            F.count("*").alias("n_days"),
        )
        .select(
            "month",
            "dau_day_sum",
            "n_days",
            F.col("mau").cast("long").alias("mau"),
            F.expr(
                "CAST(dau_day_sum * 1000000 div (n_days * mau) AS BIGINT)"
            ).alias("stickiness_ppm"),
        )
    )


@register(
    "agg_target_encoding",
    oracle="""
        WITH g AS (
            SELECT CAST(SUM(CAST(round(value * 100, 0) AS BIGINT))
                        AS HUGEINT) AS gsum,
                   CAST(COUNT(*) AS HUGEINT) AS gn
            FROM events),
        c AS (
            SELECT event_type,
                   CAST(SUM(CAST(round(value * 100, 0) AS BIGINT))
                        AS HUGEINT) AS csum,
                   CAST(COUNT(*) AS HUGEINT) AS cn
            FROM events GROUP BY event_type)
        SELECT c.event_type, CAST(c.cn AS BIGINT) AS n,
               CAST((c.csum * g.gn + 10 * g.gsum) * 1000000
                    // (g.gn * (c.cn + 10)) AS BIGINT)
                 AS encoded_cents_ppm
        FROM c CROSS JOIN g
    """,
)
def agg_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SMOOTHED TARGET ENCODING (the ML featurization for categorical
    columns): each category's mean target value shrunk toward the
    global mean with pseudo-count m=10 —
    ``(sum_c + m*mean_g) / (n_c + m)`` — held as ONE exact integer
    fraction ``(sum_c*n_g + m*sum_g) * 1e6 div (n_g*(n_c + m))`` in
    DECIMAL(38,0)/HUGEINT (the cross-moment products pass int64 around
    1e20), so the encoding is bit-identical across engines and immune
    to category-size skew.

    Two aggs over one scan shape (category + global), 1-row global
    moment broadcast onto the tiny category table. Rare categories
    shrink to the prior, hot ones keep their mean — the Micci-Barreca
    encoding, exact.
    """
    ev = load_table(spark, sf_dir, "events")
    cents_v = F.round(F.col("value") * 100, 0).cast("long")
    g = ev.agg(
        F.sum(cents_v).alias("gsum"), F.count("*").alias("gn")
    )
    c = ev.groupBy("event_type").agg(
        F.sum(cents_v).alias("csum"), F.count("*").alias("cn")
    )
    d38 = "CAST({} AS DECIMAL(38,0))"
    return c.join(F.broadcast(g)).selectExpr(
        "event_type",
        "CAST(cn AS BIGINT) AS n",
        f"CAST(({d38.format('csum')} * {d38.format('gn')}"
        f" + 10 * {d38.format('gsum')}) * 1000000"
        f" div ({d38.format('gn')} * ({d38.format('cn')} + 10))"
        " AS BIGINT) AS encoded_cents_ppm",
    )


@register(
    "agg_price_volume_mix",
    oracle="""
        WITH b AS (SELECT MIN(o_orderdate) AS d0, MAX(o_orderdate) AS d1
                   FROM orders),
        fact AS (
            SELECT p.p_brand AS brand,
                   CASE WHEN o.o_orderdate <= b.d0 + (b.d1 - b.d0) / 2
                        THEN 1 ELSE 2 END AS period,
                   CAST(round(l.l_extendedprice * 100, 0) AS BIGINT) AS cents,
                   CAST(round(l.l_quantity, 0) AS BIGINT) AS qty
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN part p ON l.l_partkey = p.p_partkey
            CROSS JOIN b),
        per AS (SELECT brand, period,
                       CAST(SUM(cents) AS HUGEINT) AS r,
                       CAST(SUM(qty) AS HUGEINT) AS q
                FROM fact GROUP BY brand, period),
        w AS (SELECT a.brand, a.r AS r0, a.q AS q0, c.r AS r1, c.q AS q1
              FROM per a JOIN per c
                ON a.brand = c.brand AND a.period = 1 AND c.period = 2)
        SELECT brand,
               CAST(r1 - r0 AS BIGINT) AS delta_cents,
               CAST((r1 * q0 - r0 * q1) * 1000 // q0 AS BIGINT)
                 AS price_effect_e3,
               CAST(r0 * (q1 - q0) * 1000 // q0 AS BIGINT)
                 AS volume_effect_e3
        FROM w
    """,
)
def agg_price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRICE-VOLUME-MIX decomposition: split each brand's revenue change
    between the two halves of the order-date range into a price effect
    ``(p1 - p0) * q1`` and a volume effect ``p0 * (q1 - q0)`` — the
    FP&A bridge chart, with both effects held as exact HUGEINT /
    DECIMAL(38,0) fractions over integer revenue and quantity sums
    (unit price never materializes as a float; the two effects sum to
    the exact revenue delta before the final e-3 floor, which the unit
    test asserts).

    Same fact shape as `win_rank_movers` (broadcast dims + 1-row date
    bounds), one (brand, period) agg, then pure arithmetic on the tiny
    brand table.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice", "l_quantity"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    b = o.agg(
        F.min("o_orderdate").alias("d0"), F.max("o_orderdate").alias("d1")
    )
    fact = (
        li.join(maybe_broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(b))
        .select(
            F.col("p_brand").alias("brand"),
            F.when(
                F.col("o_orderdate") <= F.expr("d0 + (d1 - d0) / 2"),
                F.lit(1),
            )
            .otherwise(F.lit(2))
            .alias("period"),
            F.round(F.col("l_extendedprice") * 100, 0)
            .cast("long")
            .alias("cents"),
            F.round(F.col("l_quantity"), 0).cast("long").alias("qty"),
        )
    )
    per = fact.groupBy("brand", "period").agg(
        F.sum("cents").alias("r"), F.sum("qty").alias("q")
    )
    a = per.filter(F.col("period") == 1).select(
        "brand", F.col("r").alias("r0"), F.col("q").alias("q0")
    )
    c = per.filter(F.col("period") == 2).select(
        "brand", F.col("r").alias("r1"), F.col("q").alias("q1")
    )
    d38 = "CAST({} AS DECIMAL(38,0))"
    return a.join(c, "brand").selectExpr(
        "brand",
        "CAST(r1 - r0 AS BIGINT) AS delta_cents",
        f"CAST(({d38.format('r1')} * {d38.format('q0')}"
        f" - {d38.format('r0')} * {d38.format('q1')}) * 1000"
        f" div {d38.format('q0')} AS BIGINT) AS price_effect_e3",
        f"CAST({d38.format('r0')} * ({d38.format('q1')}"
        f" - {d38.format('q0')}) * 1000"
        f" div {d38.format('q0')} AS BIGINT) AS volume_effect_e3",
    )


@register(
    "ts_cumulative_uniques",
    oracle="""
        WITH f AS (
            SELECT user_id, MIN(date_trunc('day', ts)) AS d0
            FROM events GROUP BY user_id),
        per_day AS (SELECT d0 AS day, COUNT(*) AS n_new FROM f GROUP BY d0)
        SELECT day, CAST(n_new AS BIGINT) AS n_new,
               CAST(SUM(n_new) OVER (ORDER BY day
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS users_to_date
        FROM per_day
    """,
)
def ts_cumulative_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUMULATIVE UNIQUE USERS curve: distinct users seen up to each
    day — the growth chart that naive COUNT(DISTINCT) over an expanding
    window cannot compute scalably. The trick: cumulative distinct ==
    running sum of FIRST-SEEN counts, so one per-user MIN(day) agg plus
    a running sum over the tiny day spine replaces an O(days x users)
    expanding-distinct (the user-domain sibling of
    `text_novelty_curve`'s token novelty).

    Two hash aggs (user -> first day, day -> new-user count) and one
    window over O(days) rows. Exact integers throughout.
    """
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("DAY", "ts")).alias("d0")
    )
    per_day = f.groupBy(F.col("d0").alias("day")).agg(
        F.count("*").alias("n_new")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_day.select(
        "day",
        F.col("n_new").cast("long").alias("n_new"),
        F.sum("n_new").over(w).cast("long").alias("users_to_date"),
    )


@register(
    "agg_pareto_share",
    oracle="""
        WITH ua AS (
            SELECT user_id, COUNT(*) AS n_ev,
                   CAST(SUM(CAST(round(value * 100, 0) AS BIGINT))
                        AS BIGINT) AS cents
            FROM events GROUP BY user_id),
        rk AS (SELECT *, ntile(10) OVER (ORDER BY n_ev DESC, user_id)
                          AS decile
               FROM ua),
        tot AS (SELECT CAST(SUM(n_ev) AS HUGEINT) AS te,
                       CAST(SUM(cents) AS HUGEINT) AS tc
                FROM ua)
        SELECT rk.decile, COUNT(*) AS n_users,
               CAST(SUM(rk.n_ev) AS BIGINT) AS n_events,
               CAST(CAST(SUM(rk.n_ev) AS HUGEINT) * 1000000 // tot.te
                    AS BIGINT) AS event_share_ppm,
               CAST(CAST(SUM(rk.cents) AS HUGEINT) * 1000000 // tot.tc
                    AS BIGINT) AS value_share_ppm
        FROM rk CROSS JOIN tot
        GROUP BY rk.decile, tot.te, tot.tc
    """,
)
def agg_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARETO / CONCENTRATION report: activity deciles of the user base
    (most-active first, deterministic tie-break) with each decile's
    exact share of events and value in ppm — the 80/20 chart that pairs
    with `agg_gini_concentration`'s single coefficient.

    One user agg, one decile ntile over the (much smaller) user table,
    1-row totals broadcast, shares as floored integer divisions.
    """
    ev = load_table(spark, sf_dir, "events")
    ua = ev.groupBy("user_id").agg(
        F.count("*").alias("n_ev"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"),
    )
    rk = ua.withColumn(
        "decile",
        F.ntile(10).over(Window.orderBy(F.desc("n_ev"), F.col("user_id"))),
    )
    tot = ua.agg(
        F.sum("n_ev").alias("te"), F.sum("cents").alias("tc")
    )
    return (
        rk.join(F.broadcast(tot))
        .groupBy("decile", "te", "tc")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("n_ev").alias("n_events"),
            F.sum("cents").alias("sc"),
        )
        .selectExpr(
            "CAST(decile AS BIGINT) AS decile",
            "n_users",
            "CAST(n_events AS BIGINT) AS n_events",
            # mirror the oracle's HUGEINT widening (ADVICE r3): the
            # numerators pass int64 around 9e12 total events / cents
            "CAST(CAST(n_events AS DECIMAL(38,0)) * 1000000 div te"
            " AS BIGINT) AS event_share_ppm",
            "CAST(CAST(sc AS DECIMAL(38,0)) * 1000000 div tc"
            " AS BIGINT) AS value_share_ppm",
        )
    )


@register(
    "agg_geo_cell_density",
    oracle="""
        WITH pts AS (
            SELECT c_custkey AS id,
                   ((c_custkey * 48271) % 180000000 - 90000000) // 10000000
                     AS cx,
                   ((c_custkey * 69621) % 360000000 - 180000000) // 10000000
                     AS cy
            FROM customer),
        cells AS (SELECT cx, cy, COUNT(*) AS n_points FROM pts
                  GROUP BY cx, cy)
        SELECT cx, cy, n_points,
               CAST(ROW_NUMBER() OVER (ORDER BY n_points DESC, cx, cy)
                    AS BIGINT) AS density_rank
        FROM cells
        ORDER BY density_rank LIMIT 25
    """,
)
def agg_geo_cell_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPATIAL DENSITY heatmap: the 25 densest 10-degree grid cells
    with deterministic rank — the aggregation face of the spatial
    family (`join_geo_grid` finds neighbor pairs; this finds hotspots).
    Same deterministic micro-degree coordinates; cell assignment is one
    integer division (floor semantics match: operands span negatives,
    and both engines' `div`/`//` truncate toward zero — the cells are
    DEFINED by that shared truncation, so the partition of space is
    identical on both sides even across the sign boundary).

    One hash agg on (cx, cy) + a top-k over the tiny cell table.
    """
    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select(
        F.expr(
            "((c_custkey * 48271) % 180000000 - 90000000) div 10000000"
        ).alias("cx"),
        F.expr(
            "((c_custkey * 69621) % 360000000 - 180000000) div 10000000"
        ).alias("cy"),
    )
    cells = pts.groupBy("cx", "cy").agg(F.count("*").alias("n_points"))
    w = Window.orderBy(F.desc("n_points"), F.col("cx"), F.col("cy"))
    return (
        cells.withColumn("density_rank", F.row_number().over(w).cast("long"))
        .orderBy("density_rank")
        .limit(25)
    )


@register(
    "agg_diff_in_diff",
    oracle="""
        WITH b AS (SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2
                          AS mid_us
                   FROM events),
        f AS (
            SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                     AS treated,
                   CASE WHEN epoch_us(e.ts) <= b.mid_us
                        THEN 0 ELSE 1 END AS post,
                   CAST(round(value * 100, 0) AS BIGINT) AS cents
            FROM events e CROSS JOIN b),
        g AS (SELECT treated, post,
                     CAST(SUM(cents) AS HUGEINT) AS s,
                     CAST(COUNT(*) AS HUGEINT) AS n
              FROM f GROUP BY treated, post),
        w AS (SELECT
                MAX(CASE WHEN treated = 1 AND post = 1 THEN s END) AS s11,
                MAX(CASE WHEN treated = 1 AND post = 1 THEN n END) AS n11,
                MAX(CASE WHEN treated = 1 AND post = 0 THEN s END) AS s10,
                MAX(CASE WHEN treated = 1 AND post = 0 THEN n END) AS n10,
                MAX(CASE WHEN treated = 0 AND post = 1 THEN s END) AS s01,
                MAX(CASE WHEN treated = 0 AND post = 1 THEN n END) AS n01,
                MAX(CASE WHEN treated = 0 AND post = 0 THEN s END) AS s00,
                MAX(CASE WHEN treated = 0 AND post = 0 THEN n END) AS n00
              FROM g)
        SELECT CAST(n11 AS BIGINT) AS n_treated_post,
               CAST(((s11 * n10 - s10 * n11) * n01 * n00
                     - (s01 * n00 - s00 * n01) * n11 * n10) * 100
                    // (n11 * n10 * n01 * n00) AS BIGINT)
                 AS did_centicents
        FROM w
    """,
)
def agg_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENCE-IN-DIFFERENCES readout: the change in mean event
    value for the treated group (purchases) minus the change for the
    control group (everything else), pre vs post the midpoint of the
    time range — the quasi-experimental estimator behind every
    launch-impact analysis. The four group means never materialize as
    floats: the estimator is assembled over a common denominator in
    HUGEINT/DECIMAL(38,0) and floored once to centi-cents.

    One scan -> a 4-cell (treated, post) aggregate -> pure arithmetic
    on one row. The 1-row time-bounds aggregate broadcasts onto the
    scan (same pattern as the movers/PVM keys).
    """
    ev = load_table(spark, sf_dir, "events")
    # Split point in pure integer epoch-micros — interval/2 halving has
    # engine-specific component rounding on dense timestamps.
    b = ev.agg(
        (
            (
                F.unix_micros(F.min("ts").cast("timestamp"))
                + F.unix_micros(F.max("ts").cast("timestamp"))
            )
            / 2
        )
        .cast("long")
        .alias("mid_us")
    )
    f = ev.join(F.broadcast(b)).select(
        (F.col("event_type") == "purchase").cast("int").alias("treated"),
        F.when(
            F.unix_micros(F.col("ts").cast("timestamp")) <= F.col("mid_us"),
            F.lit(0),
        )
        .otherwise(F.lit(1))
        .alias("post"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    g = f.groupBy("treated", "post").agg(
        F.sum("cents").alias("s"), F.count("*").alias("n")
    )
    cell = lambda t, p, c: F.max(
        F.when((F.col("treated") == t) & (F.col("post") == p), F.col(c))
    )
    w = g.agg(
        cell(1, 1, "s").alias("s11"), cell(1, 1, "n").alias("n11"),
        cell(1, 0, "s").alias("s10"), cell(1, 0, "n").alias("n10"),
        cell(0, 1, "s").alias("s01"), cell(0, 1, "n").alias("n01"),
        cell(0, 0, "s").alias("s00"), cell(0, 0, "n").alias("n00"),
    )
    d = "CAST({} AS DECIMAL(38,0))"
    return w.selectExpr(
        "CAST(n11 AS BIGINT) AS n_treated_post",
        f"CAST((({d.format('s11')} * {d.format('n10')}"
        f" - {d.format('s10')} * {d.format('n11')})"
        f" * {d.format('n01')} * {d.format('n00')}"
        f" - ({d.format('s01')} * {d.format('n00')}"
        f" - {d.format('s00')} * {d.format('n01')})"
        f" * {d.format('n11')} * {d.format('n10')}) * 100"
        f" div ({d.format('n11')} * {d.format('n10')}"
        f" * {d.format('n01')} * {d.format('n00')}) AS BIGINT)"
        " AS did_centicents",
    )


@register(
    "agg_also_bought_top1",
    oracle="""
        WITH items AS (
            SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
            FROM lineitem),
        pairs AS (
            SELECT a.pk AS part_a, b.pk AS part_b, COUNT(*) AS n_ab
            FROM items a JOIN items b ON a.ok = b.ok AND a.pk <> b.pk
            GROUP BY a.pk, b.pk),
        rk AS (
            SELECT part_a, part_b, n_ab,
                   ROW_NUMBER() OVER (PARTITION BY part_a
                                      ORDER BY n_ab DESC, part_b) AS rn
            FROM pairs)
        SELECT part_a AS part, part_b AS also_bought, n_ab AS n_co_orders
        FROM rk WHERE rn = 1 AND n_ab >= 2
    """,
)
def agg_also_bought_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """\"CUSTOMERS ALSO BOUGHT\": for every part, its most co-purchased
    partner (>= 2 shared orders, deterministic tie-break) — the
    item-to-item collaborative-filtering table Amazon popularized,
    derivable from the same order-blocked pair generation as
    `agg_basket_lift_pairs` but DIRECTED (both (a,b) and (b,a) exist,
    so each part gets its own recommendation row).

    Order-key-blocked pair join (fanout = items-per-order squared),
    one pair agg, one per-part argmax window. Never |parts|^2.
    """
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    a = items.select("ok", F.col("pk").alias("part_a"))
    b = items.select("ok", F.col("pk").alias("part_b"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("part_a") != F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_ab"))
    )
    w = Window.partitionBy("part_a").orderBy(
        F.desc("n_ab"), F.col("part_b")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("n_ab") >= 2))
        .select(
            F.col("part_a").alias("part"),
            F.col("part_b").alias("also_bought"),
            F.col("n_ab").alias("n_co_orders"),
        )
    )


@register(
    "pipeline_data_contract_validate",
    oracle="""
        SELECT 'event_id_unique' AS rule,
               CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT)
                 AS n_violations,
               COUNT(*) = COUNT(DISTINCT event_id) AS passed
        FROM events
        UNION ALL
        SELECT 'value_non_negative',
               CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT),
               SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) = 0
        FROM events
        UNION ALL
        SELECT 'event_type_in_enum',
               CAST(SUM(CASE WHEN event_type NOT IN
                    ('click','error','purchase','signup','view')
                    THEN 1 ELSE 0 END) AS BIGINT),
               SUM(CASE WHEN event_type NOT IN
                   ('click','error','purchase','signup','view')
                   THEN 1 ELSE 0 END) = 0
        FROM events
        UNION ALL
        SELECT 'ts_not_null',
               CAST(COUNT(*) - COUNT(ts) AS BIGINT),
               COUNT(*) = COUNT(ts)
        FROM events
        UNION ALL
        SELECT 'user_id_positive',
               CAST(SUM(CASE WHEN user_id IS NULL OR user_id < 0
                    THEN 1 ELSE 0 END) AS BIGINT),
               SUM(CASE WHEN user_id IS NULL OR user_id < 0
                   THEN 1 ELSE 0 END) = 0
        FROM events
    """,
)
def pipeline_data_contract_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATA-CONTRACT VALIDATION report: five declarative rules (key
    uniqueness, non-negativity, enum membership, non-null, id domain)
    each emitting a violation count and a pass flag — the
    dbt-test / Great-Expectations gate a dataset must clear before
    publication, as one query.

    ALL rules evaluate in a SINGLE aggregate over ONE scan (conditional
    sums + one exact distinct), then a codegen ``stack`` unpivots the
    1-row summary into the rule report — the oracle's 5-scan UNION is
    the semantics spec, not the plan (same discipline as
    `scan_table_profile`). A failing contract is driver-visible: the
    pass flags are part of the hashed values.
    """
    ev = load_table(spark, sf_dir, "events")
    enum_ok = F.col("event_type").isin(
        "click", "error", "purchase", "signup", "view"
    )
    a = ev.agg(
        F.count("*").alias("n"),
        F.countDistinct("event_id").alias("d_eid"),
        F.sum((F.col("value") < 0).cast("int")).alias("neg_v"),
        F.sum((~enum_ok).cast("int")).alias("bad_enum"),
        F.count("ts").alias("c_ts"),
        F.sum(
            (F.col("user_id").isNull() | (F.col("user_id") < 0)).cast("int")
        ).alias("bad_uid"),
    )
    return a.selectExpr(
        "stack(5,"
        " 'event_id_unique', n - d_eid, n = d_eid,"
        " 'value_non_negative', CAST(neg_v AS BIGINT), neg_v = 0,"
        " 'event_type_in_enum', CAST(bad_enum AS BIGINT), bad_enum = 0,"
        " 'ts_not_null', n - c_ts, n = c_ts,"
        " 'user_id_positive', CAST(bad_uid AS BIGINT), bad_uid = 0)"
        " AS (rule, n_violations, passed)"
    )


@register(
    "agg_shipping_sla",
    oracle="""
        WITH lag AS (
            SELECT o.o_orderpriority AS priority,
                   date_diff('day', o.o_orderdate, l.l_shipdate) AS lag_days
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        SELECT priority, COUNT(*) AS n_items,
               CAST(SUM(CASE WHEN lag_days <= 30 THEN 1 ELSE 0 END)
                    * 1000000 // COUNT(*) AS BIGINT) AS sla30_ppm,
               CAST(MAX(lag_days) AS BIGINT) AS max_lag_days,
               CAST(quantile_disc(lag_days, 0.9) AS BIGINT) AS p90_lag_days
        FROM lag GROUP BY priority
    """,
)
def agg_shipping_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHIPPING SLA report: per order priority, the fraction of line
    items shipped within 30 days (exact ppm), the worst lag, and the
    exact discrete p90 lag — the fulfillment scorecard every ops
    dashboard leads with. Lags are whole-day integers; the p90 is the
    DISCRETE quantile (an actual data value, `percentile(..., 0.9)`
    exact in Spark mirrors DuckDB's quantile_disc), so no
    interpolation ambiguity exists between engines.

    One broadcast orders join onto the fact scan, one (priority) hash
    agg — the exact percentile is per-group over day-integers with
    bounded distinct values, cheap at any scale (and the KLL key is
    the documented sketch path when it isn't).
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    lag = li.join(maybe_broadcast(o), li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff("l_shipdate", "o_orderdate").cast("long").alias(
            "lag_days"
        ),
    )
    return lag.groupBy("priority").agg(
        F.count("*").alias("n_items"),
        F.expr(
            "CAST(SUM(CASE WHEN lag_days <= 30 THEN 1 ELSE 0 END)"
            " * 1000000 div COUNT(*) AS BIGINT)"
        ).alias("sla30_ppm"),
        F.max("lag_days").alias("max_lag_days"),
        F.expr(
            "CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY lag_days)"
            " AS BIGINT)"
        ).alias("p90_lag_days"),
    )


@register(
    "win_abc_classification",
    oracle="""
        WITH rev AS (
            SELECT l_partkey AS part,
                   CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                        AS BIGINT) AS cents
            FROM lineitem GROUP BY l_partkey),
        c AS (SELECT part, cents,
                     CAST(SUM(cents) OVER (ORDER BY cents DESC, part
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS cum,
                     CAST(SUM(cents) OVER () AS BIGINT) AS total
              FROM rev)
        SELECT part, cents,
               CASE WHEN cum * 10 <= total * 7 THEN 'A'
                    WHEN cum * 10 <= total * 9 THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM c
    """,
)
def win_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC INVENTORY CLASSIFICATION: parts ranked by revenue, split at
    the 70% / 90% cumulative-share boundaries (class A carries ~70% of
    revenue) — the Pareto workhorse of inventory and SKU management.
    The share thresholds are CROSS-MULTIPLIED (cum*10 vs total*7) so
    no fraction or float share ever materializes; the cumulative sum
    runs over a deterministic (revenue desc, part) total order.

    One (part) hash agg, then the cumulative window over the
    aggregated part table. The global-ordered window is
    single-partition — fine for a part dimension; the documented scale
    path for a billion-SKU table is a two-pass range-partitioned
    cumulative sum (partition totals + offset broadcast), same
    classification boundaries.
    """
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100, 0).cast("long")
        ).alias("cents")
    )
    wc = Window.orderBy(F.desc("cents"), F.col("part")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    c = rev.select(
        "part",
        "cents",
        F.sum("cents").over(wc).cast("long").alias("cum"),
        F.sum("cents").over(wall).cast("long").alias("total"),
    )
    return c.select(
        "part",
        "cents",
        F.when(F.col("cum") * 10 <= F.col("total") * 7, "A")
        .when(F.col("cum") * 10 <= F.col("total") * 9, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


@register(
    "agg_repeat_purchase",
    oracle="""
        WITH p AS (
            SELECT user_id, ts,
                   LAG(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS pts
            FROM events WHERE event_type = 'purchase'),
        per_user AS (
            SELECT user_id, COUNT(*) AS n_purchases,
                   CAST(min(date_diff('microsecond', pts, ts))
                        AS BIGINT) AS min_gap_us
            FROM p GROUP BY user_id)
        SELECT COUNT(*) AS n_buyers,
               CAST(SUM(CASE WHEN n_purchases >= 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_repeat_buyers,
               CAST(SUM(CASE WHEN n_purchases >= 2 THEN 1 ELSE 0 END)
                    * 1000000 // COUNT(*) AS BIGINT) AS repeat_rate_ppm,
               CAST(min(min_gap_us) AS BIGINT) AS fastest_repeat_us
        FROM per_user
    """,
)
def agg_repeat_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REPEAT-PURCHASE readout: share of buyers who purchased at least
    twice (exact ppm) and the fastest observed repeat interval — the
    retention metric that separates a storefront from a churn funnel.
    Gaps come from one LAG window over the purchase stream (no
    self-join); microsecond-integer intervals.

    One user_id shuffle shared by the window and the per-user rollup,
    then a 1-row summary.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lag("ts").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("pts"),
    )
    per_user = p.groupBy("user_id").agg(
        F.count("*").alias("n_purchases"),
        F.min(
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("pts").cast("timestamp"))
        ).alias("min_gap_us"),
    )
    return per_user.agg(
        F.count("*").alias("n_buyers"),
        F.sum((F.col("n_purchases") >= 2).cast("int"))
        .cast("long")
        .alias("n_repeat_buyers"),
        F.expr(
            "CAST(SUM(CASE WHEN n_purchases >= 2 THEN 1 ELSE 0 END)"
            " * 1000000 div COUNT(*) AS BIGINT)"
        ).alias("repeat_rate_ppm"),
        F.min("min_gap_us").cast("long").alias("fastest_repeat_us"),
    )


@register(
    "agg_attribution_first_touch",
    oracle="""
        WITH ce AS (SELECT event_id, user_id, ts, event_type
                    FROM events
                    WHERE event_type IN ('click', 'purchase')),
        w AS (SELECT event_id, user_id, ts, event_type,
                     first_value(CASE WHEN event_type = 'click' THEN ts END
                                 IGNORE NULLS)
                         OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS t_first_click
              FROM ce)
        SELECT event_id AS purchase_id, user_id, ts AS t_purchase,
               t_first_click,
               CAST(t_first_click IS NOT NULL AS BIGINT) AS attributed,
               CASE WHEN t_first_click IS NOT NULL
                    THEN CAST(date_diff('second', t_first_click, ts)
                              AS BIGINT)
               END AS seconds_since_first_click
        FROM w WHERE event_type = 'purchase'
    """,
)
def agg_attribution_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST-touch attribution: each purchase credits the user's
    EARLIEST click before it — the acquisition-centric counterpart of
    `agg_attribution_last_touch` (same single-window as-of shape, the
    running aggregate flips from last to first_value ignorenulls), so
    the two models diff directly for channel-overlap analysis.

    One user_id-keyed window, one exchange total, no self-join.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = ev.withColumn(
        "t_first_click",
        F.first(
            F.when(F.col("event_type") == "click", F.col("ts")),
            ignorenulls=True,
        ).over(w),
    )
    return c.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("t_purchase"),
        "t_first_click",
        F.col("t_first_click").isNotNull().cast("bigint").alias("attributed"),
        # unix_timestamp truncates each side to whole seconds — the
        # oracle's date_diff('second') boundary-count semantics (a
        # micros-diff div 1e6 is off by one across second edges).
        F.when(
            F.col("t_first_click").isNotNull(),
            (
                F.unix_timestamp("ts")
                - F.unix_timestamp("t_first_click")
            ).cast("bigint"),
        ).alias("seconds_since_first_click"),
    )


@register(
    "agg_activity_heatmap",
    oracle="""
        SELECT event_type,
               CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
               CAST(hour(ts) AS BIGINT) AS hod,
               COUNT(*) AS n,
               CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                 AS value_cents
        FROM events GROUP BY event_type, dow, hod
    """,
)
def agg_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACTIVITY HEATMAP: event volume and value on the
    (day-of-week x hour-of-day) grid per type — the when-are-users-
    here dashboard staple behind staffing, cron placement, and
    maintenance-window choices. One hash agg on a bounded 7x24 key
    space per type (map-side combinable to at most 168 rows per type
    per partition regardless of input size); dow numbering aligned
    across engines (DuckDB 0=Sun, Spark 1=Sun).
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.dayofweek("ts").cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hod"),
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
            "value_cents"
        ),
    )


# ------------------------------------ log2-binned histogram (round 4)


@register(
    "agg_log2_histogram",
    oracle="""
        WITH c AS (
            SELECT CAST(round(value * 100, 0) AS BIGINT) AS cents
            FROM events),
        b AS (
            SELECT cents,
                   CAST(length(printf('%b', cents)) - 1 AS BIGINT)
                     AS bucket
            FROM c WHERE cents > 0)
        SELECT bucket,
               CAST(CAST(1 AS BIGINT) << bucket AS BIGINT)
                 AS bucket_lo_cents,
               COUNT(*) AS n,
               MIN(cents) AS min_cents,
               MAX(cents) AS max_cents,
               CAST(SUM(cents) AS BIGINT) AS total_cents
        FROM b GROUP BY bucket
    """,
)
def agg_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOG2-BINNED VALUE HISTOGRAM: event values bucketed by
    floor(log2(cents)) — the exponential-bucket histogram every
    latency/size/value observability pipeline exports (hdr-histogram /
    Prometheus-bucket shape), covering 9 orders of magnitude in ~30
    rows where a linear histogram needs millions.

    The bucket is INTEGER-exact: floor(log2(n)) = number of binary
    digits minus one (`length(bin(n)) - 1` / `printf('%%b')`) — no
    float log2 whose rounding could misplace values sitting exactly on
    a power of two. One map-side-combine hash agg over a codegen
    projection; output is |distinct buckets| rows at any corpus size.
    """
    ev = load_table(spark, sf_dir, "events")
    b = ev.select(cents("value").alias("cents")).filter(
        F.col("cents") > 0
    ).withColumn(
        "bucket", (F.length(F.expr("bin(cents)")) - 1).cast("long")
    )
    return b.groupBy("bucket").agg(
        F.expr(
            "CAST(shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT))"
            " AS BIGINT)"
        ).alias("bucket_lo_cents"),
        F.count("*").alias("n"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
        F.sum("cents").cast("long").alias("total_cents"),
    )


# ------------------------------------- cohort LTV curve (round 4)


@register(
    "agg_cohort_ltv_curve",
    oracle="""
        WITH e AS (
            SELECT user_id, date_trunc('day', ts) AS d,
                   CAST(round(value * 100, 0) AS BIGINT) AS cents
            FROM events),
        coh AS (SELECT user_id, MIN(d) AS cohort FROM e GROUP BY user_id),
        j AS (
            SELECT coh.cohort,
                   CAST(date_diff('day', coh.cohort, e.d) AS BIGINT)
                     AS day_offset,
                   e.cents
            FROM e JOIN coh ON e.user_id = coh.user_id),
        per AS (
            SELECT cohort, day_offset,
                   CAST(SUM(cents) AS BIGINT) AS day_cents
            FROM j GROUP BY cohort, day_offset),
        sz AS (SELECT cohort, COUNT(*) AS cohort_size
               FROM coh GROUP BY cohort)
        SELECT per.cohort, per.day_offset, per.day_cents,
               CAST(SUM(per.day_cents) OVER (PARTITION BY per.cohort
                        ORDER BY per.day_offset
                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS cum_cents,
               CAST(CAST(SUM(per.day_cents) OVER (PARTITION BY per.cohort
                        ORDER BY per.day_offset
                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
                    * 1000000 // sz.cohort_size AS BIGINT)
                 AS ltv_per_user_ppm
        FROM per JOIN sz ON per.cohort = sz.cohort
    """,
)
def agg_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHORT LTV CURVE: cumulative value per signup cohort by
    days-since-first-seen, normalized per cohort member (exact
    cents·ppm) — the lifetime-value ramp every growth model fits, and
    the money twin of `agg_retention_cohorts`' user counts (same
    cohort grain, so the two reports join 1:1).

    Two user_id-keyed shuffles (cohort assign reuses the join
    exchange), one tiny (cohort, offset) grid with a cumulative window
    and a broadcast cohort-size join. All integer: the per-user
    normalization is one floored ppm division; the cumulative sum is
    int64 cents.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("day", "ts").alias("d"),
        cents("value").alias("cents"),
    )
    coh = ev.groupBy("user_id").agg(F.min("d").alias("cohort"))
    j = ev.join(coh, "user_id").select(
        "cohort",
        F.datediff("d", "cohort").cast("long").alias("day_offset"),
        "cents",
    )
    per = j.groupBy("cohort", "day_offset").agg(
        F.sum("cents").cast("long").alias("day_cents")
    )
    sz = coh.groupBy("cohort").agg(F.count("*").alias("cohort_size"))
    cum = F.sum("day_cents").over(
        Window.partitionBy("cohort")
        .orderBy("day_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return per.join(F.broadcast(sz), "cohort").select(
        "cohort",
        "day_offset",
        "day_cents",
        cum.cast("long").alias("cum_cents"),
        F.expr(
            "CAST(CAST(SUM(day_cents) OVER (PARTITION BY cohort"
            " ORDER BY day_offset ROWS BETWEEN UNBOUNDED PRECEDING"
            " AND CURRENT ROW) AS BIGINT) * 1000000"
            " div cohort_size AS BIGINT)"
        ).alias("ltv_per_user_ppm"),
    )


# ---------------------------- funnel time-to-convert (round 4)


@register(
    "agg_funnel_time_to_convert",
    oracle="""
        WITH v AS (
            SELECT user_id, MIN(ts) AS first_view
            FROM events WHERE event_type = 'view' GROUP BY user_id),
        p AS (
            SELECT e.user_id, MIN(e.ts) AS first_purchase
            FROM events e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'purchase' AND e.ts >= v.first_view
            GROUP BY e.user_id),
        d AS (
            SELECT v.user_id,
                   date_diff('second', v.first_view, p.first_purchase)
                     AS delay_s
            FROM v JOIN p ON v.user_id = p.user_id)
        SELECT COUNT(*) AS n_converted,
               CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_entered,
               CAST(COUNT(*) * 1000000
                    // (SELECT COUNT(*) FROM v) AS BIGINT)
                 AS conversion_ppm,
               CAST(MIN(delay_s) AS BIGINT) AS min_delay_s,
               CAST(round(quantile_cont(delay_s, 0.5) * 100, 0) AS BIGINT)
                 AS median_delay_cs,
               CAST(round(quantile_cont(delay_s, 0.9) * 100, 0) AS BIGINT)
                 AS p90_delay_cs,
               CAST(MAX(delay_s) AS BIGINT) AS max_delay_s
        FROM d
    """,
)
def agg_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUNNEL LATENCY: how long users take from first 'view' to first
    subsequent 'purchase' — the time-to-convert distribution that turns
    `agg_funnel_steps`' static counts into an SLA ('half convert within
    X, the p90 tail waits Y'). Conversion requires the purchase AT or
    AFTER the first view (ordering matters — a purchase-then-view user
    is not a funnel conversion).

    Two user-keyed min-aggs + one join (all same key — AQE reuses the
    exchange), delays as whole seconds; percentiles are the
    INTERPOLATED kind on both engines (Spark `percentile` ==
    DuckDB `quantile_cont`) with the fractional result cleared to
    exact centiseconds (interpolants of integers have denominator
    ≤ 10, so ×100 is integer-exact in float64). One summary row out.
    """
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    d = v.join(p, "user_id").select(
        F.expr(
            "CAST(unix_timestamp(first_purchase)"
            " - unix_timestamp(first_view) AS BIGINT)"
        ).alias("delay_s")
    )
    n_entered = v.agg(F.count("*").alias("n_entered"))
    return (
        d.agg(
            F.count("*").alias("n_converted"),
            F.min("delay_s").alias("min_delay_s"),
            F.expr(
                "CAST(round(percentile(delay_s, 0.5) * 100, 0) AS BIGINT)"
            ).alias("median_delay_cs"),
            F.expr(
                "CAST(round(percentile(delay_s, 0.9) * 100, 0) AS BIGINT)"
            ).alias("p90_delay_cs"),
            F.max("delay_s").alias("max_delay_s"),
        )
        .crossJoin(F.broadcast(n_entered))
        .select(
            "n_converted",
            F.col("n_entered").cast("long").alias("n_entered"),
            F.expr(
                "CAST(n_converted * 1000000 div n_entered AS BIGINT)"
            ).alias("conversion_ppm"),
            "min_delay_s",
            "median_delay_cs",
            "p90_delay_cs",
            "max_delay_s",
        )
    )
