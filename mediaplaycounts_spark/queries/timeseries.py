"""Time-series repair + anomaly operators over the daily play grid.

The reference's API zero-fills missing days when serving a date range
(REF GetData::date_range, SURVEY.md §3.2 stage 4). These operators
extend that idea from "fill with 0" to the two next things a log
analyst needs on a daily metric series:

- `ts_gapfill_interpolate` — rebuild a dense per-type daily series and
  LINEARLY interpolate missing days from the nearest observed
  neighbors (edges carry the nearest value). Interpolation is done in
  exact int64 cents arithmetic — ``(pc*(tot-off) + nc*off) div tot`` —
  so Spark and the DuckDB oracle agree bit-for-bit; a double lerp would
  be at the mercy of each engine's rounding.
- `agg_anomaly_flag` — flag days whose total deviates from the type's
  mean by more than 3 sigma. The test ``|t - mean| > 3*sigma`` is
  algebraically cleared of divisions: ``(D*t - S)^2 > 9*(D*S2 - S^2)``
  over exact integer moments (D days, S = sum of daily cents totals,
  S2 = sum of squares), so the flag is order-independent and
  bit-identical across engines — no sqrt, no FP variance.

100 TB posture: both shuffle once on (event_type, day) — the grid after
that is O(types x days), tiny regardless of input scale. The window
functions in the gap-fill run per event_type over that tiny grid, not
over raw events. Moment sums: daily cents totals up to ~2^40 keep
``S2 < 2^63`` through ~8e6 days/type; past that promote the moment
columns to DECIMAL(38,0) partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mediaplaycounts_spark.queries._helpers import cents
from mediaplaycounts_spark.session import checkpoint_df
from mediaplaycounts_spark.registry import register
from mediaplaycounts_spark.tables import load_table

_DAILY_SQL = """
        SELECT event_type, date_trunc('day', ts) AS d,
               SUM(CAST(round(value * 100, 0) AS BIGINT)) AS c
        FROM events GROUP BY event_type, date_trunc('day', ts)
"""


def _daily_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(type, day) exact cents total of `events.value`."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.date_trunc("DAY", "ts").alias("d")
    ).agg(F.sum(cents("value")).alias("c"))


# ------------------------------------------------------------- gap fill


@register(
    "ts_gapfill_interpolate",
    oracle=f"""
        WITH daily AS ({_DAILY_SQL}),
        bounds AS (SELECT MIN(d) AS mn, MAX(d) AS mx FROM daily),
        days AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS d
                 FROM bounds),
        spine AS (SELECT t.event_type, days.d
                  FROM (SELECT DISTINCT event_type FROM daily) t
                  CROSS JOIN days),
        j AS (SELECT s.event_type, s.d, daily.c
              FROM spine s LEFT JOIN daily
                ON s.event_type = daily.event_type AND s.d = daily.d),
        w AS (SELECT event_type, d, c,
              last_value(c IGNORE NULLS) OVER pw AS pc,
              last_value(CASE WHEN c IS NOT NULL THEN d END IGNORE NULLS)
                  OVER pw AS pd,
              first_value(c IGNORE NULLS) OVER nw AS nc,
              first_value(CASE WHEN c IS NOT NULL THEN d END IGNORE NULLS)
                  OVER nw AS nd
              FROM j
              WINDOW pw AS (PARTITION BY event_type ORDER BY d
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                     nw AS (PARTITION BY event_type ORDER BY d
                            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        SELECT event_type, d,
               CAST(COALESCE(c,
                             (pc * (date_diff('day', pd, nd)
                                    - date_diff('day', pd, d))
                              + nc * date_diff('day', pd, d))
                             // NULLIF(date_diff('day', pd, nd), 0),
                             pc, nc) AS DOUBLE) / 100.0 AS filled_value,
               CAST(c IS NULL AS BIGINT) AS was_gap
        FROM w
    """,
)
def ts_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily series per event_type with integer-exact linear
    interpolation of missing days (calendar spine from the global
    min/max day; leading/trailing gaps carry the nearest neighbor).

    Plan shape: one (type, day) hash agg over events, then all spine /
    window work happens on the O(types x days) grid. The spine is built
    with ``sequence`` + ``explode`` from a 1-row bounds aggregate —
    no driver-side date loop, no collect.
    """
    daily = _daily_cents(spark, sf_dir)
    bounds = daily.agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
    days = bounds.select(
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 day"))).alias("d")
    )
    spine = daily.select("event_type").distinct().crossJoin(days)
    j = spine.join(daily, ["event_type", "d"], "left")

    pw = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    nw = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_d = F.when(F.col("c").isNotNull(), F.col("d"))
    w = j.select(
        "event_type",
        "d",
        "c",
        F.last("c", ignorenulls=True).over(pw).alias("pc"),
        F.last(obs_d, ignorenulls=True).over(pw).alias("pd"),
        F.first("c", ignorenulls=True).over(nw).alias("nc"),
        F.first(obs_d, ignorenulls=True).over(nw).alias("nd"),
    )
    # Exact integer lerp; NULLIF guards ANSI div-by-zero on observed rows
    # (where pd == nd), which COALESCE then resolves via c itself.
    interp = F.expr(
        "(pc * (datediff(nd, pd) - datediff(d, pd)) + nc * datediff(d, pd))"
        " div nullif(datediff(nd, pd), 0)"
    )
    return w.select(
        "event_type",
        "d",
        (F.coalesce("c", interp, "pc", "nc").cast("double") / 100.0).alias(
            "filled_value"
        ),
        F.col("c").isNull().cast("bigint").alias("was_gap"),
    )


# ------------------------------------------------------- anomaly flags


@register(
    "agg_anomaly_flag",
    oracle=f"""
        WITH daily AS ({_DAILY_SQL}),
        m AS (SELECT event_type, COUNT(*) AS nd,
                     SUM(c) AS s1, SUM(c * c) AS s2
              FROM daily GROUP BY event_type)
        SELECT daily.event_type, daily.d,
               CAST(daily.c AS DOUBLE) / 100.0 AS daily_total,
               CAST((m.nd * daily.c - m.s1) * (m.nd * daily.c - m.s1)
                    > 9 * (m.nd * m.s2 - m.s1 * m.s1) AS BIGINT) AS is_anomaly
        FROM daily JOIN m ON daily.event_type = m.event_type
    """,
)
def agg_anomaly_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-sigma daily-total anomaly flags per event_type, decided entirely
    in int64 moment arithmetic: ``(D*t - S)^2 > 9*(D*S2 - S^2)`` is
    ``|t - mean| > 3*sigma_pop`` with both sides multiplied by ``D^2``.

    The per-type moment table is tiny — Catalyst broadcasts it back onto
    the daily grid (itself the output of one hash agg over events), so
    the whole operator is one shuffle + one broadcast join.
    """
    daily = _daily_cents(spark, sf_dir)
    m = daily.groupBy("event_type").agg(
        F.count("*").alias("nd"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    dev = F.col("nd") * F.col("c") - F.col("s1")
    return (
        daily.join(F.broadcast(m), "event_type")
        .select(
            "event_type",
            "d",
            (F.col("c").cast("double") / 100.0).alias("daily_total"),
            (
                dev * dev
                > 9 * (F.col("nd") * F.col("s2") - F.col("s1") * F.col("s1"))
            )
            .cast("bigint")
            .alias("is_anomaly"),
        )
    )


# ------------------------------------------------------- trend slopes


@register(
    "agg_trend_slope",
    oracle=f"""
        WITH daily AS ({_DAILY_SQL}),
        m AS (SELECT event_type,
                     COUNT(*) AS n,
                     SUM(date_diff('day', DATE '1970-01-01', CAST(d AS DATE)))
                       AS sx,
                     SUM(c) AS sy,
                     SUM(date_diff('day', DATE '1970-01-01', CAST(d AS DATE))
                         * c) AS sxy,
                     SUM(date_diff('day', DATE '1970-01-01', CAST(d AS DATE))
                         * date_diff('day', DATE '1970-01-01', CAST(d AS DATE)))
                       AS sxx
              FROM daily GROUP BY event_type)
        SELECT event_type, n,
               round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                     / 100.0, 6) AS slope_per_day,
               round((CAST(sy AS DOUBLE)
                      - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                         / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
                        * sx)
                     / n / 100.0, 6) AS intercept
        FROM m
    """,
)
def agg_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form least-squares trend per event_type: slope/intercept
    of the daily-total series over epoch-day x, computed from five
    exact int64 moments (n, Σx, Σy, Σxy, Σx²) — the same moment
    discipline as agg_corr_exact, so the distributed fit is
    order-independent and oracle-exact. This is the "are plays
    trending up?" question the reference's dashboard users asked of
    last_30/last_90 deltas, answered properly.

    One hash agg over the tiny daily grid; slope math is a final
    5-integer formula per type."""
    daily = _daily_cents(spark, sf_dir)
    x = F.datediff(F.col("d").cast("date"), F.to_date(F.lit("1970-01-01"))).cast(
        "long"
    )
    m = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum("c").alias("sy"),
        F.sum(x * F.col("c")).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    slope_raw = (nd * F.col("sxy") - sxd * F.col("sy")) / (
        nd * F.col("sxx") - sxd * F.col("sx")
    )
    return m.select(
        "event_type",
        "n",
        F.round(slope_raw / 100.0, 6).alias("slope_per_day"),
        F.round((syd - slope_raw * F.col("sx")) / F.col("n") / 100.0, 6).alias(
            "intercept"
        ),
    )


# ------------------------------------------------------------ OHLC bars


@register(
    "ts_ohlc_bars",
    oracle="""
        WITH e AS (SELECT event_type, date_trunc('day', ts) AS day,
                          CAST(round(value * 100, 0) AS BIGINT) AS c,
                          ts, event_id
                   FROM events),
        w AS (SELECT event_type, day, c,
                     first_value(c) OVER (
                         PARTITION BY event_type, day ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND UNBOUNDED FOLLOWING) AS o,
                     last_value(c) OVER (
                         PARTITION BY event_type, day ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND UNBOUNDED FOLLOWING) AS cl
              FROM e)
        SELECT event_type, day,
               CAST(MIN(o) AS DOUBLE) / 100.0 AS open,
               CAST(MAX(c) AS DOUBLE) / 100.0 AS high,
               CAST(MIN(c) AS DOUBLE) / 100.0 AS low,
               CAST(MIN(cl) AS DOUBLE) / 100.0 AS close,
               COUNT(*) AS n_events
        FROM w GROUP BY event_type, day
    """,
)
def ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling: per (type, day) open/high/low/close of the
    event value stream — the canonical time-series bar compaction
    (metrics dashboards, rate monitoring over play logs).

    Open/close are first/last IN EVENT-TIME ORDER with event_id as the
    total-order tie-break, computed with ordered full-frame windows so
    both engines see the identical deterministic row; high/low are
    plain min/max cents. One shuffle on (event_type, day); the window
    and the final aggregate share that partitioning, so the bar build
    costs a single exchange at any scale.
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        F.date_trunc("DAY", "ts").alias("day"),
        cents("value").alias("c"),
        "ts",
        "event_id",
    )
    w = (
        Window.partitionBy("event_type", "day")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    rows = e.select(
        "event_type",
        "day",
        "c",
        F.first("c").over(w).alias("o"),
        F.last("c").over(w).alias("cl"),
    )
    return rows.groupBy("event_type", "day").agg(
        (F.min("o").cast("double") / 100.0).alias("open"),
        (F.max("c").cast("double") / 100.0).alias("high"),
        (F.min("c").cast("double") / 100.0).alias("low"),
        (F.min("cl").cast("double") / 100.0).alias("close"),
        F.count("*").alias("n_events"),
    )


# ------------------------------------------------------- integer EWMA


@register(
    "ts_ewma_int",
    oracle=f"""
        WITH daily AS ({_DAILY_SQL}),
        l AS (SELECT event_type,
                     list(CAST(c AS BIGINT) * 1000 ORDER BY d) AS m,
                     COUNT(*) AS n_days
              FROM daily GROUP BY event_type)
        SELECT event_type, n_days,
               CAST(list_reduce(m, (a, b) -> (b + 3 * a) // 4) AS BIGINT)
                 AS ewma_millicents
        FROM l
    """,
)
def ts_ewma_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (alpha = 1/4) of the daily
    cents total per type, folded in EXACT int64 milli-cents:
    s_1 = m_1; s_i = (m_i + 3*s_{{i-1}}) >> 2. A float EWMA would
    accumulate engine-specific rounding; the integer recurrence (shift
    = floor-div-4 on non-negative state) is bit-identical to DuckDB's
    list_reduce with `// 4`.

    The fold is inherently sequential in day order, but it runs over
    the per-type DAILY grid (O(days) elements after the one groupBy
    shuffle), not over raw events — collect_list + aggregate on a
    30-element array per type, regardless of input scale. State stays
    < 2^63 while daily totals stay < 2^52 milli-cents.
    """
    daily = _daily_cents(spark, sf_dir)
    per_type = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("d", "c"))).alias("s")
    )
    m = F.transform(F.col("s"), lambda x: x["c"] * 1000)
    return per_type.select(
        "event_type",
        F.size("s").cast("long").alias("n_days"),
        F.aggregate(
            F.slice(m, 2, F.size("s") - 1),
            F.element_at(m, 1),
            lambda acc, x: F.shiftright(x + 3 * acc, 2),
        ).alias("ewma_millicents"),
    )


@register(
    "ts_anomaly_mad",
    oracle="""
        WITH d AS (
            SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                     AS tot_cents
            FROM events GROUP BY event_type, day),
        m AS (
            SELECT event_type, CAST(2 * median(tot_cents) AS BIGINT) AS med2
            FROM d GROUP BY event_type),
        dev AS (
            SELECT d.event_type, d.day, d.tot_cents, m.med2,
                   abs(2 * d.tot_cents - m.med2) AS dev2
            FROM d JOIN m USING (event_type)),
        md AS (
            SELECT event_type, CAST(2 * median(dev2) AS BIGINT) AS mad4
            FROM dev GROUP BY event_type)
        SELECT dev.event_type, dev.day, dev.tot_cents,
               dev.med2 AS med2_cents, md.mad4 AS mad4_cents,
               CAST(CASE WHEN 2 * dev.dev2 > 3 * md.mad4
                         THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
        FROM dev JOIN md USING (event_type)
    """,
)
def ts_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection: |x − median| > 3·MAD per event type —
    the outlier flag that, unlike the 3-sigma rule (agg_anomaly_flag),
    does not let the outliers inflate their own threshold.

    Integer-exact medians via the 2x trick (win_rolling_median): an
    even-count median is (a+b)/2, so 2·median = a+b is exact int64 on
    both engines; the flag compares 2·dev2 > 3·mad4 — all integer, no
    FP anywhere. Two median aggregates over the tiny (type, day) grid +
    broadcast joins back; the only fact-volume shuffle is the daily
    cents rollup."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.date_trunc("DAY", "ts").cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("tot_cents")
    )
    # The O(types x days) grid feeds FOUR consumers (median, dev join,
    # MAD median, final join) — without materialization each broadcast
    # branch re-runs the fact-volume rollup (7 scans observed). One
    # localCheckpoint of the tiny grid collapses that to a single pass.
    d = d.transform(checkpoint_df)
    m = d.groupBy("event_type").agg(
        (F.lit(2) * F.median("tot_cents")).cast("long").alias("med2")
    )
    dev = d.join(F.broadcast(m), "event_type").withColumn(
        "dev2", F.abs(F.lit(2) * F.col("tot_cents") - F.col("med2"))
    )
    md = dev.groupBy("event_type").agg(
        (F.lit(2) * F.median("dev2")).cast("long").alias("mad4")
    )
    return dev.join(F.broadcast(md), "event_type").select(
        "event_type",
        "day",
        "tot_cents",
        F.col("med2").alias("med2_cents"),
        F.col("mad4").alias("mad4_cents"),
        (F.lit(2) * F.col("dev2") > F.lit(3) * F.col("mad4"))
        .cast("long")
        .alias("is_anomaly"),
    )


@register(
    "ts_downsample_m4",
    oracle="""
        WITH b AS (
            SELECT event_type,
                   CAST(date_trunc('day', ts) AS DATE) AS bucket,
                   ts, event_id,
                   CAST(round(value * 100, 0) AS BIGINT) AS cents
            FROM events),
        r AS (
            SELECT *,
                   ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                                      ORDER BY ts, event_id) AS rn_a,
                   ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                                      ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM b)
        SELECT event_type, bucket,
               CAST(MIN(cents) AS BIGINT) AS v_min,
               CAST(MAX(cents) AS BIGINT) AS v_max,
               CAST(MAX(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS v_first,
               CAST(MAX(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS v_last,
               COUNT(*) AS n
        FROM r GROUP BY event_type, bucket
    """,
)
def ts_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 downsampling — the standard error-free series reduction for
    rendering/rollups: per (series, bucket) keep min, max, first and
    last values, which preserves every visual extreme a line plot can
    show. first/last use argmin/argmax over the total order (ts,
    event_id), so ties are deterministic on both engines; values are
    integer cents.

    One partial+final hash aggregate, shuffle keyed (type, day-bucket)
    — at 100 TB the output is |series| x |buckets| regardless of raw
    point count, which is the whole point."""
    ev = load_table(spark, sf_dir, "events")
    cents_v = F.round(F.col("value") * 100, 0).cast("long")
    b = ev.select(
        "event_type",
        F.date_trunc("DAY", "ts").cast("date").alias("bucket"),
        F.struct(F.col("ts"), F.col("event_id")).alias("ord"),
        cents_v.alias("cents"),
    )
    return b.groupBy("event_type", "bucket").agg(
        F.min("cents").alias("v_min"),
        F.max("cents").alias("v_max"),
        F.min_by("cents", "ord").alias("v_first"),
        F.max_by("cents", "ord").alias("v_last"),
        F.count("*").alias("n"),
    )


# ------------------------------------------- seasonal decomposition


@register(
    "ts_seasonal_decompose",
    oracle="""
        WITH daily AS (
            SELECT date_trunc('day', ts) AS day, COUNT(*) AS plays
            FROM events WHERE event_type = 'view' GROUP BY day),
        tr AS (
            SELECT day, plays,
                   CASE WHEN COUNT(*) OVER w = 7
                        THEN CAST(SUM(plays) OVER w * 1000000 // 7 AS BIGINT)
                        END AS trend_e6,
                   date_diff('day', DATE '2024-01-01', CAST(day AS DATE)) % 7
                     AS dow
            FROM daily
            WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        seas AS (
            SELECT dow,
                   CAST(SUM(plays * 1000000 - trend_e6) // COUNT(*) AS BIGINT)
                     AS seasonal_e6
            FROM tr WHERE trend_e6 IS NOT NULL GROUP BY dow)
        SELECT tr.day, tr.plays, tr.trend_e6, seas.seasonal_e6,
               CAST(tr.plays * 1000000 - tr.trend_e6 - seas.seasonal_e6 AS BIGINT)
                 AS resid_e6
        FROM tr JOIN seas ON tr.dow = seas.dow
        WHERE tr.trend_e6 IS NOT NULL
    """,
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the daily play
    series: trend = centered 7-day moving average (full windows only),
    seasonal = per-day-of-week mean of the detrended series, residual =
    observed − trend − seasonal. All three components in micro-unit
    int64 arithmetic (x1e6, floor division) so both engines produce
    bit-identical values — the decomposition every traffic-anomaly
    investigation starts from.

    Day-of-week comes from days-since-epoch mod 7 (engine-neutral;
    dayofweek() numbering differs between engines). Plan: one daily
    hash-agg, one 7-row window, one tiny per-dow agg broadcast back —
    at 100 TB the window is per-series (add the series key to every
    PARTITION BY) and nothing changes shape."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "view")
        .groupBy(F.date_trunc("DAY", "ts").alias("day"))
        .agg(F.count("*").alias("plays"))
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "plays",
        F.when(
            F.count("*").over(w) == 7,
            F.expr("cast(sum(plays) over (order by day rows between 3 preceding and 3 following) * 1000000 div 7 as bigint)"),
        ).alias("trend_e6"),
        (
            F.datediff(F.col("day").cast("date"), F.lit("2024-01-01").cast("date"))
            % 7
        ).alias("dow"),
    )
    seas = (
        tr.filter(F.col("trend_e6").isNotNull())
        .groupBy("dow")
        .agg(
            F.expr(
                "cast(sum(plays * 1000000 - trend_e6) div count(*) as bigint)"
            ).alias("seasonal_e6")
        )
    )
    return (
        tr.filter(F.col("trend_e6").isNotNull())
        .join(F.broadcast(seas), "dow")
        .select(
            "day",
            "plays",
            "trend_e6",
            "seasonal_e6",
            (
                F.col("plays") * 1000000 - F.col("trend_e6") - F.col("seasonal_e6")
            ).alias("resid_e6"),
        )
    )


# ------------------------------------------------- autocorrelation


@register(
    "ts_autocorr_int",
    oracle="""
        WITH daily AS (
            SELECT date_trunc('day', ts) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events WHERE event_type = 'view' GROUP BY day),
        st AS (SELECT CAST(SUM(n) AS BIGINT) AS tot,
                      CAST(COUNT(*) AS BIGINT) AS k FROM daily),
        d AS (SELECT day, n * (SELECT k FROM st) - (SELECT tot FROM st)
                       AS dev_k,
                     LAG(n * (SELECT k FROM st) - (SELECT tot FROM st), 1)
                       OVER (ORDER BY day) AS dev_l1,
                     LAG(n * (SELECT k FROM st) - (SELECT tot FROM st), 7)
                       OVER (ORDER BY day) AS dev_l7
              FROM daily)
        SELECT CAST(SUM(dev_k * dev_l1) AS BIGINT) AS num_lag1,
               CAST(SUM(dev_k * dev_l7) AS BIGINT) AS num_lag7,
               CAST(SUM(dev_k * dev_k) AS BIGINT) AS denom,
               CAST(round(CAST(SUM(dev_k * dev_l1) AS DOUBLE)
                          / SUM(dev_k * dev_k) * 1000000, 0) AS BIGINT)
                 AS acf1_e6,
               CAST(round(CAST(SUM(dev_k * dev_l7) AS DOUBLE)
                          / SUM(dev_k * dev_k) * 1000000, 0) AS BIGINT)
                 AS acf7_e6
        FROM d
    """,
)
def ts_autocorr_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily play series at lag 1 (day-to-day
    persistence) and lag 7 (weekly seasonality) — the diagnostic that
    justifies `ts_seasonal_decompose`'s weekly model. Integer-exact
    core: deviations scaled by the day count (n·k − total, no
    fractional mean), lag products and the variance denominator summed
    as int64; only the final ratio is one double division, micro-
    quantized with the shared convention.

    One daily agg + one ordered window + one 1-row reduction."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "view")
        .groupBy(F.date_trunc("DAY", "ts").alias("day"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    st = daily.agg(
        F.sum("n").cast("long").alias("tot"), F.count("*").cast("long").alias("k")
    )
    w = Window.orderBy("day")
    d = (
        daily.crossJoin(F.broadcast(st))
        .withColumn("dev_k", F.col("n") * F.col("k") - F.col("tot"))
        .select(
            "day",
            "dev_k",
            F.lag("dev_k", 1).over(w).alias("dev_l1"),
            F.lag("dev_k", 7).over(w).alias("dev_l7"),
        )
    )
    return d.agg(
        F.sum(F.col("dev_k") * F.col("dev_l1")).cast("long").alias("num_lag1"),
        F.sum(F.col("dev_k") * F.col("dev_l7")).cast("long").alias("num_lag7"),
        F.sum(F.col("dev_k") * F.col("dev_k")).cast("long").alias("denom"),
        F.round(
            F.sum(F.col("dev_k") * F.col("dev_l1")).cast("double")
            / F.sum(F.col("dev_k") * F.col("dev_k"))
            * 1000000,
            0,
        )
        .cast("long")
        .alias("acf1_e6"),
        F.round(
            F.sum(F.col("dev_k") * F.col("dev_l7")).cast("double")
            / F.sum(F.col("dev_k") * F.col("dev_k"))
            * 1000000,
            0,
        )
        .cast("long")
        .alias("acf7_e6"),
    )


# ------------------------------------------------- interval flattening


@register(
    "ts_interval_merge",
    oracle="""
        WITH e AS (SELECT user_id, event_id, ts AS s,
                          ts + INTERVAL 30 MINUTE AS en
                   FROM events),
        w AS (SELECT user_id, event_id, s, en,
              MAX(en) OVER (PARTITION BY user_id ORDER BY s, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) AS pmax
              FROM e),
        f AS (SELECT user_id, event_id, s, en,
              CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS ni
              FROM w),
        i AS (SELECT user_id, s, en,
              CAST(SUM(ni) OVER (PARTITION BY user_id ORDER BY s, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS BIGINT) AS island_id
              FROM f)
        SELECT user_id, island_id,
               MIN(s) AS start_ts, MAX(en) AS end_ts,
               COUNT(*) AS n_events,
               date_diff('microsecond', MIN(s), MAX(en)) AS span_us
        FROM i GROUP BY user_id, island_id
    """,
)
def ts_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-interval FLATTEN (merge) per user: each event opens a
    [ts, ts+30min] activity interval; intervals that overlap or touch a
    running one coalesce into a single island — the sweep-line classic
    behind sessionized uptime, on-call coverage, and GPU-occupancy
    accounting (REF has only per-day rollups; this is the
    sub-day generalization).

    Sweep line as windows, no self-join: a running MAX of interval-end
    over rows strictly before the current one detects island starts
    (`start > max(prior ends)`), a running SUM numbers the islands, and
    one hash agg per (user, island) emits merged bounds — two window
    passes + one agg over a SINGLE user_id shuffle (all three share the
    exchange; the windows share one sort). Span math is exact
    microsecond integers on both engines. At 100 TB: state per key is
    one max + one counter; no interval ever compares against anything
    but the running aggregate, so hot users cost O(n log n) sort, not
    O(n^2) pair checks.
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        "event_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("en"),
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wc = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = e.withColumn("pmax", F.max("en").over(wp)).withColumn(
        "ni",
        (F.col("pmax").isNull() | (F.col("s") > F.col("pmax"))).cast("int"),
    )
    islands = flagged.withColumn(
        "island_id", F.sum("ni").over(wc).cast("long")
    )
    return islands.groupBy("user_id", "island_id").agg(
        F.min("s").alias("start_ts"),
        F.max("en").alias("end_ts"),
        F.count("*").alias("n_events"),
        (
            F.unix_micros(F.max("en").cast("timestamp"))
            - F.unix_micros(F.min("s").cast("timestamp"))
        ).alias("span_us"),
    )


# ------------------------------------------------- trend estimation


@register(
    "win_rolling_slope",
    oracle=f"""
        WITH daily AS ({_DAILY_SQL}),
        x AS (SELECT event_type, d, c,
                     date_diff('day', DATE '2024-01-01', d) AS xd
              FROM daily),
        w AS (SELECT event_type, d,
                     COUNT(*) OVER fr AS k,
                     SUM(xd) OVER fr AS sx,
                     SUM(c) OVER fr AS sy,
                     SUM(xd * c) OVER fr AS sxy,
                     SUM(xd * xd) OVER fr AS sxx
              FROM x
              WINDOW fr AS (PARTITION BY event_type ORDER BY d
                            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        SELECT event_type, d, CAST(k AS BIGINT) AS k,
               CAST((k * sxy - sx * sy) * 1000000
                    // NULLIF(k * sxx - sx * sx, 0) AS BIGINT)
                 AS slope7_e6
        FROM w
    """,
)
def win_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING OLS SLOPE: 7-day windowed least-squares trend of the
    daily cents total per event_type — the trend-change detector that
    pairs with `agg_trend_slope` (global fit) and `ts_changepoint_cusum`
    (level shifts). Slope is the fraction-free integer form
    ``(k*Sxy - Sx*Sy) * 1e6 div (k*Sxx - Sx^2)`` over window moment
    sums; x is days-since-anchor so magnitudes stay far from int64
    edges, division truncates toward zero identically on both engines
    (verified for negative slopes), and the first row of each series is
    NULL via NULLIF (k=1 denominator).

    One shuffle to the (type, day) grid; four window sums share one
    frame over the tiny grid — raw events are never window-scanned.
    """
    daily = _daily_cents(spark, sf_dir)
    x = daily.withColumn(
        "xd", F.datediff(F.col("d"), F.lit("2024-01-01").cast("date")).cast("long")
    )
    fr = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-6, Window.currentRow)
    )
    w = x.select(
        "event_type",
        "d",
        F.count("*").over(fr).alias("k"),
        F.sum("xd").over(fr).alias("sx"),
        F.sum("c").over(fr).alias("sy"),
        F.sum(F.col("xd") * F.col("c")).over(fr).alias("sxy"),
        F.sum(F.col("xd") * F.col("xd")).over(fr).alias("sxx"),
    )
    return w.select(
        "event_type",
        "d",
        F.col("k").cast("long").alias("k"),
        F.expr(
            "CAST((k * sxy - sx * sy) * 1000000"
            " div NULLIF(k * sxx - sx * sx, 0) AS BIGINT)"
        ).alias("slope7_e6"),
    )


@register(
    "ts_theil_sen",
    oracle=f"""
        WITH daily AS ({_DAILY_SQL}),
        x AS (SELECT event_type, d, c,
                     date_diff('day', DATE '2024-01-01', d) AS xd
              FROM daily),
        p AS (SELECT a.event_type,
                     (b.c - a.c) * 1000000 // (b.xd - a.xd) AS slope_e6
              FROM x a JOIN x b
                ON a.event_type = b.event_type AND a.xd < b.xd),
        r AS (SELECT event_type, slope_e6,
                     ROW_NUMBER() OVER (PARTITION BY event_type
                                        ORDER BY slope_e6) AS rn,
                     COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM p)
        SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
               CAST(slope_e6 AS BIGINT) AS theil_sen_e6
        FROM r WHERE rn = (n + 1) // 2
    """,
)
def ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THEIL-SEN robust trend: the (lower) median of all pairwise
    slopes of the daily series per event_type — the estimator that
    shrugs off the outlier days that wreck OLS (`agg_trend_slope`).

    Pairwise slopes are O(days^2) ONLY on the aggregated (type, day)
    grid — ~30 rows per type regardless of raw scale, so the self-join
    is a few hundred rows per type after ONE events shuffle; this is
    the same aggregate-first-then-quadratic discipline as
    `join_interval_overlap`. Slopes are exact integer micro-units
    (truncating division, engine-verified for negatives); the lower
    median is rank (n+1) div 2 of the sorted slope multiset, so no
    two-value averaging and no floats anywhere.
    """
    daily = _daily_cents(spark, sf_dir)
    x = daily.withColumn(
        "xd", F.datediff(F.col("d"), F.lit("2024-01-01").cast("date")).cast("long")
    )
    a = x.select(
        "event_type", F.col("xd").alias("xa"), F.col("c").alias("ya")
    )
    b = x.select(
        "event_type", F.col("xd").alias("xb"), F.col("c").alias("yb")
    )
    p = (
        a.join(b, "event_type")
        .filter(F.col("xa") < F.col("xb"))
        .select(
            "event_type",
            F.expr("(yb - ya) * 1000000 div (xb - xa)").alias("slope_e6"),
        )
    )
    wr = Window.partitionBy("event_type").orderBy("slope_e6")
    wn = Window.partitionBy("event_type")
    r = p.select(
        "event_type",
        "slope_e6",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    return r.filter(F.col("rn") == F.expr("(n + 1) div 2")).select(
        "event_type",
        F.col("n").cast("long").alias("n_pairs"),
        F.col("slope_e6").alias("theil_sen_e6"),
    )


# ------------------------------------------------ series health metrics


@register(
    "win_drawdown_max",
    oracle=f"""
        WITH daily AS ({_DAILY_SQL}),
        cum AS (SELECT event_type, d,
                       SUM(c) OVER (PARTITION BY event_type ORDER BY d
                                    ROWS UNBOUNDED PRECEDING) AS cu
                FROM daily),
        pk AS (SELECT event_type, d, cu,
                      MAX(cu) OVER (PARTITION BY event_type ORDER BY d
                                    ROWS UNBOUNDED PRECEDING) AS peak
               FROM cum)
        SELECT event_type,
               CAST(MAX(peak - cu) AS BIGINT) AS max_drawdown_cents,
               CAST(MAX(cu) AS BIGINT) AS peak_cents,
               CAST(MAX(CASE WHEN rn = 1 THEN cu END) AS BIGINT)
                 AS final_cents
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                           ORDER BY d DESC) AS rn
              FROM pk)
        GROUP BY event_type
    """,
)
def win_drawdown_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAX DRAWDOWN of the cumulative daily series per event_type: the
    deepest peak-to-trough fall of the running total — the
    volatility/health metric finance runs on equity curves and SRE runs
    on cumulative error budgets. Running sum -> running max -> max gap,
    all exact int64 cents over the (type, day) grid; the final value
    rides along via a reverse row_number instead of a second scan.
    One events shuffle; three stacked windows + the final agg share the
    (event_type, d) sort.
    """
    daily = _daily_cents(spark, sf_dir)
    wc = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wr = Window.partitionBy("event_type").orderBy(F.desc("d"))
    pk = (
        daily.withColumn("cu", F.sum("c").over(wc))
        .withColumn("peak", F.max("cu").over(wc))
        .withColumn("rn", F.row_number().over(wr))
    )
    return pk.groupBy("event_type").agg(
        F.max(F.col("peak") - F.col("cu")).cast("long").alias(
            "max_drawdown_cents"
        ),
        F.max("cu").cast("long").alias("peak_cents"),
        F.max(F.when(F.col("rn") == 1, F.col("cu")))
        .cast("long")
        .alias("final_cents"),
    )


@register(
    "ts_wape_naive_eval",
    oracle=f"""
        WITH daily AS ({_DAILY_SQL}),
        l AS (SELECT event_type, d, c,
                     LAG(c, 7) OVER (PARTITION BY event_type ORDER BY d)
                       AS fc
              FROM daily)
        SELECT event_type,
               COUNT(fc) AS n_eval,
               CAST(SUM(abs(c - fc)) * 1000000 // SUM(c) AS BIGINT)
                 AS wape_ppm,
               CAST(SUM(c - fc) * 1000000 // SUM(c) AS BIGINT)
                 AS bias_ppm
        FROM l WHERE fc IS NOT NULL
        GROUP BY event_type
    """,
)
def ts_wape_naive_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORECAST BACKTEST: score the seasonal-naive forecast (value of
    7 days ago) against actuals per event_type with WAPE and signed
    bias in exact ppm — the eval loop every demand/load forecasting
    pipeline runs before trusting a fancier model, and the baseline it
    must beat.

    LAG(7) over the daily grid aligns forecast to actual with no join;
    both metrics are fraction-free single divisions over int64 cent
    sums (bias may be negative — truncating division is
    engine-verified). One shuffle total.
    """
    daily = _daily_cents(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("d")
    l = daily.withColumn("fc", F.lag("c", 7).over(w)).filter(
        F.col("fc").isNotNull()
    )
    return l.groupBy("event_type").agg(
        F.count("fc").alias("n_eval"),
        F.expr(
            "CAST(SUM(abs(c - fc)) * 1000000 div SUM(c) AS BIGINT)"
        ).alias("wape_ppm"),
        F.expr(
            "CAST(SUM(c - fc) * 1000000 div SUM(c) AS BIGINT)"
        ).alias("bias_ppm"),
    )


@register(
    "ts_burst_flags",
    oracle="""
        WITH m AS (
            SELECT event_type, date_trunc('hour', ts) AS h,
                   COUNT(*) AS c
            FROM events GROUP BY event_type, h),
        t AS (SELECT event_type, h, c,
                     CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT)
                       AS tot,
                     CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                       AS n_hours
              FROM m)
        SELECT event_type, h, c,
               CAST((c * n_hours > tot AND
                     (c * n_hours - tot) * (c * n_hours - tot)
                       > 9 * tot * n_hours) AS BIGINT) AS burst
        FROM t
    """,
)
def ts_burst_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POISSON BURST detection: flag hours whose event count exceeds
    the type's mean rate by more than 3 standard deviations UNDER THE
    POISSON MODEL (sigma = sqrt(mean)) — the traffic-spike detector for
    count data, where `agg_anomaly_flag`'s empirical-variance test
    underreacts to rare bursts. The test ``c > m + 3*sqrt(m)`` is
    cleared of the division AND the square root:
    ``(c*H - T)^2 > 9*T*H`` given ``c*H > T`` (T total, H hours) — all
    int64, order-independent, bit-identical across engines.

    One (type, hour) hash agg; totals are windows over the aggregated
    grid. Magnitudes: c*H ~ 1e9 at sf100 scales, squared ~1e18 —
    promote to DECIMAL(38,0) past ~3e9 counts/hour (documented edge).
    """
    ev = load_table(spark, sf_dir, "events")
    m = ev.groupBy(
        "event_type", F.date_trunc("HOUR", "ts").alias("h")
    ).agg(F.count("*").alias("c"))
    w = Window.partitionBy("event_type")
    t = m.select(
        "event_type",
        "h",
        "c",
        F.sum("c").over(w).cast("long").alias("tot"),
        F.count("*").over(w).cast("long").alias("n_hours"),
    )
    dev = F.col("c") * F.col("n_hours") - F.col("tot")
    return t.select(
        "event_type",
        "h",
        "c",
        (
            (F.col("c") * F.col("n_hours") > F.col("tot"))
            & (dev * dev > 9 * F.col("tot") * F.col("n_hours"))
        )
        .cast("bigint")
        .alias("burst"),
    )


@register(
    "agg_dow_seasonality_index",
    oracle=f"""
        WITH daily AS ({_DAILY_SQL}),
        dw AS (SELECT event_type, d, c,
                      CAST(dayofweek(d) + 1 AS BIGINT) AS dow  -- DuckDB 0=Sun; Spark 1=Sun
               FROM daily),
        g AS (SELECT event_type, dow,
                     CAST(SUM(c) AS BIGINT) AS dow_sum,
                     COUNT(*) AS dow_days
              FROM dw GROUP BY event_type, dow),
        t AS (SELECT event_type,
                     CAST(SUM(dow_sum) AS BIGINT) AS total_sum,
                     CAST(SUM(dow_days) AS BIGINT) AS total_days
              FROM g GROUP BY event_type)
        SELECT g.event_type, g.dow, g.dow_sum,
               CAST(CAST(g.dow_sum AS HUGEINT) * t.total_days * 1000000
                    // (CAST(t.total_sum AS HUGEINT) * g.dow_days)
                    AS BIGINT) AS seasonal_index_ppm
        FROM g JOIN t ON g.event_type = t.event_type
    """,
)
def agg_dow_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAY-OF-WEEK SEASONALITY INDEX: each weekday's mean daily total
    relative to the overall mean, in exact ppm (index 1e6 = an average
    day; retail's "Mondays run at 0.85x" table). The two means never
    materialize: the ratio is one floored division of cross products
    ``dow_sum * total_days * 1e6 div (total_sum * dow_days)`` in
    HUGEINT/DECIMAL(38,0).

    One events shuffle to the daily grid; everything after is on
    O(types x 7) rows. Complements `ts_seasonal_decompose` (which
    extracts the additive component) with the multiplicative index
    view.
    """
    daily = _daily_cents(spark, sf_dir)
    dw = daily.withColumn("dow", F.dayofweek("d").cast("long"))
    g = dw.groupBy("event_type", "dow").agg(
        F.sum("c").alias("dow_sum"), F.count("*").alias("dow_days")
    )
    t = g.groupBy("event_type").agg(
        F.sum("dow_sum").alias("total_sum"),
        F.sum("dow_days").alias("total_days"),
    )
    d38 = "CAST({} AS DECIMAL(38,0))"
    return g.join(F.broadcast(t), "event_type").selectExpr(
        "event_type",
        "dow",
        "CAST(dow_sum AS BIGINT) AS dow_sum",
        f"CAST({d38.format('dow_sum')} * {d38.format('total_days')}"
        f" * 1000000 div ({d38.format('total_sum')}"
        f" * {d38.format('dow_days')}) AS BIGINT) AS seasonal_index_ppm",
    )
