"""Statistical surface: one-pass multi-distinct, exact higher moments
(kurtosis), order-stabilized Shannon entropy, rolling median, value-based
RANGE frames, weekly resample, and a Zipf-law fit over word frequencies.

Shared discipline (SURVEY.md §2 FP note): every floating result is
derived from exact int64 partials (counts, cents, 1e6/1e9-quantized log
terms) so the final double arithmetic is a short, identically-
parenthesized formula on exactly-representable inputs — bit-equal across
engines and partition orders. The reference computes none of these (its
only aggregate is a per-day SUM, REF LogProcessor/GetData); they are the
north-star analytics layer a log-analytics engine needs at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mediaplaycounts_spark.operators import dedup as D
from mediaplaycounts_spark.queries._helpers import cents
from mediaplaycounts_spark.registry import register
from mediaplaycounts_spark.tables import load_table

# ------------------------------------------------- multi-distinct


@register(
    "agg_multi_distinct",
    oracle="""
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               COUNT(DISTINCT event_type) AS n_types,
               COUNT(DISTINCT user_id)
                 FILTER (WHERE event_type = 'purchase') AS n_purchasers
        FROM events
        GROUP BY day
    """,
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Several exact COUNT(DISTINCT) columns in ONE grouped pass —
    Catalyst rewrites the multi-distinct into a single Expand (one row
    replicated per distinct-aggregate) + two-level aggregate, so k
    distinct metrics cost one extra projection, not k scans of the fact
    table. The filtered distinct (purchasers) rides the same Expand via
    a null-padded conditional column.

    Scale: Expand multiplies shuffle rows by the number of distinct
    specs (×3 here) — bounded and predictable; when even that is too
    much at 100 TB the sketch path (`agg_approx_distinct`,
    `agg_hll_sketch_merge`) replaces exact distincts."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("DAY", "ts").cast("date").alias("day")
    ).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("n_purchasers"),
    )


# ------------------------------------------------- exact kurtosis


@register(
    "agg_kurtosis_exact",
    oracle="""
        WITH m AS (
            SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(v) AS BIGINT) AS s1,
                   CAST(SUM(v*v) AS BIGINT) AS s2,
                   CAST(SUM(v*v*v) AS BIGINT) AS s3,
                   CAST(SUM(v*v*v*v) AS BIGINT) AS s4
            FROM (SELECT event_type,
                         CAST(round(value, 0) AS BIGINT) AS v FROM events)
            GROUP BY event_type)
        SELECT event_type, n,
               round((CAST(s4 AS DOUBLE) / n
                      - 4 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
                      + 6 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                        * (CAST(s2 AS DOUBLE) / n)
                      - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                        * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                     / ((CAST(s2 AS DOUBLE) / n
                         - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                        * (CAST(s2 AS DOUBLE) / n
                           - (CAST(s1 AS DOUBLE) / n)
                             * (CAST(s1 AS DOUBLE) / n)))
                     - 3, 6) AS kurtosis
        FROM m
    """,
)
def agg_kurtosis_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excess kurtosis per event_type from exact int64 moments
    (n, Σv, Σv², Σv³, Σv⁴) — the fourth rung of the moment ladder
    (variance → correlation → skewness → kurtosis). Native `kurtosis()`
    streams doubles in partition order and is unhashable across
    engines; exact integer partials + one fixed-parenthesization double
    formula is order-independent.

    Overflow bound: |v| ≲ 10³ here so Σv⁴ ≤ 10¹²·rows — int64-safe to
    ~10⁶ rows/group; beyond that promote s4 to DECIMAL(38,0) partials
    (still partial-agg safe)."""
    ev = load_table(spark, sf_dir, "events")
    v = F.round(F.col("value"), 0).cast("long")
    m = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(v).alias("s1"),
        F.sum(v * v).alias("s2"),
        F.sum(v * v * v).alias("s3"),
        F.sum(v * v * v * v).alias("s4"),
    )
    nd = F.col("n").cast("double")
    e1 = F.col("s1").cast("double") / nd
    e2 = F.col("s2").cast("double") / nd
    e3 = F.col("s3").cast("double") / nd
    e4 = F.col("s4").cast("double") / nd
    m2 = e2 - e1 * e1
    m4 = e4 - F.lit(4) * e1 * e3 + F.lit(6) * e1 * e1 * e2 - F.lit(3) * e1 * e1 * e1 * e1
    return m.select(
        "event_type", "n", F.round(m4 / (m2 * m2) - F.lit(3), 6).alias("kurtosis")
    )


# ------------------------------------------------- Shannon entropy


@register(
    "agg_entropy_shannon",
    oracle="""
        WITH c AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   event_type, COUNT(*) AS c
            FROM events GROUP BY day, event_type),
        t AS (
            SELECT day, c,
                   CAST(SUM(c) OVER (PARTITION BY day) AS BIGINT) AS n
            FROM c)
        SELECT day, MIN(n) AS n_events,
               round(CAST(CAST(SUM(CAST(round(
                         (CAST(c AS DOUBLE) / n)
                         * ln(CAST(n AS DOUBLE) / c) * 1e9, 0) AS BIGINT))
                     AS BIGINT) AS DOUBLE) / 1e9, 6) AS entropy_nats
        FROM t GROUP BY day
    """,
)
def agg_entropy_shannon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day Shannon entropy of the event-type mix, −Σ p·ln p —
    the canonical drift/diversity monitor over a log stream. Each
    type's term p·ln(1/p) is computed from exact integer counts then
    quantized to int64 nano-units BEFORE the final sum, so the
    cross-term addition is integer and order-independent — summing 5
    raw doubles would hash differently depending on which engine adds
    them in which order.

    Scale: two hash aggregates keyed (day, type) → (day) plus one
    day-partitioned window for the totals; type cardinality is tiny so
    the second stage is a few rows per day regardless of fact volume."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy(
        F.date_trunc("DAY", "ts").cast("date").alias("day"), "event_type"
    ).agg(F.count("*").alias("c"))
    n = F.sum("c").over(Window.partitionBy("day"))
    t = c.select("day", "c", n.alias("n"))
    term = F.round(
        (F.col("c").cast("double") / F.col("n"))
        * F.log(F.col("n").cast("double") / F.col("c"))
        * F.lit(1e9),
        0,
    ).cast("long")
    return t.groupBy("day").agg(
        F.min("n").alias("n_events"),
        F.round(F.sum(term).cast("double") / F.lit(1e9), 6).alias("entropy_nats"),
    )


# ------------------------------------------------- rolling median


@register(
    "win_rolling_median",
    oracle="""
        WITH d AS (
            SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                     AS tot_cents
            FROM events GROUP BY event_type, day)
        SELECT event_type, day,
               CAST(2 * median(tot_cents) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS med2_cents
        FROM d
    """,
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day rolling MEDIAN of daily revenue per event type —
    a holistic (non-decomposable) rolling aggregate Spark has no native
    frame function for. Formulation: `collect_list` over the row frame,
    `array_sort`, pick the middle — and emit 2×median so the even-count
    interpolated midpoint stays exact int64 (no .5 doubles to hash).

    Scale: the frame is bounded (7 rows) so per-row state is O(7), not
    O(partition); the window partitions by event_type over pre-
    aggregated daily rows — thousands of rows per type even at 100 TB
    of raw events, because the daily rollup upstream collapses volume
    before any sort."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.date_trunc("DAY", "ts").cast("date").alias("day")
    ).agg(F.sum(cents("value")).alias("tot_cents"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    arr = F.array_sort(F.collect_list("tot_cents").over(w))
    med2 = F.expr(
        """
        CASE WHEN size(_arr) % 2 = 1
             THEN 2 * element_at(_arr, CAST((size(_arr) + 1) DIV 2 AS INT))
             ELSE element_at(_arr, CAST(size(_arr) DIV 2 AS INT))
                  + element_at(_arr, CAST(size(_arr) DIV 2 + 1 AS INT))
        END
        """
    )
    return (
        d.withColumn("_arr", arr)
        .withColumn("med2_cents", med2)
        .select("event_type", "day", "med2_cents")
    )


# ------------------------------------------------- value RANGE frame


@register(
    "win_range_value_frame",
    oracle="""
        WITH o AS (SELECT o_orderkey, o_orderpriority,
                          CAST(round(o_totalprice * 100, 0) AS BIGINT)
                            AS price_cents
                   FROM orders)
        SELECT o_orderkey, o_orderpriority, price_cents,
               COUNT(*) OVER w AS band_n,
               CAST(SUM(price_cents) OVER w AS BIGINT) AS band_sum_cents
        FROM o
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY price_cents
                     RANGE BETWEEN 1000000 PRECEDING AND 1000000 FOLLOWING)
    """,
)
def win_range_value_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUE-based RANGE frame (not time): for every order, the count
    and cents-sum of same-priority orders priced within ±$10,000 —
    a density/peer-band metric expressed as one window instead of a
    quadratic band self-join. RANGE frames are defined on the ORDER BY
    *value*, so tied prices land in each other's frames regardless of
    row order — deterministic where a ROWS frame would not be.

    Scale: one shuffle on the partition key + a per-partition sort;
    the frame is resolved by two binary searches per row over the
    sorted run (Spark keeps a sliding lower/upper bound — O(n log n)
    total), vs O(n²) for the equivalent band self-join."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        cents("o_totalprice").alias("price_cents"),
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("price_cents")
        .rangeBetween(-1_000_000, 1_000_000)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "price_cents",
        F.count("*").over(w).alias("band_n"),
        F.sum("price_cents").over(w).alias("band_sum_cents"),
    )


# ------------------------------------------------- weekly resample


@register(
    "ts_resample_weekly",
    oracle="""
        WITH wk AS (
            SELECT event_type,
                   CAST(date_trunc('week', ts) AS DATE) AS week,
                   CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                     AS wk_cents,
                   COUNT(*) AS n_events
            FROM events GROUP BY event_type, week)
        SELECT event_type, week, wk_cents, n_events,
               COALESCE(lag(wk_cents) OVER (PARTITION BY event_type
                                            ORDER BY week), 0) AS prev_cents,
               wk_cents - COALESCE(lag(wk_cents) OVER (
                   PARTITION BY event_type ORDER BY week), wk_cents)
                 AS delta_cents
        FROM wk
    """,
)
def ts_resample_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily log → ISO-week resample (both engines truncate weeks to
    Monday) with week-over-week deltas. The first week's delta is
    pinned to 0 via COALESCE(lag, current) — an engine-agnostic
    sentinel instead of a NULL whose hash treatment could differ.

    Scale: the resample is one hash aggregate (map-side partials make
    the shuffle carry week-level rows only); the lag window then runs
    over ~52 rows/type/year — trivially small, whatever the raw
    volume."""
    ev = load_table(spark, sf_dir, "events")
    wk = ev.groupBy(
        "event_type", F.date_trunc("week", "ts").cast("date").alias("week")
    ).agg(
        F.sum(cents("value")).alias("wk_cents"),
        F.count("*").alias("n_events"),
    )
    w = Window.partitionBy("event_type").orderBy("week")
    prev = F.lag("wk_cents").over(w)
    return wk.select(
        "event_type",
        "week",
        "wk_cents",
        "n_events",
        F.coalesce(prev, F.lit(0)).alias("prev_cents"),
        (F.col("wk_cents") - F.coalesce(prev, F.col("wk_cents"))).alias(
            "delta_cents"
        ),
    )


# ------------------------------------------------- Zipf exponent


@register(
    "text_zipf_exponent",
    oracle="""
        WITH f AS (
            SELECT lang, w, COUNT(*) AS f
            FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
                  FROM documents)
            GROUP BY lang, w),
        r AS (
            SELECT lang,
                   CAST(round(ln(CAST(row_number() OVER (
                       PARTITION BY lang ORDER BY f DESC, w ASC)
                     AS DOUBLE)) * 1e6, 0) AS BIGINT) AS x,
                   CAST(round(ln(CAST(f AS DOUBLE)) * 1e6, 0) AS BIGINT) AS y,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY f DESC, w ASC) AS rk
            FROM f),
        m AS (
            SELECT lang, COUNT(*) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx
            FROM r WHERE rk <= 100 GROUP BY lang)
        SELECT lang, n AS n_terms,
               round(CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE), 4) AS zipf_slope
        FROM m
    """,
)
def text_zipf_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law exponent per language: least-squares slope of
    ln(frequency) against ln(rank) over each language's top-100 words —
    the standard sanity check that a text corpus is natural language
    (slope ≈ −1) rather than boilerplate or spam. Log terms are
    quantized to int64 micro-units before the moment sums, so the
    regression inputs are exact integers and the closed-form slope is a
    single deterministic double division (same stabilization as
    `agg_trend_slope`, extended to log-log space).

    Scale: word counting is the dominant cost (explode + hash agg —
    identical shape to `text_tokenize_wordcount`); ranking windows run
    over vocabulary-sized tables, and the regression reduces 100
    rows/lang. Overflow: x,y ≤ ln(1e9)·1e6 ≈ 2·10⁷ → Σx·y over 100
    terms ≤ 4·10¹⁶, int64-safe with 200× margin."""
    docs = load_table(spark, sf_dir, "documents")
    f = (
        docs.select("lang", F.explode(D.tokens("text")).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count("*").alias("f"))
    )
    wr = Window.partitionBy("lang").orderBy(F.col("f").desc(), F.col("w").asc())
    r = f.select(
        "lang",
        F.row_number().over(wr).alias("rk"),
        F.col("f"),
    ).filter(F.col("rk") <= 100)
    x = F.round(F.log(F.col("rk").cast("double")) * 1e6, 0).cast("long")
    y = F.round(F.log(F.col("f").cast("double")) * 1e6, 0).cast("long")
    m = r.select("lang", x.alias("x"), y.alias("y")).groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return m.select(
        "lang",
        F.col("n").alias("n_terms"),
        F.round(num / den, 4).alias("zipf_slope"),
    )


@register(
    "win_rolling_corr",
    oracle="""
        WITH d AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(SUM(CASE WHEN event_type = 'view'
                       THEN CAST(round(value * 100, 0) AS BIGINT) END)
                       AS BIGINT) AS x,
                   CAST(SUM(CASE WHEN event_type = 'click'
                       THEN CAST(round(value * 100, 0) AS BIGINT) END)
                       AS BIGINT) AS y
            FROM events GROUP BY day),
        m AS (
            SELECT day, x, y,
                   COUNT(*) OVER w AS n,
                   CAST(SUM(x) OVER w AS BIGINT) AS sx,
                   CAST(SUM(y) OVER w AS BIGINT) AS sy,
                   CAST(SUM(x * x) OVER w AS BIGINT) AS sxx,
                   CAST(SUM(y * y) OVER w AS BIGINT) AS syy,
                   CAST(SUM(x * y) OVER w AS BIGINT) AS sxy
            FROM d
            WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        SELECT day, n,
               CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                    THEN round(
                        CAST(n * sxy - sx * sy AS DOUBLE)
                        / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                               * CAST(n * syy - sy * sy AS DOUBLE)), 6)
               END AS r7
        FROM m
    """,
)
def win_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day rolling Pearson correlation between the view and
    click daily revenue series — the co-movement monitor on a metric
    pair. All five frame sums are exact int64 over integer cents
    (order-independent); the final r is one deterministic double
    expression per row, rounded identically, NULL where a frame has
    zero variance. The single ORDER BY day window runs on the tiny
    daily grid, not raw events — a global-series window is fine when
    the series is O(days); partition by metric-pair for many series."""
    ev = load_table(spark, sf_dir, "events")
    c = F.round(F.col("value") * 100, 0).cast("long")
    d = ev.groupBy(F.date_trunc("DAY", "ts").cast("date").alias("day")).agg(
        F.sum(F.when(F.col("event_type") == "view", c)).alias("x"),
        F.sum(F.when(F.col("event_type") == "click", c)).alias("y"),
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    m = d.select(
        "day",
        F.count("*").over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
    )
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return m.select(
        "day",
        "n",
        F.when(
            (varx > 0) & (vary > 0),
            F.round(
                cov.cast("double")
                / F.sqrt(varx.cast("double") * vary.cast("double")),
                6,
            ),
        ).alias("r7"),
    )


# --------------------------------------------- CUSUM changepoint signal


@register(
    "ts_changepoint_cusum",
    oracle="""
        WITH daily AS (
            SELECT date_trunc('day', ts) AS day, COUNT(*) AS n
            FROM events WHERE event_type = 'view' GROUP BY day),
        st AS (SELECT CAST(SUM(n) AS BIGINT) AS tot,
                      CAST(COUNT(*) AS BIGINT) AS k FROM daily),
        dev AS (
            SELECT day, n,
                   n * (SELECT k FROM st) - (SELECT tot FROM st) AS dev_k
            FROM daily),
        c AS (
            SELECT day, n, dev_k,
                   SUM(dev_k) OVER (ORDER BY day
                                    ROWS UNBOUNDED PRECEDING) AS cusum_k
            FROM dev)
        SELECT day, n, CAST(cusum_k AS BIGINT) AS cusum_k,
               CAST(abs(cusum_k) = (SELECT MAX(abs(cusum_k)) FROM c)
                    AS BIGINT) AS is_peak
        FROM c
    """,
)
def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint signal over the daily play series: the running
    sum of deviations from the series mean, with the |CUSUM| peak
    flagged — the classical "where did the level shift" detector (the
    peak day is the maximum-likelihood single changepoint under a mean
    shift). INTEGER-EXACT throughout: deviations are kept as
    ``n·k − total`` (deviation × day count — scaling by k avoids the
    fractional mean entirely), so the cumulative sum is int64 and both
    engines agree bit-for-bit.

    Plan: one daily hash-agg, a 1-row total broadcast, one ordered
    running-sum window — at 100 TB the window partitions by series key
    and everything else is unchanged."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "view")
        .groupBy(F.date_trunc("DAY", "ts").alias("day"))
        .agg(F.count("*").alias("n"))
    )
    st = daily.agg(
        F.sum("n").cast("long").alias("tot"), F.count("*").cast("long").alias("k")
    )
    dev = daily.crossJoin(F.broadcast(st)).select(
        "day", "n", (F.col("n") * F.col("k") - F.col("tot")).alias("dev_k")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    c = dev.withColumn("cusum_k", F.sum("dev_k").over(w))
    peak = c.agg(F.max(F.abs("cusum_k")).alias("mx"))
    return c.crossJoin(F.broadcast(peak)).select(
        "day",
        "n",
        F.col("cusum_k").cast("long").alias("cusum_k"),
        (F.abs("cusum_k") == F.col("mx")).cast("long").alias("is_peak"),
    )


# ------------------------------------------- Wilson interval conversion


@register(
    "agg_conversion_wilson",
    oracle="""
        WITH d AS (
            SELECT date_trunc('day', ts) AS day,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS DOUBLE) AS x,
                   CAST(COUNT(*) AS DOUBLE) AS n
            FROM events GROUP BY day)
        SELECT day, CAST(x AS BIGINT) AS n_purchases, CAST(n AS BIGINT) AS n_events,
               CAST(round((x / n) * 1000000, 0) AS BIGINT) AS rate_e6,
               CAST(round(((x + 1.9208) / (n + 3.8416)
                     - (1.96 / (n + 3.8416))
                       * sqrt(x * (n - x) / n + 0.9604)) * 1000000, 0)
                    AS BIGINT) AS wilson_lo_e6,
               CAST(round(((x + 1.9208) / (n + 3.8416)
                     + (1.96 / (n + 3.8416))
                       * sqrt(x * (n - x) / n + 0.9604)) * 1000000, 0)
                    AS BIGINT) AS wilson_hi_e6
        FROM d
    """,
)
def agg_conversion_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day conversion rate with a 95% WILSON score interval — the
    uncertainty-aware ratio metric dashboards should show instead of
    the raw rate (a 1/3 day and a 1000/3000 day have the same rate and
    wildly different intervals). Bit-exact across engines: the interval
    uses only +,−,×,/ and sqrt — all IEEE-correctly-rounded operations
    (sqrt is NOT a transcendental-approximation case) — micro-quantized
    with the shared round() convention.

    One hash-agg; the interval math is per-row codegen."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("DAY", "ts").alias("day")).agg(
        F.sum((F.col("event_type") == "purchase").cast("int"))
        .cast("double")
        .alias("x"),
        F.count("*").cast("double").alias("n"),
    )
    z, z2 = 1.96, 1.96 * 1.96
    center = (F.col("x") + z2 / 2) / (F.col("n") + z2)
    half = (z / (F.col("n") + z2)) * F.sqrt(
        F.col("x") * (F.col("n") - F.col("x")) / F.col("n") + z2 / 4
    )
    return d.select(
        "day",
        F.col("x").cast("long").alias("n_purchases"),
        F.col("n").cast("long").alias("n_events"),
        F.round((F.col("x") / F.col("n")) * 1000000, 0)
        .cast("long")
        .alias("rate_e6"),
        F.round((center - half) * 1000000, 0).cast("long").alias("wilson_lo_e6"),
        F.round((center + half) * 1000000, 0).cast("long").alias("wilson_hi_e6"),
    )


# ------------------------------------------- two-proportion A/B z-test


@register(
    "agg_ab_test_proportions",
    oracle="""
        WITH v AS (
            SELECT CAST(user_id % 2 AS BIGINT) AS variant,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS DOUBLE) AS x,
                   CAST(COUNT(*) AS DOUBLE) AS n
            FROM events GROUP BY variant),
        w AS (
            SELECT MAX(CASE WHEN variant = 0 THEN x END) AS x0,
                   MAX(CASE WHEN variant = 0 THEN n END) AS n0,
                   MAX(CASE WHEN variant = 1 THEN x END) AS x1,
                   MAX(CASE WHEN variant = 1 THEN n END) AS n1
            FROM v)
        SELECT CAST(x0 AS BIGINT) AS conv_a, CAST(n0 AS BIGINT) AS n_a,
               CAST(x1 AS BIGINT) AS conv_b, CAST(n1 AS BIGINT) AS n_b,
               CAST(round((x1 / n1 - x0 / n0) * 1000000, 0) AS BIGINT)
                 AS lift_e6,
               CAST(round(((x1 / n1 - x0 / n0)
                     / sqrt(((x0 + x1) / (n0 + n1))
                            * (1 - (x0 + x1) / (n0 + n1))
                            * (1 / n0 + 1 / n1))) * 1000, 0) AS BIGINT)
                 AS z_e3,
               CAST(abs((x1 / n1 - x0 / n0)
                     / sqrt(((x0 + x1) / (n0 + n1))
                            * (1 - (x0 + x1) / (n0 + n1))
                            * (1 / n0 + 1 / n1))) >= 1.96 AS BIGINT)
                 AS significant
        FROM w
    """,
)
def agg_ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test for an A/B experiment (variant = user_id
    parity, the deterministic stand-in for an assignment column):
    pooled-variance z-score of the purchase-rate lift plus a 95%
    significance flag — the experiment readout every product team runs.
    Bit-exact across engines: only +,−,×,/ and sqrt (IEEE-correctly-
    rounded), z milli-quantized with the shared round() convention.

    One hash-agg by variant; the test statistic is a 1-row pivot."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.groupBy((F.col("user_id") % 2).cast("long").alias("variant")).agg(
        F.sum((F.col("event_type") == "purchase").cast("int"))
        .cast("double")
        .alias("x"),
        F.count("*").cast("double").alias("n"),
    )
    w = v.agg(
        F.max(F.when(F.col("variant") == 0, F.col("x"))).alias("x0"),
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 1, F.col("x"))).alias("x1"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
    )
    p0, p1 = F.col("x0") / F.col("n0"), F.col("x1") / F.col("n1")
    pp = (F.col("x0") + F.col("x1")) / (F.col("n0") + F.col("n1"))
    z = (p1 - p0) / F.sqrt(pp * (1 - pp) * (1 / F.col("n0") + 1 / F.col("n1")))
    return w.select(
        F.col("x0").cast("long").alias("conv_a"),
        F.col("n0").cast("long").alias("n_a"),
        F.col("x1").cast("long").alias("conv_b"),
        F.col("n1").cast("long").alias("n_b"),
        F.round((p1 - p0) * 1000000, 0).cast("long").alias("lift_e6"),
        F.round(z * 1000, 0).cast("long").alias("z_e3"),
        (F.abs(z) >= 1.96).cast("long").alias("significant"),
    )


# ------------------------------------------------------- winsorization


@register(
    "agg_winsorize_stats",
    oracle="""
        WITH caps AS (
            SELECT event_type,
                   quantile_cont(value, 0.05) AS lo,
                   quantile_cont(value, 0.95) AS hi
            FROM events GROUP BY event_type)
        SELECT e.event_type,
               COUNT(*) AS n,
               CAST(SUM(CASE WHEN e.value < c.lo THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_floor,
               CAST(SUM(CASE WHEN e.value > c.hi THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_ceil,
               CAST(SUM(CAST(round(
                    CASE WHEN e.value < c.lo THEN c.lo
                         WHEN e.value > c.hi THEN c.hi
                         ELSE e.value END * 100, 0) AS BIGINT)) AS BIGINT)
                 AS winsorized_cents
        FROM events e JOIN caps c ON e.event_type = c.event_type
        GROUP BY e.event_type
    """,
)
def agg_winsorize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINSORIZATION (outlier capping at p5/p95) per segment — the
    robust-statistics cleaning step before any mean-based metric:
    per-type exact percentile caps (linear interpolation, both engines
    agree), values clamped into [p5, p95], capped-row counts and the
    cents-exact winsorized total reported. The caps table is
    |event_type| rows, broadcast back onto the fact scan — two passes
    total (one for caps, one for clamping), which is the minimum for
    exact quantile caps; at 100 TB swap the exact percentile for the
    GK sketch (`agg_approx_percentile`) and the second pass is
    unchanged."""
    ev = load_table(spark, sf_dir, "events")
    caps = ev.groupBy("event_type").agg(
        F.percentile("value", 0.05).alias("lo"),
        F.percentile("value", 0.95).alias("hi"),
    )
    j = ev.join(F.broadcast(caps), "event_type")
    clamped = F.when(F.col("value") < F.col("lo"), F.col("lo")).when(
        F.col("value") > F.col("hi"), F.col("hi")
    ).otherwise(F.col("value"))
    return j.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum((F.col("value") < F.col("lo")).cast("int"))
        .cast("long")
        .alias("n_floor"),
        F.sum((F.col("value") > F.col("hi")).cast("int"))
        .cast("long")
        .alias("n_ceil"),
        F.sum(F.round(clamped * 100, 0).cast("long")).cast("long").alias(
            "winsorized_cents"
        ),
    )


# ---------------------------------------------------- Benford digit test


#: Benford expected first-digit shares in ppm (log10(1+1/d), hardcoded
#: identically in the Spark plan and the oracle — no ln at query time).
_BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910,
    5: 79181, 6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


@register(
    "agg_benford_digit_test",
    oracle=f"""
        WITH v AS (
            SELECT CAST(substring(CAST(CAST(round(value * 100, 0) AS BIGINT)
                                       AS VARCHAR), 1, 1) AS BIGINT) AS d
            FROM events WHERE value >= 0.01),
        c AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY d),
        t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
        exp AS (SELECT * FROM (VALUES
            {", ".join(f"({d}, {p})" for d, p in sorted(_BENFORD_PPM.items()))})
            AS e(d, exp_ppm))
        SELECT exp.d AS digit, COALESCE(c.n, 0) AS n,
               CAST(COALESCE(c.n, 0) * 1000000 // t.total AS BIGINT)
                 AS obs_ppm,
               CAST(exp.exp_ppm AS BIGINT) AS exp_ppm,
               CAST(abs(COALESCE(c.n, 0) * 1000000 // t.total - exp.exp_ppm)
                    AS BIGINT) AS dev_ppm
        FROM exp LEFT JOIN c ON exp.d = c.d CROSS JOIN t
    """,
)
def agg_benford_digit_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENFORD first-digit test over transaction values — the
    fraud/data-fabrication screen (organically-generated magnitudes
    follow log10(1+1/d); fabricated or truncated data doesn't).
    Digits come from the cents-quantized integer (no float formatting
    ambiguity); expected shares are hardcoded ppm constants identical
    in both engines (no ln at query time); deviations are integer ppm.
    The 9-row digit spine LEFT-joins the counts so missing digits
    surface as 0-count rows rather than vanishing.

    One hash agg + 1-row total broadcast onto a 9-row literal spine."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("value") >= 0.01).select(
        F.substring(
            F.round(F.col("value") * 100, 0).cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("d")
    )
    c = v.groupBy("d").agg(F.count("*").cast("long").alias("n"))
    t = c.agg(F.sum("n").cast("long").alias("total"))
    exp = spark.createDataFrame(
        sorted(_BENFORD_PPM.items()), "d long, exp_ppm long"
    )
    return (
        exp.join(c, "d", "left")
        .crossJoin(F.broadcast(t))
        .select(
            F.col("d").alias("digit"),
            F.coalesce("n", F.lit(0)).alias("n"),
            F.expr(
                "cast(coalesce(n, 0) * 1000000 div total as bigint)"
            ).alias("obs_ppm"),
            F.col("exp_ppm").cast("long").alias("exp_ppm"),
            F.expr(
                "cast(abs(coalesce(n, 0) * 1000000 div total - exp_ppm) as bigint)"
            ).alias("dev_ppm"),
        )
    )


# ------------------------------------------- categorical independence


@register(
    "agg_chi_square_independence",
    oracle="""
        WITH cells AS (
            SELECT event_type,
                   CASE WHEN CAST(round(value * 100, 0) AS BIGINT) >= 3500
                        THEN 'hi' ELSE 'lo' END AS bucket,
                   COUNT(*) AS o
            FROM events GROUP BY 1, 2),
        tot AS (
            SELECT event_type, bucket, o,
                   SUM(o) OVER (PARTITION BY event_type) AS r,
                   SUM(o) OVER (PARTITION BY bucket) AS c,
                   SUM(o) OVER () AS n
            FROM cells)
        SELECT event_type, bucket, o,
               CAST((CAST(r AS HUGEINT) * CAST(c AS HUGEINT) * 1000000)
                    // CAST(n AS HUGEINT) AS BIGINT) AS expected_ppm,
               CAST(((CAST(o AS HUGEINT) * CAST(n AS HUGEINT)
                      - CAST(r AS HUGEINT) * CAST(c AS HUGEINT))
                     * (CAST(o AS HUGEINT) * CAST(n AS HUGEINT)
                        - CAST(r AS HUGEINT) * CAST(c AS HUGEINT))
                     * 1000000)
                    // (CAST(r AS HUGEINT) * CAST(c AS HUGEINT)
                        * CAST(n AS HUGEINT)) AS BIGINT) AS chi2_ppm
        FROM tot
    """,
)
def agg_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence screen for a contingency table
    (event_type x value-magnitude bucket), per-cell contributions in
    EXACT integer millionths — the categorical drift / A-B sanity test
    a feature store runs before trusting a segmentation.

    Exactness: the float formula (O-E)^2/E is division-first and
    engine-rounding-dependent; cleared of fractions it is
    ((O*N - R*C)^2 * 1e6) div (R*C*N) over wide integers — Spark does
    the products in DECIMAL(38,0) (intermediates reach ~5e26, past
    int64), DuckDB in HUGEINT, and both take one integral division at
    the end, so the ppm values are bit-identical.

    Plan: one hash agg over events to the O(types x buckets) cell table,
    then three window totals + codegen arithmetic on ~10 rows — the raw
    table is touched once regardless of scale; marginals are windows
    over cells, never a second scan.
    """
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type",
        F.when(cents("value") >= 3500, F.lit("hi"))
        .otherwise(F.lit("lo"))
        .alias("bucket"),
    ).agg(F.count("*").alias("o"))
    tot = cells.select(
        "event_type",
        "bucket",
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("r"),
        F.sum("o").over(Window.partitionBy("bucket")).alias("c"),
        F.sum("o").over(
            Window.partitionBy()
        ).alias("n"),
    )
    d38 = "decimal(38,0)"
    od, rd, cd, nd = (F.col(x).cast(d38) for x in ("o", "r", "c", "n"))
    dev = od * nd - rd * cd
    return tot.select(
        "event_type",
        "bucket",
        "o",
        F.expr(
            "CAST((CAST(r AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0))"
            " * 1000000) div CAST(n AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("expected_ppm"),
        (
            (dev * dev * F.lit(1000000).cast(d38))
            .cast(d38)
        ).alias("_num"),
        (rd * cd * nd).alias("_den"),
    ).select(
        "event_type",
        "bucket",
        "o",
        "expected_ppm",
        F.expr("CAST(_num div _den AS BIGINT)").alias("chi2_ppm"),
    )


# --------------------------------------------- multivariate regression


@register(
    "agg_ols_normal_eq",
    oracle="""
        WITH m AS (
            SELECT l_returnflag,
                   COUNT(*) AS n,
                   SUM(CAST(round(l_quantity, 0) AS BIGINT)) AS sx1,
                   SUM(CAST(round(l_discount * 100, 0) AS BIGINT)) AS sx2,
                   SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS sy,
                   SUM(CAST(round(l_quantity, 0) AS BIGINT)
                       * CAST(round(l_quantity, 0) AS BIGINT)) AS sx1x1,
                   SUM(CAST(round(l_discount * 100, 0) AS BIGINT)
                       * CAST(round(l_discount * 100, 0) AS BIGINT)) AS sx2x2,
                   SUM(CAST(round(l_quantity, 0) AS BIGINT)
                       * CAST(round(l_discount * 100, 0) AS BIGINT)) AS sx1x2,
                   SUM(CAST(round(l_quantity, 0) AS BIGINT)
                       * CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                     AS sx1y,
                   SUM(CAST(round(l_discount * 100, 0) AS BIGINT)
                       * CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                     AS sx2y
            FROM lineitem GROUP BY l_returnflag),
        c AS (
            SELECT l_returnflag, n,
                   n * sx1x1 - sx1 * sx1 AS a11,
                   n * sx2x2 - sx2 * sx2 AS a22,
                   n * sx1x2 - sx1 * sx2 AS a12,
                   n * sx1y - sx1 * sy AS b1,
                   n * sx2y - sx2 * sy AS b2
            FROM m)
        SELECT l_returnflag, CAST(n AS BIGINT) AS n,
               CAST((a22 * b1 - a12 * b2) * 1000
                    // (a11 * a22 - a12 * a12) AS BIGINT) AS slope_qty_e3,
               CAST((a11 * b2 - a12 * b1) * 1000
                    // (a11 * a22 - a12 * a12) AS BIGINT) AS slope_disc_e3
        FROM c
    """,
)
def agg_ols_normal_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multivariate OLS via DISTRIBUTED NORMAL EQUATIONS: regress
    line-item price (cents) on quantity and discount-pct per return
    flag — one scan accumulates the 9 integer moment sums
    (map-side-combinable, the X^T X pattern that scales to any row
    count), then the 2x2 system is solved in closed form on the
    O(groups) moment table.

    Exactness: raw moments are int64 sums of per-row integer products;
    the centered cross-moments (n*Sxy - Sx*Sy reach ~1e20 at sf0.1,
    past int64) and the Cramer's-rule solve run in DECIMAL(38,0) on
    Spark / HUGEINT on DuckDB, with slopes emitted as one floored
    integral division in milli-units — bit-identical, no float algebra
    anywhere. This is the moment-ladder family (kurtosis, trend_slope)
    extended from univariate to a true linear system.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x1 = F.round(F.col("l_quantity"), 0).cast("long")
    x2 = F.round(F.col("l_discount") * 100, 0).cast("long")
    y = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x1).alias("sx1"),
        F.sum(x2).alias("sx2"),
        F.sum(y).alias("sy"),
        F.sum(x1 * x1).alias("sx1x1"),
        F.sum(x2 * x2).alias("sx2x2"),
        F.sum(x1 * x2).alias("sx1x2"),
        F.sum(x1 * y).alias("sx1y"),
        F.sum(x2 * y).alias("sx2y"),
    )
    d = "CAST({} AS DECIMAL(38,0))"
    cols = {c: d.format(c) for c in
            ("n", "sx1", "sx2", "sy", "sx1x1", "sx2x2", "sx1x2", "sx1y", "sx2y")}
    c = m.selectExpr(
        "l_returnflag",
        "n",
        f"{cols['n']} * {cols['sx1x1']} - {cols['sx1']} * {cols['sx1']} AS a11",
        f"{cols['n']} * {cols['sx2x2']} - {cols['sx2']} * {cols['sx2']} AS a22",
        f"{cols['n']} * {cols['sx1x2']} - {cols['sx1']} * {cols['sx2']} AS a12",
        f"{cols['n']} * {cols['sx1y']} - {cols['sx1']} * {cols['sy']} AS b1",
        f"{cols['n']} * {cols['sx2y']} - {cols['sx2']} * {cols['sy']} AS b2",
    )
    return c.selectExpr(
        "l_returnflag",
        "CAST(n AS BIGINT) AS n",
        "CAST((a22 * b1 - a12 * b2) * 1000"
        " div (a11 * a22 - a12 * a12) AS BIGINT) AS slope_qty_e3",
        "CAST((a11 * b2 - a12 * b1) * 1000"
        " div (a11 * a22 - a12 * a12) AS BIGINT) AS slope_disc_e3",
    )


# ------------------------------------- exact weighted median (round 4)


@register(
    "agg_weighted_median",
    oracle="""
        WITH w AS (
            SELECT event_type,
                   CAST(round(value * 100, 0) AS BIGINT) AS cents,
                   user_id
            FROM events WHERE value > 0),
        o AS (
            SELECT event_type, cents, user_id,
                   SUM(cents) OVER (PARTITION BY event_type
                                    ORDER BY cents, user_id
                                    ROWS UNBOUNDED PRECEDING) AS cum_w,
                   SUM(cents) OVER (PARTITION BY event_type) AS tot_w
            FROM w)
        SELECT event_type,
               MIN(cents) AS weighted_median_cents,
               CAST(MIN(tot_w) AS BIGINT) AS total_weight_cents
        FROM o WHERE cum_w * 2 >= tot_w
        GROUP BY event_type
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT WEIGHTED MEDIAN per event type: the smallest value v such
    that the cumulative weight of rows ≤ v reaches half the total
    weight, with each row self-weighted by its cents value — the
    revenue-weighted "typical transaction" that the unweighted median
    (`agg_percentile`) misrepresents whenever a few large values carry
    most of the mass.

    One ordered cumulative-sum window per type + one min-filter — all
    integer cents arithmetic (cum*2 >= total avoids any halving
    division), deterministic tie-break via (cents, user_id) ordering.
    At 100 TB the per-type sort becomes the same range-partitioned sort
    every exact-percentile op pays; the KLL sketch keys are the
    documented approximation path when exactness isn't required.
    """
    ev = load_table(spark, sf_dir, "events")
    w = ev.filter(F.col("value") > 0).select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        "user_id",
    )
    cum = F.sum("cents").over(
        Window.partitionBy("event_type")
        .orderBy("cents", "user_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = F.sum("cents").over(Window.partitionBy("event_type"))
    o = w.select(
        "event_type", "cents", cum.alias("cum_w"), tot.alias("tot_w")
    )
    return (
        o.filter(F.col("cum_w") * 2 >= F.col("tot_w"))
        .groupBy("event_type")
        .agg(
            F.min("cents").alias("weighted_median_cents"),
            F.min("tot_w").alias("total_weight_cents"),
        )
    )


# ---------------------------- Poisson-bootstrap CI (round 4)

#: Inverse-CDF integer thresholds for Poisson(1) on a 32-bit uniform
#: (round(cum_prob * 2^32); tail mass collapses into weight 5).
_POIS_THRESH = (1580030169, 3160060338, 3950075422, 4213413784, 4279248374)
_N_BOOT = 16


def _boot_weight_sql(b: int, id_expr: str, hex_fn) -> str:
    """Poisson(1) weight for resample ``b`` from a 32-bit md5 slice —
    identical text in both engines except the hex→int idiom."""
    u = hex_fn(f"md5(concat(cast({id_expr} as varchar), ':', '{b}'))")
    cases = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_POIS_THRESH)
    )
    return f"(CASE {cases} ELSE 5 END)"


def _boot_weight_spark(b: int, id_expr: str) -> str:
    return _boot_weight_sql(
        b, id_expr, lambda m: f"conv(substring({m}, 1, 8), 16, 10)"
    ).replace("as varchar", "as string")


def _boot_weight_duck(b: int, id_expr: str) -> str:
    return _boot_weight_sql(
        b, id_expr, lambda m: f"TRY_CAST('0x' || substr({m}, 1, 8) AS BIGINT)"
    )


def _bootstrap_oracle() -> str:
    sums = ",\n               ".join(
        f"CAST(SUM({_boot_weight_duck(b, 'event_id')} * cents) AS BIGINT)"
        f" AS sx{b},\n               "
        f"CAST(SUM({_boot_weight_duck(b, 'event_id')}) AS BIGINT) AS sw{b}"
        for b in range(_N_BOOT)
    )
    means = ", ".join(
        f"sx{b} * 1000000 // sw{b}" for b in range(_N_BOOT)
    )
    return f"""
        WITH w AS (
            SELECT event_type, event_id,
                   CAST(round(value * 100, 0) AS BIGINT) AS cents
            FROM events),
        s AS (
            SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(cents) AS BIGINT) AS sum_cents,
               {sums}
            FROM w GROUP BY event_type)
        SELECT event_type, n,
               CAST(sum_cents * 1000000 // n AS BIGINT) AS mean_cents_ppm,
               CAST(list_min([{means}]) AS BIGINT) AS boot_lo_ppm,
               CAST(list_max([{means}]) AS BIGINT) AS boot_hi_ppm
        FROM s
    """


@register("agg_bootstrap_ci_poisson", oracle=_bootstrap_oracle())
def agg_bootstrap_ci_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POISSON BOOTSTRAP confidence band for the per-type mean — the
    distributed bootstrap (the classic resample-with-replacement is
    impossible on a distributed corpus; Poisson(1) weights per row per
    resample are free, embarrassingly parallel, and statistically
    equivalent at scale). 16 resamples run as 32 CONDITIONAL SUMS in
    ONE hash aggregate (the simhash trick — no row replication, no
    extra pass): weight_b(row) comes from an md5 inverse-CDF lookup,
    deterministic and engine-identical, so even the resampling is
    value-oracled. Band = min/max of the 16 resample means (exact
    integer ppm; a production run uses B=200 and p2.5/p97.5 — same
    plan shape, wider CASE).

    Scale: one map-side-combinable aggregate over the fact, output one
    row per type. Nothing about B touches shuffle volume.
    """
    ev = load_table(spark, sf_dir, "events")
    w = ev.selectExpr(
        "event_type",
        "event_id",
        "CAST(round(value * 100, 0) AS BIGINT) AS cents",
    )
    aggs = []
    for b in range(_N_BOOT):
        wexp = _boot_weight_spark(b, "event_id")
        aggs.append(f"CAST(SUM({wexp} * cents) AS BIGINT) AS sx{b}")
        aggs.append(f"CAST(SUM({wexp}) AS BIGINT) AS sw{b}")
    s = w.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("cents").cast("long").alias("sum_cents"),
        *[F.expr(a.rsplit(" AS ", 1)[0]).alias(a.rsplit(" AS ", 1)[1]) for a in aggs],
    )
    means = ", ".join(f"sx{b} * 1000000 div sw{b}" for b in range(_N_BOOT))
    return s.selectExpr(
        "event_type",
        "n",
        "CAST(sum_cents * 1000000 div n AS BIGINT) AS mean_cents_ppm",
        f"CAST(array_min(array({means})) AS BIGINT) AS boot_lo_ppm",
        f"CAST(array_max(array({means})) AS BIGINT) AS boot_hi_ppm",
    )


# ------------------------------------- one-way ANOVA (round 4)


@register(
    "agg_anova_oneway",
    oracle="""
        WITH g AS (
            SELECT event_type,
                   COUNT(*) AS n_g,
                   CAST(SUM(CAST(round(value * 100, 0) AS BIGINT))
                        AS BIGINT) AS s_g,
                   CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)
                            * CAST(round(value * 100, 0) AS BIGINT))
                        AS BIGINT) AS q_g
            FROM events GROUP BY event_type),
        t AS (SELECT CAST(SUM(n_g) AS BIGINT) AS n,
                     CAST(SUM(s_g) AS BIGINT) AS s,
                     COUNT(*) AS k
              FROM g),
        terms AS (
            SELECT CAST(round(CAST(q_g AS DOUBLE)
                        - CAST(s_g AS DOUBLE) * s_g / n_g, 0) AS BIGINT)
                     AS ssw_g,
                   CAST(round(CAST(s_g AS DOUBLE) * s_g / n_g, 0)
                        AS BIGINT) AS sb_g
            FROM g)
        SELECT t.k, t.n,
               CAST(SUM(terms.ssw_g) AS BIGINT) AS ssw_cents2,
               CAST(SUM(terms.sb_g)
                    - CAST(round(CAST(t.s AS DOUBLE) * t.s / t.n, 0)
                           AS BIGINT) AS BIGINT) AS ssb_cents2,
               CAST(CAST(SUM(terms.sb_g)
                         - CAST(round(CAST(t.s AS DOUBLE) * t.s / t.n, 0)
                                AS BIGINT) AS HUGEINT)
                    * (t.n - t.k) * 1000000
                    // (CAST(SUM(terms.ssw_g) AS HUGEINT)
                        * (t.k - 1)) AS BIGINT) AS f_stat_ppm
        FROM terms CROSS JOIN t
        GROUP BY t.k, t.n, t.s
    """,
)
def agg_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-WAY ANOVA across event types: between-group vs within-group
    variance of the value column, F = (SSB/(k−1)) / (SSW/(n−k)) — the
    'does the group label matter at all' omnibus test that precedes
    any pairwise A/B comparison (`agg_ab_test_proportions` tests two
    proportions; this tests k means at once).

    Determinism discipline: per-group moments (n, Σcents, Σcents²) are
    exact int64; each group's quadratic term S²/n is ONE double op on
    exact integers (≤2^53, exact), ROUNDED TO INTEGER cents² before
    the cross-group sums — so the only floats are per-group scalars
    with identical operand order in both engines, and the sums and
    final F ratio are integer/DECIMAL(38,0) arithmetic (ppm floor).

    Scale: one map-side-combinable moments agg (k rows out), then
    driver-free scalar algebra on the k-row table. Linear, one shuffle.
    """
    ev = load_table(spark, sf_dir, "events")
    g = ev.selectExpr(
        "event_type", "CAST(round(value * 100, 0) AS BIGINT) AS cents"
    ).groupBy("event_type").agg(
        F.count("*").alias("n_g"),
        F.sum("cents").cast("long").alias("s_g"),
        F.sum(F.col("cents") * F.col("cents")).cast("long").alias("q_g"),
    )
    t = g.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s_g").cast("long").alias("s"),
        F.count("*").alias("k"),
    )
    terms = g.selectExpr(
        "CAST(round(CAST(q_g AS DOUBLE)"
        " - CAST(s_g AS DOUBLE) * s_g / n_g, 0) AS BIGINT) AS ssw_g",
        "CAST(round(CAST(s_g AS DOUBLE) * s_g / n_g, 0) AS BIGINT)"
        " AS sb_g",
    )
    return (
        terms.crossJoin(F.broadcast(t))
        .groupBy("k", "n", "s")
        .agg(
            F.sum("ssw_g").cast("long").alias("ssw_cents2"),
            F.expr(
                "CAST(SUM(sb_g) - CAST(round(CAST(MIN(s) AS DOUBLE)"
                " * MIN(s) / MIN(n), 0) AS BIGINT) AS BIGINT)"
            ).alias("ssb_cents2"),
            F.expr(
                "CAST(CAST(SUM(sb_g) - CAST(round(CAST(MIN(s) AS DOUBLE)"
                " * MIN(s) / MIN(n), 0) AS BIGINT) AS DECIMAL(38,0))"
                " * (MIN(n) - MIN(k)) * 1000000"
                " div (CAST(SUM(ssw_g) AS DECIMAL(38,0)) * (MIN(k) - 1))"
                " AS BIGINT)"
            ).alias("f_stat_ppm"),
        )
        .select("k", "n", "ssw_cents2", "ssb_cents2", "f_stat_ppm")
    )


# ------------------------------- Kaplan-Meier survival (round 4)


@register(
    "agg_survival_km",
    oracle="""
        WITH daily AS (
            SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE)
                     AS d
            FROM events),
        mx AS (SELECT MAX(d) AS last_day FROM daily),
        u AS (
            SELECT user_id,
                   date_diff('day', MIN(d), MAX(d)) AS lifetime,
                   CAST(MAX(d) = mx.last_day AS INT) AS censored
            FROM daily CROSS JOIN mx
            GROUP BY user_id, mx.last_day),
        lt AS (
            SELECT lifetime,
                   COUNT(*) AS n_at,
                   CAST(SUM(1 - censored) AS BIGINT) AS n_deaths,
                   CAST(SUM(censored) AS BIGINT) AS n_censored
            FROM u GROUP BY lifetime),
        r AS (
            SELECT *,
                   CAST(SUM(n_at) OVER (ORDER BY lifetime DESC
                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
                     AS n_risk
            FROM lt),
        steps AS (
            SELECT lifetime, n_risk, n_deaths, n_censored,
                   CASE WHEN n_deaths > 0
                        THEN CAST(round(ln(CAST(n_risk - n_deaths AS DOUBLE)
                                           / n_risk) * 1e9, 0) AS BIGINT)
                        ELSE 0 END AS step_nano
            FROM r)
        SELECT CAST(lifetime AS BIGINT) AS t_days, n_risk, n_deaths,
               n_censored,
               CAST(SUM(step_nano) OVER (ORDER BY lifetime
                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS cum_log_surv_nano
        FROM steps
    """,
)
def agg_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KAPLAN-MEIER survival curve of user lifetimes (days between
    first and last activity), with RIGHT-CENSORING: users still active
    on the corpus's final day have not 'died', so they contribute to
    the at-risk denominator at every step but never to the deaths —
    dropping them (or counting them as churned) is the classic
    retention-analysis bias this estimator exists to fix.

    Per step: S(t) = Π (1 − d_i/n_i). Each factor's log is ONE double
    op on exact integer counts, quantized to int64 nano-nats before
    the cumulative window (the entropy-family discipline) — the curve
    ships as cumulative LOG-survival, integer-exact and
    order-independent; exp() never runs in either engine, so no
    cross-libm rounding can leak in. At-risk counts come from one
    descending cumulative window over the tiny lifetime histogram.

    Scale: one distinct (user, day) shuffle + one user agg; everything
    after operates on the ≤|days| histogram.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
    ).distinct()
    mx = daily.agg(F.max("d").alias("last_day"))
    u = (
        daily.crossJoin(F.broadcast(mx))
        .groupBy("user_id", "last_day")
        .agg(F.min("d").alias("first_d"), F.max("d").alias("last_d"))
        .select(
            F.datediff("last_d", "first_d").alias("lifetime"),
            (F.col("last_d") == F.col("last_day")).cast("int").alias(
                "censored"
            ),
        )
    )
    lt = u.groupBy("lifetime").agg(
        F.count("*").alias("n_at"),
        F.sum(1 - F.col("censored")).cast("long").alias("n_deaths"),
        F.sum("censored").cast("long").alias("n_censored"),
    )
    r = lt.withColumn(
        "n_risk",
        F.sum("n_at")
        .over(
            Window.orderBy(F.desc("lifetime")).rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .cast("long"),
    )
    steps = r.withColumn(
        "step_nano",
        F.when(
            F.col("n_deaths") > 0,
            F.round(
                F.log(
                    (F.col("n_risk") - F.col("n_deaths")).cast("double")
                    / F.col("n_risk")
                )
                * F.lit(1e9),
                0,
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return steps.select(
        F.col("lifetime").cast("long").alias("t_days"),
        "n_risk",
        "n_deaths",
        "n_censored",
        F.sum("step_nano")
        .over(
            Window.orderBy("lifetime").rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .cast("long")
        .alias("cum_log_surv_nano"),
    )
