"""Time-series similarity / pattern queries over the events table —
subsequence search, rolling anomaly detection, PAA/SAX discretization
(engine extension per SURVEY §7.5's time-series similarity line; the
reference has no TS matching).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vptstools_spark.io import table
from vptstools_spark.operators.tsmatch import (
    cusum_stats,
    paa_symbols,
    rolling_zscore_anomalies,
    subsequence_search,
)

#: the literal query pattern for subsequence search: a monotone ramp.
#: Z-normalization makes the match scale/offset-invariant, so this finds
#: the 25 most steadily-rising length-8 runs anywhere in any user's series.
RAMP = [float(i) for i in range(1, 9)]


def q_ts_subseq_match(spark: SparkSession, sf: str) -> DataFrame:
    """Top-25 z-normalized subsequence matches of a ramp pattern across all
    user series: bounded per-key window frames + JVM higher-order distance,
    global top-k via orderBy+limit (TakeOrderedAndProject)."""
    e = table(spark, sf, "events")
    hits = subsequence_search(e, RAMP, top_k=25)
    return hits.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("start_ts"),
        F.col("event_id").alias("start_event_id"),
        "dist",
    )


def q_ts_anomaly_zscore(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling z-score anomalies: value > 2.5 sigma from the mean of the
    preceding 20 same-user observations (>=10 of history required). One
    bounded per-key window — the batch twin of a watermarked stream."""
    e = table(spark, sf, "events")
    hits = rolling_zscore_anomalies(e, lookback=20, min_history=10, threshold=2.5)
    return hits.select(
        "user_id",
        F.col("event_id").alias("event_id"),
        F.round(F.col("value").cast("double"), 2).alias("value"),
        "zscore",
    )


def q_ts_paa_sax(spark: SparkSession, sf: str) -> DataFrame:
    """PAA segment means + SAX symbols (segment_len=10, fixed breakpoints):
    the discretization front of indexable TS search. Row-number window then
    one hash aggregation on (user, segment)."""
    e = table(spark, sf, "events").filter(F.col("user_id") < 40)
    return paa_symbols(e, segment_len=10, breakpoints=(20.0, 45.0, 90.0))


def q_ts_cusum(spark: SparkSession, sf: str) -> DataFrame:
    """Two-sided CUSUM level-shift detection per user series
    (`operators/tsmatch.py:cusum_stats`): slack 0.5σ, alarm at 4σ. The
    max(0, …) recurrence runs as running-sum − running-min windows over one
    key exchange; μ/σ are pre-rounded so the sequential window arithmetic
    is IEEE-identical in any engine."""
    e = table(spark, sf, "events")
    out = cusum_stats(e, slack=0.5, threshold=4.0)
    return out.filter(
        (F.col("n_up_alarms") > 0) | (F.col("n_down_alarms") > 0)
    ).orderBy("user_id")


def q_ewma_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Exponentially-weighted moving average of monthly revenue
    (pandas' adjust=True form: ewma_t = sum w^(t-i) x_i / sum w^(t-i)).
    The fact table folds to one DECIMAL-exact monthly aggregate first;
    the weighting is a self-join over that <=100-row series, so the
    quadratic term is over months, never rows. Decay w = 0.5 because
    2^-k is EXACT in binary floating point — cross-engine-reproducible
    where pow(0.7, k) is not (verify skill, round-3 gotchas)."""
    o = table(spark, sf, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("rev")
    )
    cur = monthly.select(F.col("month").alias("m"), F.col("rev").alias("x"))
    past = monthly.select(
        F.col("month").alias("m0"), F.col("rev").alias("x0")
    )
    k = F.months_between(F.col("m"), F.col("m0"))
    w = F.pow(F.lit(0.5), k)
    return (
        cur.join(past, F.col("m0") <= F.col("m"))
        .groupBy("m")
        .agg(
            F.round(F.sum(w * F.col("x0")) / F.sum(w), 4).alias("ewma"),
            F.round(F.max(F.col("x")), 2).alias("revenue"),
            F.count("*").alias("n_months"),
        )
        .select(
            F.date_format("m", "yyyy-MM").alias("month"),
            "ewma",
            "revenue",
            "n_months",
        )
    )


def q_user_value_ewma(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user EWMA (alpha=0.5) of event values as an ORDERED JVM fold:
    each user's series collects into a ts-sorted array (one exchange on
    user_id), and F.aggregate folds s <- 0.5*s + 0.5*x sequentially -
    bit-identical in any engine because the fold order is explicit, the
    per-key streaming-smoother primitive (the batch twin of a stateful
    stream). Array length is bounded by per-user activity; users
    partition the work."""
    e = table(spark, sf, "events").filter(F.col("user_id") < 60)
    series = e.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    "ts",
                    "event_id",
                    F.col("value").cast("double").alias("value"),
                )
            )
        ).alias("s")
    )
    vals = F.col("s.value")
    folded = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: 0.5 * acc + 0.5 * x,
    )
    return series.select(
        "user_id",
        F.size("s").alias("n_events"),
        F.round(folded, 6).alias("ewma"),
    )


QUERIES = {
    "user_value_ewma": q_user_value_ewma,
    "ts_subseq_match": q_ts_subseq_match,
    "ts_anomaly_zscore": q_ts_anomaly_zscore,
    "ts_paa_sax": q_ts_paa_sax,
    "ts_cusum": q_ts_cusum,
    "ewma_revenue": q_ewma_revenue,
}

# Oracle notes: window-list folds use list_reduce (sequential, same FP
# order as Spark's aggregate() fold seeded with 0.0); the z-normalized
# pattern is derived in-SQL with the same IEEE ops the Python side uses.
ORACLES = {
    "ts_cusum": """
        WITH s AS (
            SELECT user_id, ts, event_id, CAST(value AS DOUBLE) AS v
            FROM events
        ),
        m AS (
            SELECT user_id, ROUND(AVG(v), 6) AS mu,
                   ROUND(STDDEV_POP(v), 6) AS sd
            FROM s GROUP BY user_id
        ),
        d AS (
            SELECT s.user_id, ts, event_id, sd,
                   v - mu - 0.5 * sd AS du,
                   mu - v - 0.5 * sd AS dd
            FROM s JOIN m USING (user_id)
        ),
        c AS (
            SELECT user_id, ts, event_id, sd,
                   SUM(du) OVER w AS cu, SUM(dd) OVER w AS cd
            FROM d
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY epoch_us(ts), event_id
                         ROWS UNBOUNDED PRECEDING)
        ),
        x AS (
            SELECT user_id, sd,
                   cu - LEAST(0.0, MIN(cu) OVER w) AS su,
                   cd - LEAST(0.0, MIN(cd) OVER w) AS sdn
            FROM c
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY epoch_us(ts), event_id
                         ROWS UNBOUNDED PRECEDING)
        )
        SELECT user_id,
               CAST(SUM(CASE WHEN su > 4.0 * sd THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_up_alarms,
               CAST(SUM(CASE WHEN sdn > 4.0 * sd THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_down_alarms,
               ROUND(MAX(su), 4) AS max_cusum_up,
               ROUND(MAX(sdn), 4) AS max_cusum_down
        FROM x GROUP BY user_id
        HAVING SUM(CASE WHEN su > 4.0 * sd THEN 1 ELSE 0 END) > 0
            OR SUM(CASE WHEN sdn > 4.0 * sd THEN 1 ELSE 0 END) > 0
        ORDER BY user_id
    """,
    "ts_subseq_match": """
        WITH zp_t AS (
            SELECT list_transform(generate_series(1, 8),
                                  i -> (CAST(i AS DOUBLE) - 4.5) / sqrt(5.25)) AS zp
        ),
        w AS (
            SELECT user_id, ts, event_id,
                   list(CAST(value AS DOUBLE))
                       OVER (PARTITION BY user_id
                             ORDER BY epoch_us(ts), event_id
                             ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS win
            FROM events
        ),
        m AS (
            SELECT user_id, ts, event_id, win,
                   (0.0 + list_reduce(win, (acc, x) -> acc + x)) / 8.0 AS mu
            FROM w WHERE len(win) = 8
        ),
        s AS (
            SELECT user_id, ts, event_id, win, mu,
                   sqrt((0.0 + list_reduce(list_transform(win, x -> (x - mu) * (x - mu)),
                                           (acc, x) -> acc + x)) / 8.0) AS sd
            FROM m
        ),
        d AS (
            SELECT user_id, ts, event_id,
                   ROUND(0.0 + list_reduce(
                       list_transform(generate_series(1, 8),
                           i -> ((win[i] - mu) / sd - zp[i]) * ((win[i] - mu) / sd - zp[i])),
                       (acc, x) -> acc + x), 4) AS dist
            FROM s, zp_t WHERE sd > 1e-9
        )
        SELECT user_id,
               strftime(ts, '%Y-%m-%dT%H:%M:%S') AS start_ts,
               event_id AS start_event_id,
               dist
        FROM d
        ORDER BY dist ASC, user_id ASC, epoch_us(ts) ASC, event_id ASC
        LIMIT 25
    """,
    "ts_anomaly_zscore": """
        WITH w AS (
            SELECT user_id, event_id, CAST(value AS DOUBLE) AS v,
                   AVG(CAST(value AS DOUBLE)) OVER f AS mu,
                   STDDEV_POP(CAST(value AS DOUBLE)) OVER f AS sd,
                   COUNT(CAST(value AS DOUBLE)) OVER f AS n
            FROM events
            WINDOW f AS (PARTITION BY user_id
                         ORDER BY epoch_us(ts), event_id
                         ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
        )
        SELECT user_id, event_id,
               ROUND(v, 2) AS value,
               ROUND((v - mu) / sd, 3) AS zscore
        FROM w
        WHERE n >= 10 AND sd > 1e-9 AND ABS(ROUND((v - mu) / sd, 3)) > 2.5
    """,
    "ts_paa_sax": """
        WITH r AS (
            SELECT user_id, CAST(value AS DOUBLE) AS v,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts), event_id) AS rn
            FROM events WHERE user_id < 40
        ),
        g AS (
            SELECT user_id, CAST(FLOOR((rn - 1) / 10) AS BIGINT) AS segment,
                   AVG(v) AS paa, COUNT(*) AS n_points
            FROM r GROUP BY 1, 2
        )
        SELECT user_id, segment,
               ROUND(paa, 4) AS paa_mean,
               CASE WHEN paa < 20.0 THEN 'a'
                    WHEN paa < 45.0 THEN 'b'
                    WHEN paa < 90.0 THEN 'c'
                    ELSE 'd' END AS sax_symbol,
               n_points
        FROM g
    """,
}

ORACLES["ewma_revenue"] = """
    WITH monthly AS (
        SELECT DATE_TRUNC('month', o_orderdate) AS month,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS rev
        FROM orders GROUP BY 1
    )
    SELECT
        STRFTIME(cur.month, '%Y-%m') AS month,
        ROUND(SUM(POW(0.5, DATEDIFF('month', past.month, cur.month))
                  * past.rev)
              / SUM(POW(0.5, DATEDIFF('month', past.month, cur.month))),
              4) AS ewma,
        ROUND(MAX(cur.rev), 2) AS revenue,
        COUNT(*) AS n_months
    FROM monthly cur JOIN monthly past ON past.month <= cur.month
    GROUP BY 1
"""

# ordered fold replayed with list_reduce over the same ts-sorted list:
# sequential order explicit on both sides, so the doubles are bit-equal
ORACLES["user_value_ewma"] = """
    WITH series AS (
        SELECT user_id,
               list(CAST(value AS DOUBLE)
                    ORDER BY epoch_us(ts), event_id) AS s
        FROM events
        WHERE user_id < 60
        GROUP BY user_id
    )
    SELECT user_id,
           len(s) AS n_events,
           ROUND(list_reduce(s, (acc, x) -> 0.5 * acc + 0.5 * x), 6)
               AS ewma
    FROM series
"""


def q_theil_sen_trend(spark: SparkSession, sf: str) -> DataFrame:
    """Theil-Sen robust trend of monthly revenue: the MEDIAN of all
    pairwise slopes - outlier-resistant where OLS is not (breakdown
    point 29%). The fact folds to the DECIMAL-exact monthly series
    first; the pairwise-slope join is quadratic only in months (<=100
    rows -> <=5k pairs), the registry's standard bounded-aggregate
    shape. Month index via months_between, so slopes are per-month
    revenue deltas."""
    o = table(spark, sf, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("m")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("rev")
    )
    a = monthly.select(F.col("m").alias("ma"), F.col("rev").alias("ra"))
    b = monthly.select(F.col("m").alias("mb"), F.col("rev").alias("rb"))
    slopes = (
        a.join(b, F.col("ma") < F.col("mb"))
        .select(
            (
                (F.col("rb") - F.col("ra"))
                / F.months_between(F.col("mb"), F.col("ma"))
            ).alias("slope")
        )
    )
    return slopes.agg(
        F.count("*").alias("n_pairs"),
        F.round(F.percentile("slope", F.lit(0.5)), 4).alias("theil_sen_slope"),
        F.round(F.avg("slope"), 4).alias("mean_slope"),
    )


ORACLES["theil_sen_trend"] = """
    WITH monthly AS (
        SELECT DATE_TRUNC('month', o_orderdate) AS m,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS rev
        FROM orders GROUP BY 1
    ),
    slopes AS (
        SELECT (b.rev - a.rev)
               / DATEDIFF('month', a.m, b.m) AS slope
        FROM monthly a JOIN monthly b ON a.m < b.m
    )
    SELECT COUNT(*) AS n_pairs,
           ROUND(QUANTILE_CONT(slope, 0.5), 4) AS theil_sen_slope,
           ROUND(AVG(slope), 4) AS mean_slope
    FROM slopes
"""

QUERIES["theil_sen_trend"] = q_theil_sen_trend


def q_mann_kendall(spark: SparkSession, sf: str) -> DataFrame:
    """Mann-Kendall nonparametric trend test on monthly revenue: S =
    sum of sign(x_j - x_i) over ordered pairs, with the no-ties normal
    approximation z = (S -+ 1) / sqrt(n(n-1)(2n+5)/18) - the
    significance readout next to `theil_sen_trend`'s magnitude. Pairs
    are quadratic in months only (the registry's bounded-aggregate
    shape); DECIMAL month sums make the sign comparisons engine-exact."""
    o = table(spark, sf, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("m")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    a = monthly.select(F.col("m").alias("ma"), F.col("rev").alias("ra"))
    b = monthly.select(F.col("m").alias("mb"), F.col("rev").alias("rb"))
    pairs = a.join(b, F.col("ma") < F.col("mb")).select(
        F.signum((F.col("rb") - F.col("ra")).cast("double")).alias("sgn")
    )
    agg = pairs.agg(F.sum("sgn").cast("long").alias("s"), F.count("*").alias("n_pairs"))
    # n months from pair count: n_pairs = n(n-1)/2
    n = (1 + F.sqrt(1.0 + 8.0 * F.col("n_pairs"))) / 2.0
    var = n * (n - 1) * (2 * n + 5) / 18.0
    z = (
        F.when(F.col("s") > 0, (F.col("s") - 1) / F.sqrt(var))
        .when(F.col("s") < 0, (F.col("s") + 1) / F.sqrt(var))
        .otherwise(F.lit(0.0))
    )
    return agg.select(
        "s",
        "n_pairs",
        F.round(z, 4).alias("z_stat"),
    )


ORACLES["mann_kendall"] = """
    WITH monthly AS (
        SELECT DATE_TRUNC('month', o_orderdate) AS m,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1
    ),
    pairs AS (
        SELECT SIGN(CAST(b.rev - a.rev AS DOUBLE)) AS sgn
        FROM monthly a JOIN monthly b ON a.m < b.m
    ),
    agg AS (
        SELECT CAST(SUM(sgn) AS BIGINT) AS s, COUNT(*) AS n_pairs
        FROM pairs
    )
    SELECT s, n_pairs,
           ROUND(CASE
               WHEN s > 0 THEN (s - 1) / SQRT(
                   ((1 + SQRT(1.0 + 8.0 * n_pairs)) / 2.0)
                   * ((1 + SQRT(1.0 + 8.0 * n_pairs)) / 2.0 - 1)
                   * (2 * ((1 + SQRT(1.0 + 8.0 * n_pairs)) / 2.0) + 5) / 18.0)
               WHEN s < 0 THEN (s + 1) / SQRT(
                   ((1 + SQRT(1.0 + 8.0 * n_pairs)) / 2.0)
                   * ((1 + SQRT(1.0 + 8.0 * n_pairs)) / 2.0 - 1)
                   * (2 * ((1 + SQRT(1.0 + 8.0 * n_pairs)) / 2.0) + 5) / 18.0)
               ELSE 0.0 END, 4) AS z_stat
    FROM agg
"""

QUERIES["mann_kendall"] = q_mann_kendall


# ---------------------------------------------------------------- round 7


def q_acf_daily_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Autocorrelation of daily order revenue at lags 1, 2, 7, 14 —
    the seasonality probe (a weekly cycle shows as a lag-7 peak). The
    fact folds ONCE to the ~2400-row day table; each lag is an equi-join
    of that bounded table against its date-shifted self, and the Pearson
    r per lag is one moment fold. No event-scale window, no global
    sort."""
    o = table(spark, sf, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum("o_totalprice").alias("rev")
    ).localCheckpoint(eager=False)  # day-count-sized, consumed per lag
    lags = spark.createDataFrame([(1,), (2,), (7,), (14,)], "lag int")
    a = daily.crossJoin(F.broadcast(lags)).select(
        "lag", F.date_add("day", F.col("lag")).alias("day"),
        F.col("rev").alias("x"),
    )
    b = daily.select("day", F.col("rev").alias("y"))
    pairs = a.join(b, "day")
    m = pairs.groupBy("lag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select(
        "lag", F.col("n").cast("long").alias("n_pairs"),
        F.round(num / den, 6).alias("acf"),
    ).orderBy("lag")


ORACLES["acf_daily_revenue"] = """
    WITH daily AS (
        SELECT date_trunc('day', o_orderdate) AS day,
               SUM(o_totalprice) AS rev
        FROM orders GROUP BY 1
    ), lags AS (SELECT UNNEST([1, 2, 7, 14]) AS lag),
    pairs AS (
        SELECT l.lag, a.rev AS x, b.rev AS y
        FROM daily a CROSS JOIN lags l
        JOIN daily b ON b.day = a.day + l.lag * INTERVAL 1 DAY
    ), m AS (
        SELECT lag, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
        FROM pairs GROUP BY lag
    )
    SELECT lag, CAST(n AS BIGINT) AS n_pairs,
           ROUND((n * sxy - sx * sy)
                 / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)),
                 6) AS acf
    FROM m ORDER BY lag
"""
QUERIES["acf_daily_revenue"] = q_acf_daily_revenue


def q_seasonal_strength(spark: SparkSession, sf: str) -> DataFrame:
    """Seasonal-strength decomposition of monthly revenue: the share of
    month-level variance explained by the month-of-year means (ANOVA
    identity SSB/SST on the ~80-row month table grouped into 12
    calendar months). Bounded end to end after the one monthly fold."""
    o = table(spark, sf, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(F.sum("o_totalprice").alias("rev"))
    g = monthly.select(F.month("m").alias("moy"), "rev").groupBy("moy").agg(
        F.count("*").alias("n"), F.sum("rev").alias("s"),
        F.sum(F.col("rev") * F.col("rev")).alias("q"),
    )
    tot = g.agg(
        F.sum("n").alias("nn"), F.sum("s").alias("ss"),
        F.sum("q").alias("qq"),
        F.sum(F.col("s") * F.col("s") / F.col("n")).alias("sb"),
    )
    sst = F.col("qq") - F.col("ss") * F.col("ss") / F.col("nn")
    ssb = F.col("sb") - F.col("ss") * F.col("ss") / F.col("nn")
    return tot.select(
        F.col("nn").cast("long").alias("n_months"),
        F.round(ssb / sst, 6).alias("seasonal_strength"),
    )


ORACLES["seasonal_strength"] = """
    WITH monthly AS (
        SELECT date_trunc('month', o_orderdate) AS m,
               SUM(o_totalprice) AS rev
        FROM orders GROUP BY 1
    ), g AS (
        SELECT month(m) AS moy, COUNT(*) AS n, SUM(rev) AS s,
               SUM(rev * rev) AS q
        FROM monthly GROUP BY 1
    ), tot AS (
        SELECT SUM(n) AS nn, SUM(s) AS ss, SUM(q) AS qq,
               SUM(s * s / n) AS sb
        FROM g
    )
    SELECT CAST(nn AS BIGINT) AS n_months,
           ROUND((sb - ss * ss / nn) / (qq - ss * ss / nn), 6)
               AS seasonal_strength
    FROM tot
"""
QUERIES["seasonal_strength"] = q_seasonal_strength


def q_mad_outlier_days(spark: SparkSession, sf: str) -> DataFrame:
    """Robust outlier days of daily revenue: |rev - median| >
    3 * 1.4826 * MAD, the median/MAD twin of the z-score rule (immune
    to the outliers it hunts). Medians are exact interpolated
    percentiles over the ~2400-row day table (bounded, never
    event-scale); emits the count plus the top 5 days by deviation."""
    o = table(spark, sf, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum("o_totalprice").alias("rev")
    ).localCheckpoint(eager=False)
    med = daily.agg(F.expr("percentile(rev, 0.5)").alias("med"))
    dev = daily.crossJoin(F.broadcast(med)).select(
        "day", "rev", F.abs(F.col("rev") - F.col("med")).alias("d"), "med"
    )
    mad = dev.agg(F.expr("percentile(d, 0.5)").alias("mad"))
    flagged = dev.crossJoin(F.broadcast(mad)).filter(
        F.col("d") > 3 * 1.4826 * F.col("mad")
    )
    return flagged.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round("rev", 2).alias("rev"),
        F.round(F.col("d") / (1.4826 * F.col("mad")), 4).alias(
            "robust_z"
        ),
    ).orderBy(F.col("robust_z").desc(), "day").limit(5)


ORACLES["mad_outlier_days"] = """
    WITH daily AS (
        SELECT date_trunc('day', o_orderdate) AS day,
               SUM(o_totalprice) AS rev
        FROM orders GROUP BY 1
    ), med AS (SELECT QUANTILE_CONT(rev, 0.5) AS med FROM daily),
    dev AS (
        SELECT day, rev, ABS(rev - med) AS d FROM daily CROSS JOIN med
    ), mad AS (SELECT QUANTILE_CONT(d, 0.5) AS mad FROM dev)
    SELECT strftime(day, '%Y-%m-%d') AS day, ROUND(rev, 2) AS rev,
           ROUND(d / (1.4826 * mad), 4) AS robust_z
    FROM dev CROSS JOIN mad
    WHERE d > 3 * 1.4826 * mad
    ORDER BY robust_z DESC, day LIMIT 5
"""
QUERIES["mad_outlier_days"] = q_mad_outlier_days


def q_weekday_revenue_effect(spark: SparkSession, sf: str) -> DataFrame:
    """Day-of-week revenue index: each weekday's average daily revenue
    relative to the overall daily average (index 1.0 = no weekday
    effect) — the first decomposition a demand forecaster checks. Folds
    to the bounded day table, then a 7-row aggregate; weekday names come
    from an explicit ISO-day-number literal map (mirrored in the oracle)
    — never date_format('EEEE'), whose rendering follows the JVM default
    locale."""
    o = table(spark, sf, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    names = [
        "Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
        "Saturday", "Sunday",
    ]
    # weekday() is 1=Sunday..7=Saturday; pmod(dow+5, 7) gives the ISO
    # index 0=Monday..6=Sunday; element_at is 1-based
    wd = F.element_at(
        F.array(*[F.lit(n) for n in names]),
        (F.pmod(F.dayofweek("day") + 5, F.lit(7)) + 1).cast("int"),
    )
    byd = daily.groupBy(wd.alias("weekday")).agg(
        F.count("*").alias("n_days"),
        (F.sum("rev") / F.count("*")).alias("avg_rev"),
    )
    overall = byd.agg(
        (F.sum(F.col("avg_rev") * F.col("n_days")) / F.sum("n_days")).alias(
            "g"
        )
    )
    return (
        byd.crossJoin(F.broadcast(overall))
        .select(
            "weekday",
            "n_days",
            F.round("avg_rev", 2).alias("avg_rev"),
            F.round(F.col("avg_rev") / F.col("g"), 6).alias("index"),
        )
        .orderBy("weekday")
    )


ORACLES["weekday_revenue_effect"] = """
    WITH daily AS (
        SELECT date_trunc('day', o_orderdate) AS day,
               SUM(o_totalprice) AS rev
        FROM orders GROUP BY 1
    ), byd AS (
        SELECT ['Monday', 'Tuesday', 'Wednesday', 'Thursday', 'Friday',
                'Saturday', 'Sunday'][isodow(day)] AS weekday,
               COUNT(*) AS n_days,
               SUM(rev) / COUNT(*) AS avg_rev
        FROM daily GROUP BY 1
    ), overall AS (
        SELECT SUM(avg_rev * n_days) / SUM(n_days) AS g FROM byd
    )
    SELECT weekday, n_days, ROUND(avg_rev, 2) AS avg_rev,
           ROUND(avg_rev / g, 6) AS index
    FROM byd CROSS JOIN overall ORDER BY weekday
"""
QUERIES["weekday_revenue_effect"] = q_weekday_revenue_effect


def q_priority_mix_shift(spark: SparkSession, sf: str) -> DataFrame:
    """Composition drift: each order priority's share of orders per
    year, with the delta vs that priority's FIRST-year share — the
    mix-shift readout behind 'did our order mix change'. Year x priority
    is a bounded aggregate; shares and first-year anchors are windows
    over <= 40 rows."""
    from pyspark.sql import Window

    o = table(spark, sf, "orders")
    g = o.groupBy(
        F.year("o_orderdate").alias("yr"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.count("*").alias("n"))
    wy = Window.partitionBy("yr")
    wp = Window.partitionBy("priority").orderBy("yr")
    shares = g.select(
        "yr", "priority",
        (F.col("n") / F.sum("n").over(wy)).alias("share"),
    )
    return shares.select(
        "yr", "priority",
        F.round("share", 6).alias("share"),
        F.round(
            F.col("share") - F.first("share").over(wp), 6
        ).alias("delta_vs_first_year"),
    ).orderBy("yr", "priority")


ORACLES["priority_mix_shift"] = """
    WITH g AS (
        SELECT year(o_orderdate) AS yr, o_orderpriority AS priority,
               COUNT(*) AS n
        FROM orders GROUP BY 1, 2
    ), shares AS (
        SELECT yr, priority,
               n * 1.0 / SUM(n) OVER (PARTITION BY yr) AS share
        FROM g
    )
    SELECT yr, priority, ROUND(share, 6) AS share,
           ROUND(share - FIRST_VALUE(share) OVER (
                   PARTITION BY priority ORDER BY yr), 6)
               AS delta_vs_first_year
    FROM shares ORDER BY yr, priority
"""
QUERIES["priority_mix_shift"] = q_priority_mix_shift


def q_holt_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Holt's linear-trend one-step-ahead forecast of monthly revenue
    (alpha = beta = 0.5 — exact binary fractions, so the sequential
    fold is bit-identical cross-engine): level/trend fold over the
    ~80-row ordered month table inside ONE JVM aggregate expression —
    iteration cost independent of fact size, the same explicit-fold
    discipline as `ewma_revenue`. Emits the final level, trend, and the
    next-month forecast."""
    o = table(spark, sf, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(F.sum("o_totalprice").alias("rev"))
    arr = monthly.agg(
        F.array_sort(F.collect_list(F.struct("m", "rev"))).alias("xs")
    )
    # fold state (level, trend, n): seeded from the first observation
    # (level = x0, trend = 0); for each next x:
    #   level' = a*x + (1-a)*(level + trend); trend' = b*(level' - level)
    #   + (1-b)*trend
    fold = F.expr(
        """
        aggregate(
            slice(xs, 2, size(xs) - 1),
            struct(xs[0].rev AS l, cast(0.0 AS double) AS b),
            (acc, x) -> struct(
                0.5D * x.rev + 0.5D * (acc.l + acc.b) AS l,
                0.5D * ((0.5D * x.rev + 0.5D * (acc.l + acc.b)) - acc.l)
                    + 0.5D * acc.b AS b
            )
        )
        """
    )
    return arr.select(
        F.size("xs").alias("n_months"),
        F.round(fold.getField("l"), 2).alias("level"),
        F.round(fold.getField("b"), 2).alias("trend"),
        F.round(
            fold.getField("l") + fold.getField("b"), 2
        ).alias("forecast_next"),
    )


ORACLES["holt_forecast_revenue"] = """
    WITH monthly AS (
        SELECT date_trunc('month', o_orderdate) AS m,
               SUM(o_totalprice) AS rev
        FROM orders GROUP BY 1
    ), arr AS (
        SELECT list(rev ORDER BY m) AS xs FROM monthly
    ), fold AS (
        -- state rides as [level, trend]: the list lift (SNIPPETS-style)
        -- because a struct_pack accumulator mis-binds acc fields inside
        -- DuckDB's list_reduce lambda (verified: trend comes back wrong
        -- while the same fold over a 2-list is exact)
        SELECT len(xs) AS n_months,
               list_reduce(
                   list_transform(xs, x -> [CAST(x AS DOUBLE),
                                            CAST(0.0 AS DOUBLE)]),
                   (acc, e) -> [
                       0.5 * e[1] + 0.5 * (acc[1] + acc[2]),
                       0.5 * ((0.5 * e[1] + 0.5 * (acc[1] + acc[2]))
                              - acc[1]) + 0.5 * acc[2]
                   ]
               ) AS st
        FROM arr
    )
    SELECT n_months, ROUND(st[1], 2) AS level, ROUND(st[2], 2) AS trend,
           ROUND(st[1] + st[2], 2) AS forecast_next
    FROM fold
"""
QUERIES["holt_forecast_revenue"] = q_holt_forecast_revenue
