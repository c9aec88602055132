"""Time-series subsequence similarity search over long-format series.

The reference has no time-series matching; this is an engine extension in
the SURVEY §7.5 family (distributed similarity search over sliding windows,
per the EDBT'19 streaming-similarity / UCR-suite line of work in PAPERS.md):
z-normalized Euclidean distance between a literal query pattern and every
length-L sliding subsequence of each key's series.

Spark-first shape:
- the sliding window is a BOUNDED per-key window frame
  (``rowsBetween(currentRow, L-1)`` + ``collect_list``) — no self-join and
  no explode blowup; per-row state is O(L);
- z-normalization and the distance are higher-order functions
  (``aggregate`` / ``zip_with``) evaluated entirely JVM-side;
- global top-k is ``orderBy(...).limit(k)`` → TakeOrderedAndProject (a
  per-partition heap + driver merge), never a single-partition window.

At 100 TB the only exchange is the hash shuffle on the series key for the
window sort; everything after is narrow. The pattern is a tiny literal
(the "model"), so plan size is constant in data volume.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "znorm",
    "subsequence_search",
    "rolling_zscore_anomalies",
    "paa_symbols",
    "cusum_stats",
]


def znorm(pattern: list[float]) -> list[float]:
    """Z-normalize a literal query pattern driver-side (population std).

    Raises on constant patterns — a flat query matches everything equally
    and the z-normalized distance is undefined.
    """
    n = len(pattern)
    mu = sum(pattern) / n
    var = sum((x - mu) ** 2 for x in pattern) / n
    if var <= 0:
        raise ValueError("constant pattern has no z-normalized form")
    sd = math.sqrt(var)
    return [(x - mu) / sd for x in pattern]


def _seq_sum(arr: Column) -> Column:
    """Sequential left fold sum — FP addition order is the array order on
    every engine, so oracles can reproduce the exact double."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def subsequence_search(
    series: DataFrame,
    pattern: list[float],
    key_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    val_col: str = "value",
    top_k: int = 25,
    round_digits: int = 4,
) -> DataFrame:
    """Top-k z-normalized subsequence matches of `pattern` across all keys.

    Every row is the START of one candidate subsequence (rows at the tail of
    a key's series with fewer than L successors are skipped). Distance is
    squared z-normalized Euclidean; constant (zero-variance) subsequences
    are skipped — they have no z-normalized form. Ordering uses the ROUNDED
    distance plus (key, order) tie-breakers so the global top-k cut is
    deterministic and engine-independent.
    """
    L = len(pattern)
    zp = F.array(*[F.lit(float(x)) for x in znorm(pattern)])
    frame = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.currentRow, L - 1)
    )
    win = F.collect_list(F.col(val_col).cast("double")).over(frame)
    mean = _seq_sum(F.col("_win")) / F.lit(float(L))
    var = (
        _seq_sum(
            F.transform(
                F.col("_win"), lambda x: (x - F.col("_mu")) * (x - F.col("_mu"))
            )
        )
        / F.lit(float(L))
    )
    zdiff = F.zip_with(
        F.col("_win"),
        zp,
        lambda x, p: ((x - F.col("_mu")) / F.col("_sd") - p)
        * ((x - F.col("_mu")) / F.col("_sd") - p),
    )
    out = (
        series.withColumn("_win", win)
        .filter(F.size("_win") == L)
        .withColumn("_mu", mean)
        .withColumn("_sd", F.sqrt(var))
        .filter(F.col("_sd") > 1e-9)
        .withColumn("dist", F.round(_seq_sum(zdiff), round_digits))
    )
    return (
        out.orderBy(F.col("dist").asc(), F.col(key_col).asc(), *order_cols)
        .limit(top_k)
        .select(key_col, *order_cols, "dist")
    )


def rolling_zscore_anomalies(
    series: DataFrame,
    lookback: int = 20,
    min_history: int = 10,
    threshold: float = 2.5,
    key_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    val_col: str = "value",
) -> DataFrame:
    """Rows whose value deviates more than `threshold` rolling z-scores from
    the mean of the PRECEDING `lookback` observations of the same key.

    The frame excludes the current row (no self-masking) and requires at
    least `min_history` prior points — warm-up rows can't fire. One bounded
    per-key window, no shuffle beyond the key exchange; the streaming twin
    is the same expressions over a watermarked stream.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(-lookback, -1)
    )
    v = F.col(val_col).cast("double")
    return (
        series.withColumn("_mu", F.avg(v).over(w))
        .withColumn("_sd", F.stddev_pop(v).over(w))
        .withColumn("_n", F.count(v).over(w))
        .filter((F.col("_n") >= min_history) & (F.col("_sd") > 1e-9))
        .withColumn("zscore", F.round((v - F.col("_mu")) / F.col("_sd"), 3))
        .filter(F.abs(F.col("zscore")) > threshold)
        .select(key_col, *order_cols, val_col, "zscore")
    )


def cusum_stats(
    series: DataFrame,
    slack: float = 0.5,
    threshold: float = 4.0,
    key_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    val_col: str = "value",
) -> DataFrame:
    """Two-sided CUSUM level-shift detection per key (Page 1954): upward and
    downward cumulative-sum statistics with slack `slack`·σ, alarm when a
    statistic exceeds `threshold`·σ. Output: per-key alarm counts + the
    maximum excursion of each side.

    The textbook recurrence S_t = max(0, S_{t−1} + dev_t) looks like an
    imperative scan, but it has a closed windowed form:
    S_t = C_t − min(0, min_{j≤t} C_j) where C is the plain running sum of
    deviations — so the whole operator is two per-key running-sum windows
    plus two running-min windows over the SAME (key, order) sort: ONE hash
    exchange on the key, zero Python, no UDF scan.

    Cross-engine determinism: μ and σ are per-key aggregates whose FP
    result depends on combine order, so both are rounded to 6 dp BEFORE
    entering the deviations; the running sums then add identical doubles
    in an identical order on any engine (same pre-round trick as
    `stats_q.q_winsorize_price`). Constant series (σ = 0) produce zero
    alarms by construction: every deviation is 0, both statistics stay at
    0, and the strict `> threshold·σ = 0` comparison never fires.
    """
    v = F.col(val_col).cast("double")
    wk = Window.partitionBy(key_col)
    wo = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    mu = F.round(F.avg("_v").over(wk), 6)
    sd = F.round(F.stddev_pop("_v").over(wk), 6)
    base = (
        series.select(key_col, *order_cols, v.alias("_v"))
        .withColumn("_mu", mu)
        .withColumn("_sd", sd)
        .withColumn("_du", F.col("_v") - F.col("_mu") - F.lit(slack) * F.col("_sd"))
        .withColumn("_dd", F.col("_mu") - F.col("_v") - F.lit(slack) * F.col("_sd"))
    )
    cu = F.sum("_du").over(wo)
    cd = F.sum("_dd").over(wo)
    scored = (
        base.withColumn("_cu", cu)
        .withColumn("_cd", cd)
        .withColumn("_su", F.col("_cu") - F.least(F.lit(0.0), F.min("_cu").over(wo)))
        .withColumn("_sd2", F.col("_cd") - F.least(F.lit(0.0), F.min("_cd").over(wo)))
    )
    h = F.lit(threshold) * F.col("_sd")
    return scored.groupBy(key_col).agg(
        F.sum(F.when(F.col("_su") > h, 1).otherwise(0)).alias("n_up_alarms"),
        F.sum(F.when(F.col("_sd2") > h, 1).otherwise(0)).alias("n_down_alarms"),
        F.round(F.max("_su"), 4).alias("max_cusum_up"),
        F.round(F.max("_sd2"), 4).alias("max_cusum_down"),
    )


def paa_symbols(
    series: DataFrame,
    segment_len: int = 10,
    breakpoints: tuple[float, ...] = (20.0, 45.0, 90.0),
    key_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    val_col: str = "value",
) -> DataFrame:
    """Piecewise Aggregate Approximation + SAX-style discretization: each
    key's series is cut into fixed-length segments (by row position), each
    segment reduced to its mean, and the mean mapped to a symbol by fixed
    breakpoints — the standard dimensionality-reduction front of indexable
    time-series search (Lin et al., SAX).

    One per-key row_number window then a hash aggregation on (key, segment);
    symbols are a chained CASE over literal breakpoints — all JVM.
    """
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    seg = F.floor((F.row_number().over(w) - 1) / segment_len).cast("long")
    paa = F.avg(F.col(val_col).cast("double"))
    out = (
        series.withColumn("segment", seg)
        .groupBy(key_col, "segment")
        .agg(paa.alias("_paa"), F.count("*").alias("n_points"))
    )
    symbol = F.when(F.col("_paa") < breakpoints[0], "a")
    for i, bp in enumerate(breakpoints[1:], start=1):
        symbol = symbol.when(F.col("_paa") < bp, chr(ord("a") + i))
    symbol = symbol.otherwise(chr(ord("a") + len(breakpoints)))
    return out.select(
        key_col,
        "segment",
        F.round("_paa", 4).alias("paa_mean"),
        symbol.alias("sax_symbol"),
        "n_points",
    )
