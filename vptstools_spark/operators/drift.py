"""Distribution drift detection: Population Stability Index between a
baseline and a current sample of a numeric column.

The monitoring op a production data pipeline runs next to its DQ suite
(`operators/quality.py`): DQ answers "is this batch well-formed", drift
answers "does this batch still look like the data the model was built
on". PSI = Σ (pᵢ − qᵢ)·ln(pᵢ/qᵢ) over a fixed binning; > 0.1 is the
conventional "investigate", > 0.25 "act" threshold.

Scale shape: each side is ONE conditional-aggregate pass collapsing to
|bins| rows (fixed-width bins are a narrow `floor` expression, so the
histogram combines map-side); the PSI join is bins×bins — driver-free and
broadcast-trivial. Fixed bin edges (not quantiles of either sample) keep
the metric comparable across runs and engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: fractions are clamped here before the log-ratio — the standard PSI
#: guard for empty bins (ln(0) is -inf; a bin one side never hits still
#: contributes a finite, large term)
PSI_EPS = 1e-6


def histogram_fractions(
    df: DataFrame, col: Column, lo: float, hi: float, n_bins: int
) -> DataFrame:
    """(bin, frac) fixed-width histogram of `col` over [lo, hi); values
    outside the range clamp into the edge bins so mass is never dropped
    silently. One pass, |bins| output rows."""
    width = (hi - lo) / n_bins
    b = F.floor((col - F.lit(lo)) / F.lit(width)).cast("int")
    b = F.least(F.greatest(b, F.lit(0)), F.lit(n_bins - 1))
    counts = df.select(b.alias("bin")).groupBy("bin").agg(
        F.count("*").alias("__n")
    )
    total = counts.agg(F.sum("__n").alias("__t"))
    # fill absent bins with zero so both sides align on the same bin set
    bins = df.sparkSession.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    return (
        bins.join(counts, "bin", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "bin",
            F.try_divide(
                F.coalesce(F.col("__n"), F.lit(0)).cast("double"), F.col("__t")
            ).alias("frac"),
        )
    )


def psi(
    baseline: DataFrame,
    current: DataFrame,
    col: Column,
    lo: float,
    hi: float,
    n_bins: int = 10,
) -> DataFrame:
    """Per-bin PSI terms between two samples of `col`: (bin, p, q,
    psi_term), where p = baseline fraction, q = current fraction, both
    clamped to `PSI_EPS`. Total drift = SUM(psi_term); per-bin terms show
    WHERE the distribution moved, which is what an operator actually needs
    to debug a drifting feed."""
    p = histogram_fractions(baseline, col, lo, hi, n_bins).withColumnRenamed(
        "frac", "p"
    )
    q = histogram_fractions(current, col, lo, hi, n_bins).withColumnRenamed(
        "frac", "q"
    )
    pe = F.greatest(F.col("p"), F.lit(PSI_EPS))
    qe = F.greatest(F.col("q"), F.lit(PSI_EPS))
    return p.join(q, "bin").select(
        "bin",
        "p",
        "q",
        ((pe - qe) * F.log(pe / qe)).alias("psi_term"),
    )


def ks_on_grid(
    baseline: DataFrame,
    current: DataFrame,
    col: Column,
    edges: list[float],
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance evaluated on a fixed grid:
    one row per grid edge with both empirical CDFs and their absolute gap;
    the KS statistic is MAX(d) and the argmax edge shows WHERE the
    distributions diverge (the complement of PSI's per-bin terms).

    Exact at the grid points; the grid bounds the statistic from below
    with error ≤ the CDF mass between adjacent edges, which is the
    standard trade for making KS distribution-free of a global sort.

    Scale shape: NO window, NO shuffle beyond two map-side-combining
    aggregates — each side collapses in a single pass to one row of
    |edges| cumulative conditional counts (`x ≤ edge_i` sums are already
    cumulative, so no running-sum pass exists at all), and the combine is
    a 1-row × 1-row cross join. NULLs carry no CDF mass on either side
    (condition NULL → sum skips; totals use count(col)).
    """
    def side(df: DataFrame, tag: str) -> DataFrame:
        return df.agg(
            *[
                F.sum((col <= F.lit(e)).cast("long")).alias(f"{tag}c{i}")
                for i, e in enumerate(edges)
            ],
            F.count(col).alias(f"{tag}n"),
        )

    b = side(baseline, "b")
    c = side(current, "c")
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.lit(float(e)).alias("edge"),
                F.try_divide(
                    F.coalesce(F.col(f"bc{i}"), F.lit(0)).cast("double"),
                    F.col("bn"),
                ).alias("cdf_base"),
                F.try_divide(
                    F.coalesce(F.col(f"cc{i}"), F.lit(0)).cast("double"),
                    F.col("cn"),
                ).alias("cdf_cur"),
            )
            for i, e in enumerate(edges)
        ]
    )
    return (
        b.crossJoin(c)
        .select(F.explode(rows).alias("r"))
        .select(
            "r.i",
            "r.edge",
            "r.cdf_base",
            "r.cdf_cur",
            F.abs(F.col("r.cdf_base") - F.col("r.cdf_cur")).alias("d"),
        )
    )


def js_divergence(
    baseline: DataFrame,
    current: DataFrame,
    col: Column,
    lo: float,
    hi: float,
    n_bins: int = 10,
) -> DataFrame:
    """Per-bin Jensen–Shannon divergence terms between two samples of
    `col`: (bin, p, q, js_term) with total JS = SUM(js_term) ∈ [0, ln 2].
    JS is PSI's bounded, symmetric sibling — the mixture M = (P+Q)/2
    makes it finite even where one side has zero mass, so it is the
    right default for automated drift ALERTING thresholds (PSI's
    unbounded terms need per-feature tuning). Same plan shape as `psi`:
    two one-pass histograms, a |bins|-row join, a fixed arithmetic
    chain — IEEE-identical in any engine."""
    p = histogram_fractions(baseline, col, lo, hi, n_bins).withColumnRenamed(
        "frac", "p"
    )
    q = histogram_fractions(current, col, lo, hi, n_bins).withColumnRenamed(
        "frac", "q"
    )
    pe = F.greatest(F.col("p"), F.lit(PSI_EPS))
    qe = F.greatest(F.col("q"), F.lit(PSI_EPS))
    m = (pe + qe) / 2
    js = (pe * F.log(pe / m) + qe * F.log(qe / m)) / 2
    return p.join(q, "bin").select("bin", "p", "q", js.alias("js_term"))
