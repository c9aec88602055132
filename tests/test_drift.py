"""Drift detection (operators/drift.py): PSI identities and direction."""

import pytest
from pyspark.sql import functions as F

from vptstools_spark.operators.drift import histogram_fractions, psi


def test_identical_distributions_zero_psi(spark):
    df = spark.range(1000).select((F.col("id") % 100).cast("double").alias("v"))
    out = psi(df, df, F.col("v"), lo=0.0, hi=100.0, n_bins=10).collect()
    assert len(out) == 10
    assert all(abs(r["psi_term"]) < 1e-12 for r in out)


def test_shift_is_detected_and_localized(spark):
    base = spark.range(1000).select((F.col("id") % 50).cast("double").alias("v"))
    cur = base.select((F.col("v") + 50.0).alias("v"))  # mass moves to upper half
    rows = {r["bin"]: r for r in psi(base, cur, F.col("v"), 0.0, 100.0, 10).collect()}
    total = sum(r["psi_term"] for r in rows.values())
    assert total > 0.25  # "act" threshold for a full shift
    # lower bins lost mass (p>0, q~0), upper gained — terms positive on both
    assert rows[0]["p"] > 0 and rows[0]["q"] == 0.0
    assert rows[9]["q"] > 0 and rows[9]["p"] == 0.0


def test_histogram_mass_conserved_with_outliers(spark):
    # values outside [lo, hi) clamp into edge bins — fractions sum to 1
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (50.0,), (99.0,), (1e9,)], "v double"
    )
    fr = histogram_fractions(df, F.col("v"), 0.0, 100.0, 10).collect()
    assert len(fr) == 10
    assert sum(r["frac"] for r in fr) == pytest.approx(1.0)
    by_bin = {r["bin"]: r["frac"] for r in fr}
    assert by_bin[0] == pytest.approx(0.4)  # -5 and 0 clamp low
    assert by_bin[9] == pytest.approx(0.4)  # 99 and 1e9 clamp high
