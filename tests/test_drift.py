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


def test_ks_on_grid_known_distance(spark):
    from vptstools_spark.operators.drift import ks_on_grid

    # baseline uniform over {1..4}, current all mass at {3,4}:
    # at edge 2: |0.5 - 0.0| = 0.5 (the KS distance), at edge 4: both 1.0
    base = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (4.0,)], "v double")
    cur = spark.createDataFrame([(3.0,), (4.0,)], "v double")
    out = {
        r["edge"]: (r["cdf_base"], r["cdf_cur"], r["d"])
        for r in ks_on_grid(base, cur, F.col("v"), [1.0, 2.0, 3.0, 4.0]).collect()
    }
    assert out[2.0] == (0.5, 0.0, 0.5)
    assert out[4.0] == (1.0, 1.0, 0.0)
    assert max(d for _, _, d in out.values()) == 0.5


def test_ks_on_grid_nulls_carry_no_mass(spark):
    from vptstools_spark.operators.drift import ks_on_grid

    base = spark.createDataFrame([(1.0,), (None,)], "v double")
    cur = spark.createDataFrame([(1.0,)], "v double")
    out = ks_on_grid(base, cur, F.col("v"), [1.0]).collect()
    assert out[0]["cdf_base"] == 1.0 and out[0]["d"] == 0.0


def test_ks_on_grid_empty_side_yields_null_cdf(spark):
    from vptstools_spark.operators.drift import ks_on_grid

    base = spark.createDataFrame([], "v double")
    cur = spark.createDataFrame([(1.0,)], "v double")
    out = ks_on_grid(base, cur, F.col("v"), [1.0]).collect()
    # try_divide by a zero count → NULL, never a crash or a fake 0 distance
    assert out[0]["cdf_base"] is None and out[0]["d"] is None
