"""Analytic sanity properties of the round-9 evaluation wave — bounds
and identities the DuckDB oracles cannot express (they verify equality,
not mathematical structure)."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_brier_murphy_identity(spark):
    """BS = uncertainty − resolution + reliability must hold to rounding."""
    from vptstools_spark.analytics.eval_q import q_brier_decomposition

    r = q_brier_decomposition(spark, SF).collect()[0]
    lhs = r["brier"]
    rhs = r["uncertainty"] - r["resolution"] + r["reliability"]
    # with BINNED forecasts the 3-term identity carries a residual equal
    # to the mean within-bin forecast variance: here p is ~uniform on
    # width-0.1 deciles, so the residual must sit near 0.1^2/12 ~ 0.00083
    # and is always non-negative
    assert 0.0 <= lhs - rhs <= 0.001
    assert 0.0 <= r["uncertainty"] <= 0.25  # p(1-p) max at 0.25


def test_kappa_bounds_and_perfect_agreement(spark):
    from vptstools_spark.analytics.eval_q import q_cohens_kappa

    r = q_cohens_kappa(spark, SF).collect()[0]
    assert -1.0 <= r["kappa"] <= 1.0
    assert r["n11"] + r["n10"] + r["n01"] + r["n00"] > 0
    # a rater always agrees with itself: kappa of (ra, ra) would be 1 —
    # check the formula on a synthetic identical-rater frame
    df = spark.range(0, 100).select(
        (F.col("id") % 2).alias("ra"), (F.col("id") % 2).alias("rb")
    )
    c = df.agg(
        F.count("*").alias("n"),
        F.sum(F.col("ra") * F.col("rb")).alias("n11"),
        F.sum((1 - F.col("ra")) * (1 - F.col("rb"))).alias("n00"),
    ).collect()[0]
    po = (c["n11"] + c["n00"]) / c["n"]
    assert po == 1.0


def test_ndcg_bounded_by_one(spark):
    from vptstools_spark.analytics.eval_q import q_ndcg_retrieval

    rows = q_ndcg_retrieval(spark, SF).collect()
    assert len(rows) == 3
    for r in rows:
        assert 0.0 < r["ndcg"] <= 1.0
        assert r["dcg"] <= r["idcg"]


def test_nelson_aalen_dominates_km_log_survival(spark):
    """H_NA(t) <= -ln(S_KM(t)) pointwise (1-x <= e^-x), both over the
    same life table — a cross-operator consistency law."""
    import math

    from vptstools_spark.analytics.eval_q import q_nelson_aalen
    from vptstools_spark.analytics.inference_q import q_kaplan_meier

    na = {r["tenure"]: r["cum_hazard"] for r in q_nelson_aalen(spark, SF).collect()}
    km = {r["tenure"]: r["survival"] for r in q_kaplan_meier(spark, SF).collect()}
    assert set(na) == set(km) and na
    for t in na:
        if km[t] > 0:
            assert na[t] <= -math.log(km[t]) + 1e-9


def test_conformal_coverage_at_least_nominal(spark):
    """Split-conformal with the conservative bucket edge guarantees
    >= 90% coverage in expectation; on this deterministic split it must
    hold outright (the bucket rounding only ADDS coverage)."""
    from vptstools_spark.analytics.eval_q import q_conformal_coverage

    r = q_conformal_coverage(spark, SF).collect()[0]
    assert r["coverage"] >= 0.9
    assert r["n_test"] > 0 and r["q_bucket"] >= 0


def test_bradley_terry_strengths_normalized_positive(spark):
    from vptstools_spark.analytics.eval_q import q_bradley_terry_regions

    rows = q_bradley_terry_regions(spark, SF).collect()
    assert len(rows) == 5
    assert all(r["bt_strength"] > 0 for r in rows)
    assert abs(sum(r["bt_strength"] for r in rows) - 1.0) < 5e-6


def test_horvitz_thompson_near_unbiased_here(spark):
    from vptstools_spark.analytics.eval_q import q_horvitz_thompson

    r = q_horvitz_thompson(spark, SF).collect()[0]
    assert 0 < r["n_sampled"] < r["n_total"]
    # one deterministic draw, not an expectation — but multiplicative-
    # hash sampling is uniform enough that a >25% miss would mean a
    # weighting bug, not sampling noise
    assert abs(r["rel_error"]) < 0.25


def test_haar_total_levels_and_pairs(spark):
    from vptstools_spark.analytics.eval_q import q_haar_energy_monthly

    rows = {r["level"]: r for r in q_haar_energy_monthly(spark, SF).collect()}
    assert set(rows) == {1, 2, 3}
    # pair counts halve (orphans drop): n2 in {n1//2, (n1-?)…} — exact
    # halving given n1 pairs become n1 block sums
    assert rows[2]["n_pairs"] == rows[1]["n_pairs"] // 2
    assert rows[3]["n_pairs"] == rows[2]["n_pairs"] // 2
    assert all(rows[l]["detail_energy_dollars2"] >= 0 for l in rows)


def test_mmd_nonnegative_and_zero_on_self(spark):
    """MMD²(P, P) = 0 by construction; the urgent-vs-rest statistic must
    be strictly positive (the groups genuinely differ in moments)."""
    from vptstools_spark.analytics.eval_q import q_mmd_poly

    r = q_mmd_poly(spark, SF).collect()[0]
    assert r["mmd2_x1e6"] >= 0.0


def test_changepoint_gain_positive(spark):
    from vptstools_spark.analytics.eval_q import q_changepoint_binary_seg

    r = q_changepoint_binary_seg(spark, SF).collect()[0]
    assert r["gain_dollars2"] >= 0.0  # splitting can never increase SSE
    assert r["sse_dollars2"] > 0.0


def test_seq_rules_confidence_bounds(spark):
    from vptstools_spark.analytics.eval_q import q_seq_rule_mining

    rows = q_seq_rule_mining(spark, SF).collect()
    assert rows, "support floor must keep the small-sf answer non-empty"
    for r in rows:
        assert 0.0 < r["confidence"] <= r["support"]  # conf <= support trivially
        assert r["lift"] > 0.0


def test_krippendorff_alpha_range(spark):
    from vptstools_spark.analytics.eval_q import q_krippendorff_alpha

    r = q_krippendorff_alpha(spark, SF).collect()[0]
    assert r["d_expected"] > 0
    assert -1.0 <= r["alpha"] <= 1.0


def test_overdispersion_consistent_with_moments(spark):
    from vptstools_spark.analytics.eval_q import q_overdispersion_daily

    r = q_overdispersion_daily(spark, SF).collect()[0]
    assert r["mean_daily"] > 0 and r["dispersion"] >= 0


def test_huber_between_min_and_max(spark):
    from vptstools_spark.analytics.eval_q import q_huber_location
    from vptstools_spark.io import table

    r = q_huber_location(spark, SF).collect()[0]
    mm = table(spark, SF, "orders").agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    ).collect()[0]
    assert mm["lo"] < r["huber_mu"] < mm["hi"]


def test_cuped_reduces_or_keeps_arm_gap_scale(spark):
    from vptstools_spark.analytics.eval_q import q_cuped_adjusted

    rows = q_cuped_adjusted(spark, SF).collect()
    assert len(rows) == 2
    thetas = {r["theta"] for r in rows}
    assert len(thetas) == 1  # pooled theta identical across arms


def test_hotspot_detects_planted_cluster(spark):
    """The planted corner cluster (every 7th customer) must be among the
    flagged cells — the z-score machinery finds a real signal, not noise."""
    from vptstools_spark.analytics.eval_q import q_hotspot_grid_zscore

    rows = q_hotspot_grid_zscore(spark, SF).collect()
    assert rows
    assert any(r["cx"] <= 1 and r["cy"] <= 1 for r in rows)


def test_shapley_additivity_direction(spark):
    from vptstools_spark.analytics.eval_q import q_shapley_linear

    r = q_shapley_linear(spark, SF).collect()[0]
    # extendedprice = qty * unit price (discount NOT applied in TPC-H),
    # so the quantity coefficient must be positive; attribution
    # magnitudes are non-negative by construction
    assert r["beta_quantity"] > 0
    assert r["mean_abs_shap_quantity"] > 0
    assert r["mean_abs_shap_discount"] >= 0
