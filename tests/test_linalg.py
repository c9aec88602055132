"""operators/linalg.py — mergeable mapInPandas Gramian moments: the
distributed covariance must equal numpy's direct computation regardless of
how rows are split into partitions/batches."""

import numpy as np
import pytest

from vptstools_spark.operators.linalg import covariance_matrix, gramian_moments


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.default_rng(7)
    x = rng.normal(size=(50, 6)).astype(np.float32)
    rows = [(i, [float(v) for v in x[i]]) for i in range(len(x))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, x.astype(np.float64)


def test_covariance_matches_numpy_direct(spark, vec_df):
    df, x = vec_df
    got = {
        (r.i, r.j): r.cov
        for r in covariance_matrix(df, "embedding").collect()
    }
    want = np.cov(x, rowvar=False, bias=True)  # population covariance
    d = x.shape[1]
    assert len(got) == d * (d + 1) // 2
    for i in range(d):
        for j in range(i, d):
            assert got[(i + 1, j + 1)] == pytest.approx(want[i, j], abs=1e-9)


def test_covariance_partitioning_invariant(spark, vec_df):
    """Merging partial moments across many small batches must give the
    same result as one batch — the mergeability contract."""
    df, _ = vec_df
    one = {
        (r.i, r.j): r.cov
        for r in covariance_matrix(df.coalesce(1), "embedding").collect()
    }
    many = {
        (r.i, r.j): r.cov
        for r in covariance_matrix(df.repartition(8), "embedding").collect()
    }
    assert one.keys() == many.keys()
    for k in one:
        assert many[k] == pytest.approx(one[k], abs=1e-9)


def test_dims_slice_pushed_into_kernel(spark, vec_df):
    df, x = vec_df
    mom = gramian_moments(df, "embedding", dims=3)
    rows = mom.collect()
    assert {(r.i, r.j) for r in rows} <= {
        (i, j) for i in range(1, 4) for j in range(1, 4) if i <= j
    }
    # partial Gramian sums reduce to the direct X^T X on the slice
    tot = {}
    for r in rows:
        tot[(r.i, r.j)] = tot.get((r.i, r.j), 0.0) + r.g
    want = x[:, :3].T @ x[:, :3]
    for (i, j), g in tot.items():
        assert g == pytest.approx(want[i - 1, j - 1], rel=1e-12)


def test_power_iteration_approaches_top_eigenvector(spark):
    """On a spiked covariance (one dominant direction), 3 power-iteration
    rounds must align with numpy's leading eigenvector."""
    rng = np.random.default_rng(11)
    direction = np.array([3.0, 1.0, 0.5, 0.0])
    x = (
        rng.normal(size=(200, 1)) * direction[None, :]
        + rng.normal(scale=0.05, size=(200, 4))
    ).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(len(x))],
        "vec_id long, embedding array<float>",
    )
    from vptstools_spark.operators.linalg import pca_top_component

    got = np.array(
        [r.loading for r in pca_top_component(df, "embedding", iters=3)
         .orderBy("i").collect()]
    )
    assert np.linalg.norm(got) == pytest.approx(1.0, abs=1e-9)
    cov = np.cov(x.astype(np.float64), rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    top = evecs[:, -1]
    assert abs(float(got @ top)) > 0.999  # aligned up to sign


def test_mahalanobis_outlier_rate_sane(spark):
    from vptstools_spark.analytics.similarity_q import q_mahalanobis_outliers

    r = q_mahalanobis_outliers(spark, "/root/testdata/sf0.001").collect()[0]
    assert r.n_vectors > 0
    # 99% chi-square threshold: outlier rate should be small but the
    # max distance must exceed typical values
    assert 0 <= r.n_outliers <= 0.1 * r.n_vectors
    assert r.max_d2 > 2.0


def test_covariance_stable_on_shifted_data(spark):
    """|mean| >> std is the catastrophic-cancellation regime for the raw
    (G - S_i S_j / n)/n closed form: at mean 1e7, std 1, float64 keeps
    ~16 digits and G ~ 1e14 * n eats all of cov's significant digits.
    The global-pivot shift must hold the numpy-direct answer anyway."""
    rng = np.random.default_rng(11)
    x = rng.normal(loc=1e7, scale=1.0, size=(60, 4))
    rows = [(i, [float(v) for v in x[i]]) for i in range(len(x))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r.i, r.j): r.cov
        for r in covariance_matrix(df.repartition(6), "embedding").collect()
    }
    want = np.cov(x, rowvar=False, bias=True)
    for i in range(4):
        for j in range(i, 4):
            assert got[(i + 1, j + 1)] == pytest.approx(
                want[i, j], rel=1e-9, abs=1e-9
            )
