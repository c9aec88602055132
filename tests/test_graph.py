"""Connected components (operators/graph.py): correctness + convergence."""

import pytest
from pyspark.sql import functions as F

from vptstools_spark.operators.graph import cluster_sizes, connected_components


def _components(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df).collect()
    return {r["node"]: r["component"] for r in out}


def test_two_components(spark):
    got = _components(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_longer_than_one_hop(spark):
    # a 6-node path: min label must propagate the full diameter
    edges = [(i, i + 1) for i in range(6)]
    got = _components(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 7


def test_edge_direction_irrelevant(spark):
    assert _components(spark, [(5, 2)]) == _components(spark, [(2, 5)])


def test_self_loop_and_duplicate_edges(spark):
    got = _components(spark, [(4, 4), (4, 7), (7, 4), (4, 7)])
    assert got == {4: 4, 7: 4}


def test_cluster_sizes(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "src long, dst long")
    cc = connected_components(df)
    sizes = {r["component"]: r["n_nodes"] for r in cluster_sizes(cc).collect()}
    assert sizes == {1: 3, 10: 2}


def test_max_iter_bounds_work(spark):
    # max_iter=1 on a path must still return every node exactly once, but the
    # unconverged exit is signalled — silent partial labels are wrong clusters
    df = spark.createDataFrame([(i, i + 1) for i in range(4)], "src long, dst long")
    with pytest.warns(RuntimeWarning, match="did not converge"):
        out = connected_components(df, max_iter=1)
        assert out.count() == 5
        assert out.select(F.countDistinct("node")).first()[0] == 5


def test_max_iter_strict_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(4)], "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=1, strict=True)


def test_converged_run_emits_no_warning(spark):
    import warnings

    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        out = connected_components(df, max_iter=10)
        assert out.filter(F.col("component") != 1).count() == 0
