"""Degree-ordered triangle counting (operators/graph.py:triangle_count)."""

from pyspark.sql import functions as F

from vptstools_spark.operators.graph import triangle_count


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src int, dst int")


def _counts(df):
    return {r["node"]: r["n_triangles"] for r in df.collect()}


def test_k4_complete_graph(spark):
    # K4 has 4 triangles; every node is in exactly 3
    pairs = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = _counts(triangle_count(_edges(spark, pairs)))
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_with_pendant(spark):
    # 0-1-2 triangle plus pendant 3 attached to 0: pendant is in no triangle
    got = _counts(triangle_count(_edges(spark, [(0, 1), (1, 2), (0, 2), (0, 3)])))
    assert got == {0: 1, 1: 1, 2: 1}


def test_square_has_no_triangles(spark):
    got = _counts(triangle_count(_edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])))
    assert got == {}


def test_duplicate_reversed_and_self_edges_ignored(spark):
    # same triangle given with duplicates, reversed orientation, self-loop
    pairs = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 2), (1, 1)]
    got = _counts(triangle_count(_edges(spark, pairs)))
    assert got == {0: 1, 1: 1, 2: 1}


def test_two_triangles_sharing_an_edge(spark):
    # 0-1-2 and 1-2-3: edge (1,2) shared → nodes 1,2 in two triangles each
    got = _counts(
        triangle_count(_edges(spark, [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]))
    )
    assert got == {0: 1, 1: 2, 2: 2, 3: 1}
