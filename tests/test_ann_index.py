"""Persisted IVF+PQ index: build → search must equal the inline operator
exactly, and the search scan must prune to the probed cells at planning
time."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F


def _corpus(spark, n=64, dim=4):
    coords = [((F.col("id") * (3 + i) + i) % 17).cast("float") for i in range(dim)]
    return spark.range(n).select(
        F.col("id").alias("vec_id"), F.array(*coords).alias("embedding")
    )


def test_index_search_equals_inline_ivfpq(spark, tmp_path):
    from vptstools_spark.operators.ann_index import (
        build_ivfpq_index,
        search_ivfpq_index,
    )
    from vptstools_spark.operators.similarity import kmeans_fit, knn_ivfpq, pq_fit

    corpus = _corpus(spark)
    queries = _corpus(spark, n=8)
    anchors = kmeans_fit(corpus, k=4, iters=1)
    books = pq_fit(corpus, m=2, k=4, iters=1)

    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(corpus, path, anchors, books)

    inline = knn_ivfpq(corpus, queries, anchors, books, k=3, nprobe=2).collect()
    persisted = search_ivfpq_index(spark, path, queries, k=3, nprobe=2).collect()
    assert sorted(map(tuple, persisted)) == sorted(map(tuple, inline))


def test_index_scan_prunes_unprobed_cells(spark, tmp_path):
    from vptstools_spark.operators.ann_index import (
        build_ivfpq_index,
        search_ivfpq_index,
    )
    from vptstools_spark.operators.similarity import kmeans_fit, pq_fit

    corpus = _corpus(spark, n=200)
    anchors = kmeans_fit(corpus, k=8, iters=1)
    books = pq_fit(corpus, m=2, k=4, iters=1)
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(corpus, path, anchors, books)
    assert len(glob.glob(f"{path}/index/cell=*")) >= 4  # multiple partitions

    one_query = _corpus(spark, n=1)
    df = search_ivfpq_index(spark, path, one_query, k=3, nprobe=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the literal isin(cell, ...) must reach the scan as a partition filter
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1][:160]
    assert "cell" in pf and "IN" in pf.upper(), pf
    assert df.count() == 3


def test_incremental_append_equals_rebuild(spark, tmp_path):
    """Two delta batches appended with the frozen model must search
    IDENTICALLY to a full rebuild over base+deltas with the same model."""
    from vptstools_spark.operators.ann_index import (
        append_ivfpq_index,
        build_ivfpq_index,
        search_ivfpq_index,
    )
    from vptstools_spark.operators.similarity import kmeans_fit, pq_fit

    full = _corpus(spark, n=96)
    base = full.filter(F.col("vec_id") < 64)
    delta1 = full.filter((F.col("vec_id") >= 64) & (F.col("vec_id") < 80))
    delta2 = full.filter(F.col("vec_id") >= 80)
    queries = _corpus(spark, n=8)
    anchors = kmeans_fit(base, k=4, iters=1)
    books = pq_fit(base, m=2, k=4, iters=1)

    inc_path = str(tmp_path / "inc")
    build_ivfpq_index(base, inc_path, anchors, books)
    s1 = append_ivfpq_index(delta1, inc_path)
    s2 = append_ivfpq_index(delta2, inc_path)

    rebuilt_path = str(tmp_path / "rebuilt")
    build_ivfpq_index(full, rebuilt_path, anchors, books)

    got = search_ivfpq_index(spark, inc_path, queries, k=5, nprobe=2).collect()
    want = search_ivfpq_index(spark, rebuilt_path, queries, k=5, nprobe=2).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))

    # sidecar staleness bookkeeping
    assert (s1["n_appended"], s2["n_appended"]) == (16, 32)
    assert s2["n_base"] == 64
    assert s2["stale_fraction"] == 32 / 96


def test_append_upserts_same_cell_id(spark, tmp_path):
    """Re-appending an existing vec_id replaces its row (no duplicates)."""
    from vptstools_spark.operators.ann_index import (
        append_ivfpq_index,
        build_ivfpq_index,
    )
    from vptstools_spark.operators.similarity import kmeans_fit, pq_fit

    base = _corpus(spark, n=32)
    anchors = kmeans_fit(base, k=4, iters=1)
    books = pq_fit(base, m=2, k=4, iters=1)
    path = str(tmp_path / "up")
    build_ivfpq_index(base, path, anchors, books)
    append_ivfpq_index(base.filter(F.col("vec_id") < 8), path)
    idx = spark.read.parquet(f"{path}/index")
    assert idx.count() == 32
    assert idx.groupBy("n_id").count().filter("count > 1").count() == 0
