"""Keyed MERGE into partitioned parquet: upsert, delete, partition-scoped
rewrite (untouched partitions' files are not rewritten)."""

from __future__ import annotations

import glob
import os

from vptstools_spark.operators.merge import merge_upsert


def _rows(spark, path):
    return {
        (r.k, r.p): r.v
        for r in spark.read.parquet(path).collect()
    }


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, p string, v double")


def test_merge_first_write_then_upsert_insert_delete(spark, tmp_path):
    path = str(tmp_path / "t")
    merge_upsert(spark, path, _df(spark, [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)]),
                 keys=["k"], partition_cols=["p"])
    assert _rows(spark, path) == {(1, "a"): 1.0, (2, "a"): 2.0, (3, "b"): 3.0}

    # update k=1, insert k=4, both in partition a; delete k=3 in partition b
    delta = spark.createDataFrame(
        [(1, "a", 10.0, False), (4, "a", 4.0, False), (3, "b", 0.0, True)],
        "k long, p string, v double, is_delete boolean",
    )
    merge_upsert(spark, path, delta, keys=["k"], partition_cols=["p"],
                 delete_col="is_delete")
    assert _rows(spark, path) == {(1, "a"): 10.0, (2, "a"): 2.0, (4, "a"): 4.0}


def test_merge_leaves_untouched_partitions_alone(spark, tmp_path):
    path = str(tmp_path / "t")
    merge_upsert(spark, path, _df(spark, [(1, "a", 1.0), (2, "b", 2.0)]),
                 keys=["k"], partition_cols=["p"])
    before = {f: os.stat(f).st_mtime_ns for f in glob.glob(f"{path}/p=b/*.parquet")}
    assert before

    merge_upsert(spark, path, _df(spark, [(1, "a", 9.0)]),
                 keys=["k"], partition_cols=["p"])
    after = {f: os.stat(f).st_mtime_ns for f in glob.glob(f"{path}/p=b/*.parquet")}
    assert after == before  # dynamic overwrite rewrote only partition a
    assert _rows(spark, path) == {(1, "a"): 9.0, (2, "b"): 2.0}


def test_merge_empty_delta_is_noop(spark, tmp_path):
    path = str(tmp_path / "t")
    merge_upsert(spark, path, _df(spark, [(1, "a", 1.0)]),
                 keys=["k"], partition_cols=["p"])
    merge_upsert(spark, path, _df(spark, []), keys=["k"], partition_cols=["p"])
    assert _rows(spark, path) == {(1, "a"): 1.0}
