"""Versioned snapshots (plans/timetravel.py): pinned reads, partition-
scoped copy-on-write upserts, tombstones, version diffs, file sharing
between versions, and explicit expiry."""

import pytest
from pyspark.sql import functions as F

from vptstools_spark.plans.timetravel import (
    commit_initial,
    commit_upsert,
    diff_versions,
    expire_versions,
    history,
    read_version,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, day int, v double")


def _rows(df):
    return sorted((r["k"], r["day"], r["v"]) for r in df.collect())


def test_upsert_creates_new_version_and_preserves_old(spark, tmp_path):
    path = str(tmp_path / "tt")
    base = [(1, 0, 10.0), (2, 0, 20.0), (3, 1, 30.0)]
    assert commit_initial(_df(spark, base), path, ["day"]) == 0
    delta = _df(spark, [(2, 0, 25.0), (4, 0, 40.0)])
    assert commit_upsert(spark, path, delta, keys=["k"]) == 1

    assert _rows(read_version(spark, path, 0)) == sorted(base)
    assert _rows(read_version(spark, path, 1)) == [
        (1, 0, 10.0), (2, 0, 25.0), (3, 1, 30.0), (4, 0, 40.0),
    ]
    assert _rows(read_version(spark, path)) == _rows(read_version(spark, path, 1))


def test_untouched_partitions_share_files_across_versions(spark, tmp_path):
    from vptstools_spark.plans.timetravel import _read_commit

    path = str(tmp_path / "tt2")
    commit_initial(
        _df(spark, [(1, 0, 1.0), (2, 1, 2.0), (3, 2, 3.0)]), path, ["day"]
    )
    commit_upsert(spark, path, _df(spark, [(1, 0, 9.0)]), keys=["k"])
    f0 = set(_read_commit(spark, path, 0)["files"])
    f1 = set(_read_commit(spark, path, 1)["files"])
    shared = f0 & f1
    # day=1 and day=2 untouched -> their files carried; day=0 rewritten
    assert shared and all("day=0" not in f for f in shared)
    assert {f for f in f1 - f0} and all("day=0" in f for f in f1 - f0)


def test_tombstone_delete(spark, tmp_path):
    path = str(tmp_path / "tt3")
    commit_initial(_df(spark, [(1, 0, 1.0), (2, 0, 2.0)]), path, ["day"])
    delta = spark.createDataFrame(
        [(1, 0, 0.0, True), (3, 0, 3.0, False)],
        "k long, day int, v double, is_delete boolean",
    )
    commit_upsert(spark, path, delta, keys=["k"], delete_col="is_delete")
    assert _rows(read_version(spark, path)) == [(2, 0, 2.0), (3, 0, 3.0)]


def test_diff_versions_classifies(spark, tmp_path):
    path = str(tmp_path / "tt4")
    commit_initial(_df(spark, [(1, 0, 1.0), (2, 0, 2.0)]), path, ["day"])
    commit_upsert(
        spark, path, _df(spark, [(2, 0, 9.0), (5, 0, 5.0)]), keys=["k"]
    )
    out = {
        r["k"]: r["change"]
        for r in diff_versions(spark, path, 0, 1, keys=["k"]).collect()
    }
    assert out == {2: "changed", 5: "added"}


def test_history_and_expiry(spark, tmp_path):
    path = str(tmp_path / "tt5")
    commit_initial(_df(spark, [(1, 0, 1.0)]), path, ["day"])
    commit_upsert(spark, path, _df(spark, [(2, 0, 2.0)]), keys=["k"])
    commit_upsert(spark, path, _df(spark, [(3, 0, 3.0)]), keys=["k"])
    assert [h["version"] for h in history(spark, path)] == [0, 1, 2]
    assert expire_versions(spark, path, keep_last=1) == [0, 1]
    assert [h["version"] for h in history(spark, path)] == [2]
    with pytest.raises(Exception):
        read_version(spark, path, 0)
    assert _rows(read_version(spark, path)) == [
        (1, 0, 1.0), (2, 0, 2.0), (3, 0, 3.0),
    ]
