"""Keyed MERGE (upsert/delete) into partitioned parquet — the write-path
form of the CDC keep-latest compaction (`analytics/relational.py:
q_latest_order` is the read-path form).

Core Spark has no MERGE INTO against plain parquet (that's a table-format
feature — Delta/Iceberg); pipelines on raw object storage still need keyed
upserts, so the engine provides the classic partition-rewrite pattern:

1. restrict the target scan to the partitions the delta touches (partition
   pruning — an IN-list of partition values, pushed to the file listing);
2. anti-join those target rows against the delta keys (drop rows being
   replaced or deleted);
3. union the surviving rows with the delta's upserts;
4. dynamic-partition-overwrite ONLY the touched partitions
   (`partitionOverwriteMode=dynamic`, set in session.get_spark).

At 100 TB the cost scales with the TOUCHED partitions, not the table: the
untouched bulk is never read or written. The delta's distinct partition
list is metadata-sized (collected to the driver, like the streaming
rollup's day list in streaming/incremental.py:incremental_rollup_sink);
the delta side of the anti-join broadcasts when small. The same
object-store committer caveat applies as for incremental_rollup_sink:
read-modify-overwrite of one path in one job is safe with rename-based
committers; on direct-commit stores, stage to a temp prefix and swap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    delta: DataFrame,
    keys: list[str],
    partition_cols: list[str],
    delete_col: str | None = None,
) -> None:
    """Merge `delta` into the partitioned parquet table at `target_path`.

    Delta rows replace target rows with the same `keys`; rows where
    `delete_col` is true are tombstones (key removed, nothing inserted).
    First write (no target yet) degenerates to a plain partitioned write.
    """
    upserts = delta.filter(~F.col(delete_col)) if delete_col else delta
    upserts = upserts.drop(*([delete_col] if delete_col else []))

    from vptstools_spark.streaming.incremental import _hadoop_path_exists

    if not _hadoop_path_exists(spark, target_path):
        upserts.write.mode("overwrite").partitionBy(*partition_cols).parquet(
            target_path
        )
        return

    touched = [
        tuple(r)
        for r in delta.select(*partition_cols).distinct().collect()
    ]
    if not touched:
        return
    target = spark.read.parquet(target_path)
    # literal OR-of-ANDs over the touched partition values: Catalyst folds
    # this into partition pruning, so only touched partitions are scanned
    from functools import reduce

    conds = [
        reduce(
            Column.__and__,
            [F.col(c) == F.lit(v) for c, v in zip(partition_cols, t)],
        )
        for t in touched
    ]
    in_touched = reduce(Column.__or__, conds)
    kept = target.filter(in_touched).join(
        F.broadcast(delta.select(*keys).distinct()), keys, "left_anti"
    )
    merged = kept.unionByName(upserts.select(*target.columns))
    # self-referencing read→overwrite: materialize before the write so the
    # scan completes before any file is replaced (rename-committer safe)
    merged = merged.localCheckpoint(eager=True)
    # dynamic overwrite forced per-write: without it a default-config session
    # would truncate untouched partitions
    merged.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy(*partition_cols).parquet(target_path)
    # dynamic overwrite only rewrites partitions that PRODUCE rows — a
    # delete that empties a partition leaves its old files behind. Remove
    # touched partitions that ended up empty (metadata-sized driver work).
    remaining = {
        tuple(r) for r in merged.select(*partition_cols).distinct().collect()
    }
    emptied = [t for t in touched if t not in remaining]
    if emptied:
        jvm = spark.sparkContext._jvm
        jsc = spark.sparkContext._jsc
        for t in emptied:
            subdir = "/".join(f"{c}={v}" for c, v in zip(partition_cols, t))
            jpath = jvm.org.apache.hadoop.fs.Path(f"{target_path}/{subdir}")
            fs = jpath.getFileSystem(jsc.hadoopConfiguration())
            fs.delete(jpath, True)
