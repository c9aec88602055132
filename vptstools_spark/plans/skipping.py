"""File-level data skipping: collect per-file column statistics and plan
scans that read only the files a predicate can touch (the Delta/Iceberg
"data skipping" idea on plain parquet directories).

Spark already prunes row groups inside a file via parquet footers, but the
*driver still lists and opens every file*. At 100 TB / millions of files,
an external stats table (one row per file — KB-scale) lets the planner cut
the file list BEFORE any footer I/O: `files_for_predicate` intersects the
predicate's [lo, hi] with each file's [min, max] and returns the read set.
Combined with `plans/zorder.py` layout (which makes per-file ranges tight
on multiple dimensions) this is the full OPTIMIZE+skipping loop.

The stats collection is one distributed pass (`input_file_name()` +
groupBy-file aggregate) and is itself restartable — re-collect only files
newer than the stats table's snapshot if you maintain it incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def collect_file_stats(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """One row per data file: row count plus min/max/null-count per tracked
    column. Shuffle carries |files| rows — footer-scale, not data-scale."""
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
        ]
    return (
        df.withColumn("__file", F.input_file_name())
        .groupBy("__file")
        .agg(*aggs)
        .withColumnRenamed("__file", "file")
    )


def files_for_predicate(stats: DataFrame, col: str, lo, hi) -> list[str]:
    """Files whose [min, max] range for `col` intersects [lo, hi] (either
    bound may be None = unbounded). Files that are all-NULL in `col` never
    match a range predicate and are skipped; files with a NULL min/max but
    rows (shouldn't happen for parquet) are kept conservatively.

    Returns the file list for `read_pruned` — driver-sized by contract
    (one entry per *kept* file)."""
    cond = F.lit(True)
    if lo is not None:
        cond = cond & (F.col(f"{col}__max") >= F.lit(lo))
    if hi is not None:
        cond = cond & (F.col(f"{col}__min") <= F.lit(hi))
    # all-NULL files: min/max are NULL → comparisons are NULL → dropped,
    # unless the file also has non-null rows (then min/max are non-null)
    kept = stats.filter(cond).select("file")
    return [r["file"] for r in kept.collect()]


def read_pruned(
    spark: SparkSession, stats: DataFrame, col: str, lo, hi
) -> DataFrame:
    """Scan only the files the predicate can touch. The residual filter is
    still applied (file ranges overlap the predicate, rows inside may not),
    so the result equals the full-scan filter — skipping is purely I/O."""
    files = files_for_predicate(stats, col, lo, hi)
    if not files:
        # preserve schema on an empty read set
        any_file = [r["file"] for r in stats.select("file").limit(1).collect()]
        empty = spark.read.parquet(*any_file) if any_file else None
        if empty is None:
            raise ValueError("stats table is empty — collect_file_stats first")
        return empty.filter(F.lit(False))
    df = spark.read.parquet(*files)
    if lo is not None:
        df = df.filter(F.col(col) >= F.lit(lo))
    if hi is not None:
        df = df.filter(F.col(col) <= F.lit(hi))
    return df


def update_file_stats(
    spark: SparkSession, path: str, stats: DataFrame, cols: list[str]
) -> DataFrame:
    """Incrementally maintain the stats table: collect stats ONLY for data
    files not yet covered (new files from appends/compaction), union with
    the existing rows that still exist on disk (dropping tombstones for
    files a rewrite removed). One listing + one pass over the NEW bytes —
    at 100 TB this is the difference between stats maintenance being a
    nightly no-op and a full-table rescan."""
    # filesystem listing, NOT a data scan — input_file_name() would read
    # every row of every file just to learn the file names
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    it = fs.listFiles(p, True)
    current = set()
    while it.hasNext():
        f = it.next().getPath().toString()
        name = f.rsplit("/", 1)[-1]
        if name.endswith(".parquet") and not name.startswith(("_", ".")):
            current.add(f)
    known = {r["file"] for r in stats.select("file").collect()}
    fresh = sorted(current - known)
    kept = stats.filter(F.col("file").isin(list(current)))
    if not fresh:
        return kept
    df = spark.read.parquet(*fresh)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
        ]
    new_stats = (
        df.withColumn("__file", F.input_file_name())
        .groupBy("__file")
        .agg(*aggs)
        .withColumnRenamed("__file", "file")
    )
    return kept.unionByName(new_stats)
