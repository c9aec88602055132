"""OPTIMIZE-style maintenance (plans/maintenance.py): compaction shrinks
the file count, data survives byte-for-byte, and the refreshed stats and
bloom indexes serve correct pruned reads afterwards."""

from pyspark.sql import functions as F

from vptstools_spark.plans.maintenance import optimize_table
from vptstools_spark.plans.skipping import read_pruned, read_pruned_equality


def _fragmented_table(spark, path):
    # 3 day-partitions x 4 small files each
    for chunk in range(4):
        df = spark.range(chunk * 100, (chunk + 1) * 100).select(
            F.col("id"),
            (F.col("id") % 3).cast("int").alias("day"),
            (F.col("id") * 7 % 1000).alias("v"),
        )
        df.repartition(1).write.mode("append").partitionBy("day").parquet(path)


def test_optimize_compacts_and_preserves_data(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _fragmented_table(spark, path)
    before = spark.read.parquet(path)
    rows_before = sorted(map(tuple, before.select("id", "day", "v").collect()))

    report = optimize_table(
        spark, path,
        partition_cols=["day"], zorder_cols=["v"],
        stats_cols=["v"], bloom_col="id",
    )
    assert report["n_files_before"] == 12
    assert report["n_files_after"] == 3  # one file per day partition
    after = spark.read.parquet(path)
    assert sorted(map(tuple, after.select("id", "day", "v").collect())) == rows_before


def test_optimize_refreshed_indexes_serve_pruned_reads(spark, tmp_path):
    path = str(tmp_path / "tbl2")
    _fragmented_table(spark, path)
    report = optimize_table(
        spark, path,
        partition_cols=["day"], zorder_cols=["v"],
        stats_cols=["v"], bloom_col="id",
    )
    stats, blooms = report["stats"], report["blooms"]
    # range probe through min/max stats
    got = sorted(
        r["id"] for r in read_pruned(spark, stats, "v", 0, 50).collect()
    )
    want = sorted(
        r["id"]
        for r in spark.read.parquet(path)
        .filter((F.col("v") >= 0) & (F.col("v") <= 50))
        .collect()
    )
    assert got == want and got
    # equality probe through the bloom index
    out = read_pruned_equality(spark, blooms, "id", 133).collect()
    assert [r["id"] for r in out] == [133]


def test_optimize_incremental_second_run_is_cheap_noop(spark, tmp_path):
    path = str(tmp_path / "tbl3")
    _fragmented_table(spark, path)
    r1 = optimize_table(
        spark, path, partition_cols=["day"], zorder_cols=["v"],
        stats_cols=["v"], bloom_col="id",
    )
    # append one new chunk, then refresh incrementally from r1's indexes
    spark.range(400, 450).select(
        F.col("id"), (F.col("id") % 3).cast("int").alias("day"),
        (F.col("id") * 7 % 1000).alias("v"),
    ).repartition(1).write.mode("append").partitionBy("day").parquet(path)
    r2 = optimize_table(
        spark, path, partition_cols=["day"], zorder_cols=["v"],
        stats_cols=["v"], bloom_col="id",
        stats=r1["stats"], blooms=r1["blooms"],
    )
    assert r2["n_files_after"] == 3
    # indexes cover exactly the current files and serve the new rows
    out = read_pruned_equality(spark, r2["blooms"], "id", 444).collect()
    assert [r["id"] for r in out] == [444]
    files_on_disk = {r["file"] for r in r2["blooms"].select("file").collect()}
    assert len(files_on_disk) == 3


def test_optimize_versioned_table_lifecycle(spark, tmp_path):
    from vptstools_spark.plans.maintenance import optimize_versioned_table
    from vptstools_spark.plans.timetravel import (
        commit_initial,
        delete_where,
        history,
        read_version,
    )

    path = str(tmp_path / "vt")
    df = spark.createDataFrame(
        [(i, i % 2, float(i)) for i in range(20)], "k long, day int, v double"
    )
    commit_initial(df, path, ["day"])
    delete_where(spark, path, "k % 4 = 0")

    # below threshold: metadata peek, no purge, no new version
    n = len(history(spark, path))
    rep = optimize_versioned_table(spark, path, max_dv_rows=100)
    assert rep == {"dv_rows": 5, "purged": False, "expired": [], "vacuumed": []}
    assert len(history(spark, path)) == n

    # above threshold: purge commits, values unchanged
    rep = optimize_versioned_table(spark, path, max_dv_rows=3)
    assert rep["purged"] and rep["dv_rows"] == 5
    assert sorted(r["k"] for r in read_version(spark, path).collect()) == [
        k for k in range(20) if k % 4
    ]

    # full lifecycle: expire history + vacuum the now-orphaned artifacts
    rep = optimize_versioned_table(
        spark, path, max_dv_rows=10**6, expire_keep_last=1, vacuum=True
    )
    assert rep["expired"] and rep["vacuumed"]
    assert sorted(r["k"] for r in read_version(spark, path).collect()) == [
        k for k in range(20) if k % 4
    ]
