"""Bucketed (co-located) joins — pre-shuffling data at write time.

At 100 TB the dominant cost of fact⋈fact joins (orders⋈lineitem) is the
shuffle of both sides on the join key. Bucketing moves that shuffle to write
time, once: both tables hash-partitioned into the same number of buckets on
the join key, so every subsequent join/aggregation on that key reads
co-located buckets and the exchange disappears from the plan entirely.
The reference has no storage layout control at all (plain S3 objects); this
is the Spark-native answer to its radar-day path partitioning taken one step
further (SURVEY §1.3).

Use `write_bucketed` for the curated silver layer; verify with
`has_shuffle(df)` — the plan audit in PLANS.md tracks the same invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    keys: list[str],
    num_buckets: int = 64,
    path: str | None = None,
    sorted_by: list[str] | None = None,
) -> None:
    """Persist `df` as a bucketed table on `keys`.

    `sorted_by` (defaults to the bucket keys) additionally sorts within each
    bucket file, letting sort-merge joins skip the per-task sort. `path`
    makes the table external (data outside the warehouse dir).
    Both sides of a co-located join must use the same `num_buckets`.
    """
    writer = df.write.format("parquet").bucketBy(num_buckets, *keys)
    writer = writer.sortBy(*(sorted_by or keys))
    if path is not None:
        writer = writer.option("path", path)
    writer.mode("overwrite").saveAsTable(name)


def read_table(spark: SparkSession, name: str) -> DataFrame:
    """Catalog read — bucketing metadata only survives via the catalog, not
    via spark.read.parquet(path)."""
    return spark.table(name)


def has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains any Exchange (shuffle) operator.

    Test/audit helper: a co-located bucketed join must report False."""
    return "Exchange" in df._jdf.queryExecution().executedPlan().toString()
