"""Distributed global ranking — the scalable replacement for
``Window.orderBy(...)`` with no ``partitionBy`` (which funnels the whole
input through ONE partition: the classic scale-killer).

Recipe: range-repartition on the sort keys so partition i holds keys ≤
partition i+1, rank locally per partition (a PARTITIONED window — no
single-partition exchange), then add per-partition prefix offsets (a
driver-side list of partition counts — one tiny collect). Total cost: one
range shuffle + one pid-hash shuffle, both full-width.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def distributed_row_number(
    df: DataFrame,
    order_cols: list[str],
    rn_col: str = "_rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global 1-based row_number over a TOTAL order (make ``order_cols``
    unique via a tie-break key) without a single-partition window.

    Returns ``df`` plus ``rn_col``. The frame is persisted internally so the
    partition→count census and the ranked output see the same partitioning;
    callers should trigger exactly one action then let it age out.
    """
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n_parts, *[F.col(c) for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    # tiny collect: one row per partition
    counts = {
        r["_pid"]: r["n"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_expr: Column = F.lit(0)
    if offsets:
        offset_expr = F.element_at(
            F.create_map(
                *[F.lit(x) for kv in offsets.items() for x in kv]
            ),
            F.col("_pid"),
        )
    local_w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    return (
        ranged.withColumn(rn_col, F.row_number().over(local_w) + offset_expr)
        .drop("_pid")
    )


def ntile_expr(rn: Column, n: int, k: int) -> Column:
    """Exact SQL NTILE(k) bucket from a global row number and total count:
    the first ``n % k`` buckets hold ``n//k + 1`` rows, the rest ``n//k``
    (the standard NTILE distribution rule)."""
    q, rem = divmod(n, k)
    big = rem * (q + 1)  # rows covered by the larger buckets
    if q == 0:
        return F.least(rn, F.lit(k)).cast("int")
    return (
        F.when(rn <= big, F.floor((rn - 1) / (q + 1)) + 1)
        .otherwise(F.lit(rem) + F.floor((rn - big - 1) / q) + 1)
        .cast("int")
    )
