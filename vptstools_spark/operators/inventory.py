"""S3 inventory analytics — coverage + incremental partition selection.

Reference (src/vptstools/s3.py:263-384): chunked pandas scan of the AWS S3
inventory CSV, path feature extraction, h5 filter, modified-window filter,
hand-rolled two-phase group-counts. In Spark all of that is one declarative
plan: the chunking is partitioned scan, the partial/final aggregation is
Catalyst's HashAggregate(partial) → exchange → HashAggregate(final).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vptstools_spark.functions.paths import directory_col, with_parsed_inventory
from vptstools_spark.schemas import inventory_schema

#: inventory `modified` timestamp format (reference: src/vptstools/s3.py:290-292)
MODIFIED_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"

GROUP_COLS = ["source", "file_type", "radar_code", "year", "month", "day"]


def read_inventory(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """Scan the (gzipped, headerless) S3 inventory CSV S5
    (reference: src/vptstools/s3.py:344-350). Spark's partitioned CSV scan
    replaces the reference's 50k-row chunk loop."""
    df = spark.read.csv(path, schema=inventory_schema(), header=False)
    return df.withColumn("modified", F.to_timestamp("modified", MODIFIED_FORMAT))


def parse_inventory(df: DataFrame, on_malformed: str = "error") -> DataFrame:
    """Path feature extraction P11-P13 + h5 filter F1
    (reference: src/vptstools/s3.py:289-297).

    ``on_malformed`` routes ``.h5`` keys whose FILENAME does not match the
    ODIM grammar (parsed ``radar_code`` comes back empty — they would
    otherwise collapse into one bogus all-empty coverage group):

    - ``"error"`` (default): fail the scan, matching the reference's
      ``parse_file_name`` ValueError (src/vptstools/s3.py:74-99);
    - ``"drop"``: exclude them — the at-scale choice when one misnamed
      object must not kill a whole inventory sweep;
    - ``"keep"``: pass them through for callers that split them off
      themselves (``F.col("radar_code") == ""``).
    """
    parsed = with_parsed_inventory(df).filter(F.col("suffix") == "h5")
    bad = F.col("radar_code") == ""
    if on_malformed == "error":
        return parsed.withColumn(
            "radar_code",
            F.when(
                bad,
                F.raise_error(
                    F.concat(
                        F.lit("cannot parse ODIM filename: "), F.col("filename")
                    )
                ),
            ).otherwise(F.col("radar_code")),
        )
    if on_malformed == "drop":
        return parsed.filter(~bad)
    if on_malformed == "keep":
        return parsed
    raise ValueError(f"on_malformed must be error|drop|keep, got {on_malformed!r}")


def coverage(df_parsed: DataFrame) -> DataFrame:
    """Files per radar-day A1/A2 (reference: src/vptstools/s3.py:243-260,
    338-366). Catalyst emits partial+final hash aggregation automatically —
    the reference's chunk-accumulate-concat-regroup pattern is free here."""
    return (
        df_parsed.groupBy(*GROUP_COLS)
        .agg(F.count("*").alias("file_count"))
        .select(
            directory_col(*[F.col(c) for c in GROUP_COLS]).alias("directory"),
            "file_count",
        )
    )


def modified_window(df_parsed: DataFrame, days: int, now=None) -> DataFrame:
    """Modified-window predicate F2 (reference: src/vptstools/s3.py:228-240):
    keep rows whose `modified` falls within the lookback window. `now` is an
    explicit timestamp for deterministic tests (defaults to current time)."""
    now_col = F.lit(now).cast("timestamp") if now is not None else F.current_timestamp()
    return df_parsed.filter(
        F.col("modified") > now_col - F.make_interval(days=F.lit(days))
    )


def days_to_create_vpts(df_parsed: DataFrame, days: int, now=None) -> DataFrame:
    """Radar-days needing (re)derivation A3 (reference: src/vptstools/s3.py:368-382):
    group-count of the window-filtered subset. This is the incremental
    partition-selection input — at scale, this tiny result broadcasts into a
    semi-join against the file listing."""
    return coverage(modified_window(df_parsed, days, now))


def monthly_rollup(days_df: DataFrame) -> DataFrame:
    """Day → month rollup A4 (reference: src/vptstools/bin/vph5_to_vpts.py:204-211):
    truncate the day component and re-count."""
    parts = F.split(F.col("directory"), "/")
    month_dir = F.concat_ws(
        "/", *[F.element_at(parts, i) for i in range(1, 6)]
    )
    return (
        days_df.groupBy(month_dir.alias("directory"))
        .agg(F.sum("file_count").alias("file_count"))
    )


def select_affected_files(files_df: DataFrame, days_df: DataFrame, on: list[str] | None = None) -> DataFrame:
    """Semi-join files ⋉ modified radar-days (SURVEY §2.4): the reference
    iterates days and re-lists each folder (bin/vph5_to_vpts.py:160-165);
    Spark-first this is a broadcast left-semi join — days_df is tiny (days ×
    radars), so no shuffle of the big side."""
    on = on or GROUP_COLS
    return files_df.join(F.broadcast(days_df.select(*on).distinct()), on=on, how="left_semi")


def list_manifest_file_keys(manifest_path: str) -> list[str]:
    """S4: S3-inventory manifest JSON → inventory subfile keys
    (reference: src/vptstools/s3.py:318-335). The manifest is a tiny
    driver-side file; the heavy lifting is the CSV scan it points to."""
    import json

    with open(manifest_path) as fh:
        return [f["key"] for f in json.load(fh)["files"]]


def handle_manifest(
    spark: SparkSession,
    manifest_path: str,
    modified_days_ago: int = 2,
    now=None,
    key_to_path=None,
):
    """Manifest → (full coverage, days to recreate) — the reference's
    `handle_manifest` e2e contract (src/vptstools/s3.py:386-443): coverage
    aggregates the WHOLE inventory; days_to_create_vpts group-counts only
    the files modified inside the lookback window.

    ``key_to_path`` maps a manifest key to a readable path (production: an
    s3:// URL; tests: the fixture directory) — same dependency-injection
    seam as operators/transfer.py.
    """
    import os

    root = os.path.dirname(manifest_path)
    resolve = key_to_path or (lambda k: os.path.join(root, os.path.basename(k)))
    paths = [resolve(k) for k in list_manifest_file_keys(manifest_path)]
    parsed = parse_inventory(read_inventory(spark, paths))
    return coverage(parsed), days_to_create_vpts(parsed, modified_days_ago, now)
