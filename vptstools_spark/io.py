"""Table loading helpers for the driver-provided parquet test tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one of the harness parquet tables.

    Plain ``spark.read.parquet`` so Catalyst gets full pushdown/pruning;
    never cache here — callers decide lifetimes.

    TIMESTAMP(NANOS) columns (events.ts) arrive as nanosecond longs under
    `spark.sql.legacy.parquet.nanosAsLong` and are converted to microsecond
    timestamps here (Spark's maximum precision; oracles compare at µs).
    """
    if name == "events":
        # runtime-settable; required whatever session the caller built
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
