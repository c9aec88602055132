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


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure enough partitions for an expensive narrow stage downstream.

    Single-row-group parquet files scan as ONE task, serializing any
    Arrow-UDF / quadratic map work that follows. When the plan has fewer
    partitions than cores, round-robin repartition up to the default
    parallelism; when the input already splits (any real at-scale dataset),
    this is a no-op — so the shuffle cost exists only in exactly the regime
    where it's trivial (small inputs).
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if _plan_num_partitions(df) >= target:
        return df
    return df.repartition(target)


def _plan_num_partitions(df: DataFrame) -> int:
    """Partition count of the physical plan, read JVM-side.

    ``df.rdd.getNumPartitions()`` builds the whole Python-RDD conversion
    (plan → JVM RDD → Python serializer wrapper) on every call; asking the
    executed plan directly skips the Python wrapper and launches no job.
    Internal API — falls back to the public route if it ever moves.
    """
    try:
        return int(df._jdf.queryExecution().executedPlan().execute().getNumPartitions())
    except Exception:
        return df.rdd.getNumPartitions()


def write_text_sidecar(spark: SparkSession, path: str, text: str) -> None:
    """Write a small driver-sized text/JSON sidecar via the Hadoop FS API,
    so metadata lands next to its data on ANY supported scheme (local,
    HDFS, s3a) — a plain open() would silently localize `s3a://…` paths."""
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    out = fs.create(jpath, True)
    out.write(bytearray(text.encode("utf-8")))
    out.close()


def create_text_exclusive(spark: SparkSession, path: str, text: str) -> bool:
    """Atomically create `path` with `text` ONLY if it does not exist;
    returns False (without writing) when it already does. `fs.create(p,
    overwrite=false)` is the one atomic primitive HDFS/local FS give us —
    the basis for optimistic-concurrency commit logs (two writers racing
    to create the same commit file: exactly one wins). Object stores
    without atomic create-exclusive (plain S3) need a log service or a
    conditional-put layer instead — callers document that scope."""
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    try:
        out = fs.create(jpath, False)
    except Exception:
        return False
    out.write(bytearray(text.encode("utf-8")))
    out.close()
    return True


def _default_fs_is_local(spark: SparkSession) -> bool:
    """True when Hadoop's fs.defaultFS resolves scheme-less paths to the
    local filesystem. Cached on the SparkContext: the answer can't change
    within a context's lifetime, and the whole point of asking is to skip
    py4j round trips on the sidecar fast path."""
    sc = spark.sparkContext
    cached = getattr(sc, "_vpts_default_fs_local", None)
    if cached is None:
        try:
            scheme = sc._jsc.hadoopConfiguration().get("fs.defaultFS", "file:///")
        except Exception:
            scheme = ""
        cached = scheme.startswith("file:")
        sc._vpts_default_fs_local = cached
    return cached


def read_text_sidecar(spark: SparkSession, path: str) -> str:
    # local fast path: a plain open() skips 3-4 py4j round trips per
    # read (~20-50 ms each on this driver) — commit-log resolution,
    # stats docs, and hint files read dozens of sidecars per metadata
    # op, so this constant compounds. Scheme'd paths (s3a://, hdfs://)
    # keep the Hadoop FS route; `file://` strips to a plain path.
    # Scheme-LESS paths take the fast path only when fs.defaultFS is the
    # local FS — the write helpers resolve such paths through Hadoop, so
    # on an HDFS-defaultFS cluster a plain open() would look in the wrong
    # filesystem and miss every sidecar the writers created. A local miss
    # on a scheme-less path also falls through to the Hadoop route as a
    # belt-and-suspenders (FileNotFoundError only propagates for explicit
    # file:// paths, where the filesystem is unambiguous; callers catch).
    if path.startswith("file://"):
        with open(path[7:], "rb") as fh:
            return fh.read().decode("utf-8")
    if "://" not in path and _default_fs_is_local(spark):
        try:
            with open(path, "rb") as fh:
                return fh.read().decode("utf-8")
        except FileNotFoundError:
            pass  # fall through: Hadoop route gives the authoritative miss
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    stream = fs.open(jpath)
    try:
        data = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
    return data.decode("utf-8")


def write_text_overwrite(spark: SparkSession, path: str, text: str) -> bool:
    """Best-effort overwrite of a small sidecar (hint files — e.g. the
    commit log's `_latest` pointer). Never authoritative: readers must
    treat the content as a HINT and verify against the log itself.
    Returns False on any failure (callers proceed without the hint)."""
    try:
        jvm = spark.sparkContext._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(
            spark.sparkContext._jsc.hadoopConfiguration()
        )
        out = fs.create(jpath, True)
        out.write(bytearray(text.encode("utf-8")))
        out.close()
        return True
    except Exception:
        return False
