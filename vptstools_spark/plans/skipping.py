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
    current = list_data_files(spark, path)
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


# ---------------------------------------------------------------------------
# File-level Bloom index — equality-probe skipping where min/max is useless
# ---------------------------------------------------------------------------

#: bloom geometry defaults: 3 salted probes into a 2048-bit mask per file
#: (≈0.3% false-positive rate at ~150 distinct keys/file; scale m_bits with
#: per-file cardinality — the mask stays KB-scale either way)
BLOOM_HASHES = 3
BLOOM_BITS = 2048


def collect_file_blooms(
    spark: SparkSession,
    path: str,
    col: str,
    n_hashes: int = BLOOM_HASHES,
    m_bits: int = BLOOM_BITS,
) -> DataFrame:
    """One row per data file: a Bloom bitmask (array of m_bits/64 longs)
    over `col` — the Delta-style bloom index for EQUALITY probes, which
    min/max skipping can't help with when values interleave across files
    (a uniformly-distributed id column gives every file the same [min,
    max] range; its bloom still prunes to ~1 file + false positives).

    Build is one distributed pass: explode the k salted bit positions,
    distinct per (file, position) — ≤ m_bits rows per file survive —
    fold positions into 64-bit words with bit_or, then densify to a fixed
    array via a map lookup over the word index range. Shuffle carries
    |files|·m_bits rows max; nothing data-scale reaches the driver."""
    from vptstools_spark.operators.sketch import bloom_positions

    df = spark.read.parquet(path)
    pos = F.explode(
        F.array(*bloom_positions(F.col(col), n_hashes, m_bits))
    ).alias("p")
    pairs = (
        df.withColumn("__file", F.input_file_name())
        .select("__file", pos)
        .distinct()
    )
    words = (
        pairs.select(
            "__file",
            (F.col("p") / 64).cast("int").alias("w"),
            # pyspark's shiftleft() wants a literal shift; the SQL form
            # takes a column
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("b"),
        )
        .groupBy("__file", "w")
        .agg(F.bit_or("b").alias("word"))
    )
    n_words = m_bits // 64
    return (
        words.groupBy("__file")
        .agg(
            F.map_from_arrays(
                F.collect_list("w"), F.collect_list("word")
            ).alias("__wm")
        )
        .select(
            F.col("__file").alias("file"),
            F.transform(
                F.sequence(F.lit(0), F.lit(n_words - 1)),
                lambda i: F.coalesce(
                    F.col("__wm").getItem(i.cast("int")), F.lit(0).cast("long")
                ),
            ).alias("mask"),
        )
    )


def _spark_string_of(value) -> str:
    """Render a probe value EXACTLY as the build side's `cast(col as
    string)` did — the bloom has no false negatives only if the probe
    hashes the same bytes the build hashed. Python str() diverges from
    Spark's cast for booleans ('True' vs 'true') and for doubles (Spark
    renders Java Double.toString scientific forms), so those either get an
    explicit translation (bool) or an explicit rejection (float/decimal/
    datetime) — a silent false NEGATIVE would make read_pruned_equality
    drop the file that contains the value (ADVICE r4)."""
    import datetime

    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, int) or isinstance(value, str):
        return str(value)
    if isinstance(value, datetime.date) and not isinstance(value, datetime.datetime):
        return value.isoformat()  # == Spark's date cast 'YYYY-MM-DD'
    raise TypeError(
        f"bloom equality probe on {type(value).__name__} is not supported: "
        "Python's rendering of this type diverges from Spark's cast-to-"
        "string, which would silently produce bloom false negatives. "
        "Probe with int/str/bool/date, or pass the Spark-rendered string."
    )


def _bloom_positions_driver(value, n_hashes: int, m_bits: int) -> list[int]:
    """Driver-side twin of `sketch.bloom_positions` for a literal probe
    value: same salted-md5 scheme over the value's Spark-cast string form
    (`_spark_string_of`), so a probe matches exactly the bits the Spark
    build set. hashlib.md5 of the UTF-8 string == Spark md5 of the string
    cast — the cross-engine md5 identity every sketch in this repo already
    relies on."""
    import hashlib

    s = _spark_string_of(value)
    return [
        int(hashlib.md5(f"bf{i}:{s}".encode()).hexdigest()[:8], 16) % m_bits
        for i in range(n_hashes)
    ]


def files_for_equality(
    blooms: DataFrame,
    value,
    n_hashes: int = BLOOM_HASHES,
    m_bits: int = BLOOM_BITS,
) -> list[str]:
    """Files whose bloom CANNOT rule out `col = value`: all k probe bits
    set. No false negatives (a file containing the value always keeps all
    its bits); false positives only cost an extra file read. The probe is
    a constant-folded bit test per file row — |files|-scale work."""
    cond = F.lit(True)
    for p in _bloom_positions_driver(value, n_hashes, m_bits):
        bit = F.shiftleft(F.lit(1).cast("long"), p % 64)
        cond = cond & (
            F.element_at("mask", p // 64 + 1).bitwiseAND(bit) != F.lit(0)
        )
    return [r["file"] for r in blooms.filter(cond).select("file").collect()]


def read_pruned_equality(
    spark: SparkSession,
    blooms: DataFrame,
    col: str,
    value,
    n_hashes: int = BLOOM_HASHES,
    m_bits: int = BLOOM_BITS,
) -> DataFrame:
    """Scan only bloom-surviving files for `col = value`; the residual
    equality filter removes false-positive files' rows, so the result
    equals the full-scan filter — skipping is purely I/O."""
    files = files_for_equality(blooms, value, n_hashes, m_bits)
    if not files:
        any_file = [r["file"] for r in blooms.select("file").limit(1).collect()]
        if not any_file:
            raise ValueError("bloom table is empty — collect_file_blooms first")
        return spark.read.parquet(*any_file).filter(F.lit(False))
    return spark.read.parquet(*files).filter(F.col(col) == F.lit(value))


def list_data_files(spark: SparkSession, path: str) -> set[str]:
    """Recursive filesystem listing of a table's data files — a metadata
    operation (no data scan; `input_file_name()` would read every row just
    to learn the names). Shared by the incremental stats/bloom refreshers."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    it = fs.listFiles(p, True)
    current: set[str] = set()
    while it.hasNext():
        f = it.next().getPath().toString()
        name = f.rsplit("/", 1)[-1]
        if name.endswith(".parquet") and not name.startswith(("_", ".")):
            current.add(f)
    return current


def update_file_blooms(
    spark: SparkSession,
    path: str,
    blooms: DataFrame,
    col: str,
    n_hashes: int = BLOOM_HASHES,
    m_bits: int = BLOOM_BITS,
) -> DataFrame:
    """Incrementally maintain the bloom index: build masks ONLY for data
    files not yet covered, drop tombstoned rows for files a rewrite
    removed — the bloom twin of `update_file_stats`, with the same
    one-listing + new-bytes-only cost contract."""
    from vptstools_spark.operators.sketch import bloom_positions

    current = list_data_files(spark, path)
    known = {r["file"] for r in blooms.select("file").collect()}
    fresh = sorted(current - known)
    kept = blooms.filter(F.col("file").isin(list(current)))
    if not fresh:
        return kept
    df = spark.read.parquet(*fresh)
    pos = F.explode(
        F.array(*bloom_positions(F.col(col), n_hashes, m_bits))
    ).alias("p")
    pairs = (
        df.withColumn("__file", F.input_file_name())
        .select("__file", pos)
        .distinct()
    )
    words = (
        pairs.select(
            "__file",
            (F.col("p") / 64).cast("int").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("b"),
        )
        .groupBy("__file", "w")
        .agg(F.bit_or("b").alias("word"))
    )
    n_words = m_bits // 64
    fresh_blooms = (
        words.groupBy("__file")
        .agg(
            F.map_from_arrays(
                F.collect_list("w"), F.collect_list("word")
            ).alias("__wm")
        )
        .select(
            F.col("__file").alias("file"),
            F.transform(
                F.sequence(F.lit(0), F.lit(n_words - 1)),
                lambda i: F.coalesce(
                    F.col("__wm").getItem(i.cast("int")), F.lit(0).cast("long")
                ),
            ).alias("mask"),
        )
    )
    return kept.unionByName(fresh_blooms)


#: dictionary index capacity: above this many distinct values per file the
#: entry records an overflow (NULL) and the file is never pruned by the
#: dictionary — the bloom index is the right tool past this cardinality
DICT_MAX_DISTINCT = 64


def collect_file_dictionaries(
    spark: SparkSession,
    path: str,
    col: str,
    max_distinct: int = DICT_MAX_DISTINCT,
) -> DataFrame:
    """One row per data file: the EXACT sorted distinct-value list of
    `col` (as Spark-cast strings), or NULL when the file exceeds
    `max_distinct` values. For low-cardinality columns (status codes,
    country/category/flag columns) this index prunes equality probes with
    ZERO false positives — strictly stronger than the bloom mask, at a
    cost that is bounded by |files|·max_distinct strings. Build is one
    distributed pass: per-file distinct (map-side combining) → bounded
    collect_list; nothing data-scale reaches the driver."""
    df = spark.read.parquet(path)
    per = (
        df.withColumn("__file", F.input_file_name())
        .select("__file", F.col(col).cast("string").alias("v"))
        .distinct()
        .groupBy("__file")
        .agg(
            # collect_list skips NULL v (a stored NULL can never satisfy an
            # equality probe, so it carries no pruning information)
            F.sort_array(F.collect_list("v")).alias("values"),
            F.count("*").alias("__n"),
        )
    )
    return per.select(
        F.col("__file").alias("file"),
        F.when(F.col("__n") <= max_distinct, F.col("values")).alias("values"),
    )


def files_for_equality_dict(dicts: DataFrame, value) -> list[str]:
    """Files whose dictionary admits `col = value`: exact membership for
    indexed files, conservatively kept for overflow (NULL) entries. The
    probe renders the value with Spark's own cast semantics
    (`_spark_string_of`) so index and probe agree byte-for-byte."""
    s = _spark_string_of(value)
    keep = dicts.filter(
        F.col("values").isNull() | F.array_contains("values", F.lit(s))
    )
    return [r["file"] for r in keep.select("file").collect()]


def read_pruned_equality_dict(
    spark: SparkSession, dicts: DataFrame, col: str, value
) -> DataFrame:
    """Scan only dictionary-admitted files for `col = value`; the residual
    filter is still applied (overflow files may not contain the value),
    so the result equals the full-scan filter — skipping is purely I/O."""
    files = files_for_equality_dict(dicts, value)
    if not files:
        any_file = [r["file"] for r in dicts.select("file").limit(1).collect()]
        if not any_file:
            raise ValueError("dictionary table is empty — collect_file_dictionaries first")
        return spark.read.parquet(*any_file).filter(F.lit(False))
    return spark.read.parquet(*files).filter(F.col(col) == F.lit(value))
