"""Pretraining-corpus preparation operators: sequence packing, PII
detection/redaction, benchmark decontamination, and bigram-LM scoring.

These extend the engine beyond the reference's radar-data pipeline into the
operations a large-scale LLM training-data pipeline needs (brief §"Beyond the
reference"): every operator here is a declarative DataFrame plan — window
functions, explodes, and broadcastable vocabulary joins — so Catalyst keeps
pushdown/pruning and the only shuffles are the ones the semantics require.

Scale notes (100 TB):
- `pack_bins` windows partition by the grouping column (source/shard), never
  globally — each shard's running sum is independent, so the window exchange
  hash-partitions instead of funneling through one task.
- PII scanning is pure JVM regexp (codegen-eligible), no Python in the path.
- Decontamination is an equi-join on hashed shingles: benchmark suites are
  tiny relative to the corpus, so the distinct-shingle side broadcasts and
  the corpus side never shuffles.
- Bigram scoring joins the corpus against its own n-gram count tables;
  vocabularies are Zipf-bounded (≪ corpus size), so both count tables
  broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: PII pattern classes, valid in both Java regex (Spark) and RE2 (DuckDB
#: oracle side) — anchored with \b so substrings of longer tokens don't fire.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}[- ]\d{3}[- ]\d{4}\b",
}


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-class PII match counts for one text column (JVM `regexp_count`,
    whole-stage-codegen eligible — no Python UDF)."""
    return {name: F.regexp_count(text, F.lit(pat)) for name, pat in PII_PATTERNS.items()}


def redact_pii(text: Column) -> Column:
    """Replace every PII match with `[CLASS]` markers, all classes in one
    chained JVM expression. Order matters: emails first so the IPv4 pattern
    can't eat a dotted mail domain's digits."""
    out = text
    for name, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"[{name.upper()}]")
    return out


def pack_bins(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tok",
    part_col: str = "source",
    order_col: str = "doc_id",
) -> DataFrame:
    """Concat-then-chunk sequence packing: documents are laid end-to-end in
    `order_col` order within each `part_col` shard and chunked into
    fixed-`budget` token bins; a document belongs to the bin where it starts.

    This is the GPT-style packing rule (no padding waste, documents may
    straddle bin boundaries). The running sum is a window partitioned by the
    shard key — hash-partitioned exchange, never a single-task global window
    (the repo-wide no-global-window convention, tests/test_plan_asserts.py).
    """
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(token_col).over(w)
    return df.withColumn(
        "bin", F.floor((cum - F.col(token_col)) / F.lit(float(budget)))
    ).withColumn("cum_tokens", cum)


def doc_bigrams(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, w1, bigram) rows via a pure-JVM adjacent-pair array transform —
    the keyed variant of `analytics.text_q.q_bigram_counts`' generator (one
    split per row, no self-join, no Python)."""
    return (
        df.select(id_col, F.split(F.col(text_col), " ").alias("a"))
        # single-token docs: sequence(1, 0) descends to [1, 0] and
        # element_at(a, 0) raises — they simply have no bigrams
        .filter(F.size("a") >= 2)
        .select(
            id_col,
            F.explode(
                F.expr(
                    "transform(sequence(1, size(a) - 1),"
                    " i -> struct(element_at(a, i) AS w1,"
                    " concat(element_at(a, i), ' ', element_at(a, i + 1)) AS bigram))"
                )
            ).alias("p"),
        )
        .select(id_col, "p.w1", "p.bigram")
    )


def bigram_nll(scored: DataFrame, corpus: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-document bigram cross-entropy under the corpus-count LM:
    nll(doc) = avg over its bigrams of -ln(c(w1 w2) / c1(w1)), where c1
    counts w1 as a bigram START (so the conditional normalizes exactly).

    Both count tables are vocabulary-sized → broadcast; the per-doc side
    aggregates map-side before the final (id) exchange. Perplexity-style
    scoring is a standard corpus-quality filter (docs the LM finds
    "surprising" are disproportionately noise).
    """
    cb = corpus.groupBy("bigram").agg(F.count("*").alias("c2"))
    c1 = corpus.groupBy("w1").agg(F.count("*").alias("c1"))
    return (
        scored.join(F.broadcast(cb), "bigram")
        .join(F.broadcast(c1), "w1")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(-F.log(F.col("c2") / F.col("c1"))), 4).alias("avg_nll"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 200,
    stride: int = 150,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-size overlapping character windows over a document column — the
    chunking stage of a RAG / pretraining pipeline (every document becomes
    ceil(max(len,1)/stride) chunks of `chunk_size` chars, consecutive chunks
    overlapping by `chunk_size - stride`).

    All-JVM narrow map: one `sequence` of start offsets per document,
    `posexplode`, `substr` — no shuffle, no Python, output row count is
    linear in corpus size. At 100 TB this is the shape you want: chunking
    parallelizes per input split and the explode factor is bounded by
    document length / stride. Token-budget chunking (split on a tokenizer)
    plugs in by swapping the offset sequence for token-boundary offsets.
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    starts = F.sequence(
        F.lit(1), F.greatest(F.length(F.col(text_col)), F.lit(1)), F.lit(stride)
    )
    return (
        docs.select(
            F.col(id_col),
            F.col(text_col),
            F.posexplode(starts).alias("chunk_id", "chunk_start"),
        )
        .select(
            id_col,
            "chunk_id",
            "chunk_start",
            F.col(text_col)
            .substr(F.col("chunk_start"), F.lit(chunk_size))
            .alias("chunk_text"),
        )
    )


def write_training_shards(
    docs: DataFrame,
    path: str,
    n_shards: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Terminal sink of the curation pipeline: write the corpus as `n_shards`
    deterministic shards plus a manifest.

    Shard assignment is md5(doc_id) mod n_shards — stable under
    repartitioning, engine-portable, and independent of input order, so a
    re-run after an upstream change moves only the documents that actually
    changed shards (rsync-friendly at 100 TB). One exchange on the shard
    key; one file per shard directory (each shard is one writer task —
    scale n_shards to the cluster, shards are the parallelism unit
    downstream training readers consume).

    The manifest (shard → docs, tokens) is written as `_manifest.json`
    (underscore prefix: invisible to Spark directory scans) and returned.
    Token counts are whitespace token counts — swap in a tokenizer UDF for
    BPE-exact budgets.
    """
    import json

    shard = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % n_shards
    ).cast("int")
    tagged = docs.withColumn("shard", shard)
    (
        tagged.repartition(n_shards, "shard")
        .sortWithinPartitions(id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    counts = (
        tagged.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(F.split(F.col(text_col), " "))).alias("n_tokens"),
        )
        .orderBy("shard")
        .collect()
    )
    manifest = {
        "n_shards": n_shards,
        "total_docs": int(sum(r["n_docs"] for r in counts)),
        "total_tokens": int(sum(r["n_tokens"] for r in counts)),
        "shards": {
            int(r["shard"]): {"n_docs": int(r["n_docs"]), "n_tokens": int(r["n_tokens"])}
            for r in counts
        },
    }
    import os

    with open(os.path.join(path, "_manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest


def temperature_weights(
    df: DataFrame, by: str = "source", alpha: float = 0.5
) -> DataFrame:
    """Temperature-based source resampling weights (the multilingual-mix
    recipe of Lample & Conneau 2019 §3.1, public paper): a source with n_s
    documents is sampled with probability p_s ∝ n_s^alpha, which flattens
    the head and up-weights the tail as alpha → 0. Output per source:
    n_docs, p_source (the normalized source share), and w_doc = p_s / n_s
    (the per-document resampling weight a sampler multiplies in).

    Scale shape: one count aggregation (map-side combine) → a
    sources-sized table; the normalizer is a 1-row broadcast. Nothing in
    the plan scales with the corpus beyond the first count.

    Oracle note: alpha=0.5 is the value the oracle-checked query pins,
    because x^0.5 is IEEE-exact as sqrt() on every engine; arbitrary
    pow(x, alpha) is not bit-reproducible across engines (verify skill §5)
    and is therefore available but not value-oracled.
    """
    counts = df.groupBy(by).agg(F.count("*").alias("n_docs"))
    mass = (
        F.sqrt(F.col("n_docs"))
        if alpha == 0.5
        else F.pow(F.col("n_docs"), F.lit(alpha))
    )
    scored = counts.withColumn("mass", mass.cast("double"))
    total = scored.agg(F.sum("mass").alias("t"))
    return scored.crossJoin(F.broadcast(total)).select(
        by,
        "n_docs",
        (F.col("mass") / F.col("t")).alias("p_source"),
        ((F.col("mass") / F.col("t")) / F.col("n_docs")).alias("w_doc"),
    )


def materialize_mixture(
    df: DataFrame,
    total_docs: int,
    by: str = "source",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Materialize a temperature-mixed training set: draw per-source
    quotas k_s ∝ n_s^alpha summing to ~`total_docs`, UPSAMPLING tail
    sources past one epoch where the quota demands it (the piece
    `temperature_weights` leaves to the sampler). Deterministic end to
    end — re-running on re-partitioned input yields the identical
    multiset:

    - quotas are exact integer arithmetic: per-source fixed-point mass
      floor(sqrt(n_s)·1e6) (sqrt is IEEE-exact; the floor makes the
      normalizing SUM an integer, so no cross-engine double-sum-order
      hazard — the `mixture_weights` fixed-point trick), then
      k_s = mass_fp · total // Σmass_fp;
    - each document is replicated ceil(k_s / n_s) times (epoch copies),
      and the k_s survivors per source are the smallest md5-ranked
      (doc, copy) pairs — a salted-md5 total order, no RNG.

    Output: one row per sampled instance — (by, id_col, copy_i) — ready
    to join back to the corpus for shard writing. Scale shape: quota
    arithmetic is a sources-sized broadcast; the explode is a narrow
    map emitting n_s·copies ≈ max(n_s, 2·k_s) rows per source; the one
    shuffle is the per-source md5-rank window over those rows — the
    same keyed exchange the stratified sampler (`q_sample_stratified`)
    pays, skew-bounded by the largest source."""
    counts = df.groupBy(by).agg(F.count("*").alias("n_docs"))
    mass = F.floor(F.sqrt(F.col("n_docs")) * F.lit(1_000_000)).cast("long")
    scored = counts.select(by, "n_docs", mass.alias("mass_fp"))
    tot = scored.agg(F.sum("mass_fp").alias("t_fp"))
    quotas = scored.crossJoin(F.broadcast(tot)).select(
        by,
        "n_docs",
        F.greatest(
            F.lit(1),
            (F.col("mass_fp") * F.lit(int(total_docs)) / F.col("t_fp"))
            .cast("long"),
        ).alias("k_s"),
    ).withColumn(
        "copies",
        ((F.col("k_s") + F.col("n_docs") - 1) / F.col("n_docs")).cast("long"),
    )
    docs = df.select(by, id_col).join(F.broadcast(quotas), by)
    exploded = docs.select(
        by,
        id_col,
        "k_s",
        F.explode(F.sequence(F.lit(1), F.col("copies"))).alias("copy_i"),
    )
    w = Window.partitionBy(by).orderBy(
        F.md5(
            F.concat(
                F.lit("mx#"),
                F.col(id_col).cast("string"),
                F.lit("#"),
                F.col("copy_i").cast("string"),
            )
        )
    )
    return (
        exploded.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.col("k_s"))
        .select(by, id_col, "copy_i")
    )
