"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design notes (100 TB):
- exact dedup: one hash-groupBy shuffle on a 32-byte key — the minimal plan.
- n-gram Jaccard: exact pairwise via shingle self-join; candidate set bounded
  by shingle selectivity. At corpus scale you run MinHash-LSH first and only
  Jaccard-verify the LSH candidates (that composition is `lsh_candidates` →
  `jaccard_pairs` on the candidate set).
- MinHash: K min-aggregates in ONE groupBy pass over exploded shingles (no
  K-fold explode); banding turns near-dup search into an equi-join, which
  Spark executes as a shuffle hash join on (band_id, band_hash) — no O(n²).
- all hashes are md5-derived → deterministic, portable, seedable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vptstools_spark.operators.text import fingerprint, tokens


def exact_dedup_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate census on normalized-md5 fingerprint: one row with
    (n_groups, n_docs, n_duplicates)."""
    groups = (
        df.select(fingerprint(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("canonical_id"), F.count("*").alias("n_copies"))
    )
    return groups.agg(
        F.count("*").alias("n_groups"),
        F.sum("n_copies").cast("long").alias("n_docs"),
        F.sum(F.col("n_copies") - 1).cast("long").alias("n_duplicates"),
    )


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """Distinct k-word shingles per document, exploded to (id, shingle) rows.

    Narrow (per-row array ops + explode); the only shuffle consumers downstream
    are the dedup joins/aggregations themselves.
    """
    w = tokens(F.col(text_col))
    n = F.size(w)
    sh = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, i + j) for j in range(k)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def jaccard_pairs(
    sh: DataFrame,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs from a (id, shingle) table.

    Plan: self equi-join on shingle (shuffle hash join), count common shingles
    per pair, join per-doc sizes (broadcastable), jaccard = c/(na+nb-c).
    """
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .agg(F.count("*").alias("c"))
    )
    jac = (
        common.join(sizes.withColumnsRenamed({"id": "doc_a", "n": "na"}), on="doc_a")
        .join(sizes.withColumnsRenamed({"id": "doc_b", "n": "nb"}), on="doc_b")
        .withColumn(
            "jaccard",
            F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c")),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard")
    )


def minhash_signatures(sh: DataFrame, num_hashes: int = 8) -> DataFrame:
    """MinHash signature per document: K independent min-aggregates over the
    shingle set, seeded md5 — one groupBy pass, K columns h0..h{K-1}.

    min(md5(seed || shingle)) over lexicographic strings is a valid minwise
    permutation family for set similarity (each seed re-orders the universe).
    """
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}#"), F.col("shingle")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def lsh_candidates(sigs: DataFrame, num_hashes: int = 8, rows_per_band: int = 2) -> DataFrame:
    """LSH banding: hash each band of the signature, equi-join on
    (band_id, band_hash) → candidate pairs (doc_a, doc_b, n_shared_bands).

    The join key is 32-byte md5 — collisions are the similarity signal, not
    accidents. At 100 TB the per-band join is a plain shuffle join whose
    cardinality is controlled by banding parameters (r ↑ → fewer candidates).
    """
    n_bands = num_hashes // rows_per_band
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(
                    F.concat(
                        *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
                    )
                ).alias("bh"),
            )
            for b in range(n_bands)
        ]
    )
    exploded = sigs.select("id", F.explode(bands).alias("band")).select(
        "id", F.col("band.band_id").alias("band_id"), F.col("band.bh").alias("bh")
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .agg(F.count("*").alias("n_shared_bands"))
    )


def simhash16(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """16-dimensional SimHash over md5 hex digits of tokens (with term
    frequency): dimension d sums (hexdigit_d(md5(token)) − 7.5) over all
    tokens; bit d = sign. Returns (id, simhash16 bitstring).

    Sums are multiples of 0.5 → exact in double → deterministic across
    engines. One explode + one 16-column aggregate; shuffle on id only.
    """
    tok = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("w")
    ).withColumn("hw", F.md5(F.col("w")))
    dims = [
        F.sum(
            F.expr(f"instr('0123456789abcdef', substr(hw, {d + 1}, 1))") - F.lit(8.5)
        ).alias(f"d{d}")
        for d in range(16)
    ]
    agg = tok.groupBy("id").agg(*dims)
    bits = F.concat(
        *[F.when(F.col(f"d{d}") > 0, F.lit("1")).otherwise(F.lit("0")) for d in range(16)]
    )
    return agg.select("id", bits.alias("simhash16"))
