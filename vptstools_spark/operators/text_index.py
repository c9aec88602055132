"""Incrementally-maintained full-text (BM25) index over a versioned
corpus table — the lakehouse × retrieval composition: postings live in a
versioned table maintained from the corpus's CHANGE FEED, so keeping a
100 TB corpus searchable costs O(changed documents) per sync, never a
corpus rescan.

Public design family: Lucene's segment model (immutable postings files +
deletes applied at read) re-expressed on this repo's versioned-table
layer — the index table's data files are the segments, equality-delete
vectors are the per-document tombstones, and `purge_deletes` is the
segment merge.

Layout:

- postings table (a versioned table at `index_path`): one row per
  (term, document) — `(wb, w, doc_id, tf, dl)` with `wb` =
  md5-derived term bucket (PARTITION column: a k-term query prunes to k
  buckets of the index at planning time), `tf` the term frequency and
  `dl` the document length. `dl` rides every posting row so scoring
  never random-accesses a second table by doc_id — the classic
  posting-payload trade (bytes for locality); a changed document
  rewrites all its postings anyway, so the payload adds no write
  amplification.
- stats sidecar (`_index_stats.json` under the index path): corpus-level
  BM25 constants (N, Σdl) plus the (corpus version, index version) the
  index is synced to. The sidecar is a CACHE, never the authority — it
  records the index version it was computed against, and a reader that
  finds it stale recomputes the two scalars with one aggregate and
  rewrites it (self-healing); correctness never depends on it.

Maintenance (`refresh_text_index`): one `table_changes` read of the
corpus (O(changed data) over MOR commits), then

    1. `delete_where_eq(index, churned doc_ids)` — tombstones EVERY old
       posting of every churned document without scanning a posting file
       (the key file is the whole write);
    2. `commit_append(index, postings(inserted docs))` — new immutable
       posting files; the sequence-number rule keeps them out of step
       1's tombstone scope;
    3. signed stats algebra: ΔN / Δsum_dl from the feed's insert/delete
       rows (an updated doc appears as delete+insert and nets out).

Search (`search_text_index`): filter postings to the query terms
(partition-pruned on `wb`, eq-deletes resolved by the versioned read's
broadcast anti-join), per-term document frequency from the filtered
slice, N/avgdl from the sidecar, and the exact BM25 expression shared
with `analytics/corpus_q` (DECIMAL-summed, aggregation-order-exact).
Cost at any corpus size: k posting buckets read, everything else
broadcast-small.

Value gate: `text_index_search` (corpus churned through MOR DML, index
refreshed incrementally, search results equal a DuckDB BM25 over the
final corpus state — proving maintenance end-to-end by value).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vptstools_spark.io import create_text_exclusive, read_text_sidecar
from vptstools_spark.plans.timetravel import (
    _resolve_version,
    commit_append,
    commit_initial,
    delete_where_eq,
    read_version,
    table_changes,
)

#: term-bucket fanout: a query term reads 1/_N_BUCKETS of the index.
_N_BUCKETS = 16
_STATS_NAME = "_index_stats"


def term_bucket(w) -> F.Column:
    """md5-derived partition bucket for a term — engine-portable (the
    same salted-md5 identity every sketch in the repo uses)."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit("tb#"), w)), 1, 4), 16, 10)
        .cast("int")
        % _N_BUCKETS
    )


def _postings(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(wb, w, doc_id, tf, dl) — one explode + one aggregation; dl is a
    window-free second aggregate joined back on doc_id (both sides are
    already shuffled on doc-ish keys; Catalyst plans the dl side as a
    partial+final count)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
        ).alias("w"),
    )
    tf = toks.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    return tf.join(dl, "doc_id").select(
        term_bucket(F.col("w")).alias("wb"),
        "w",
        "doc_id",
        "tf",
        "dl",
    )


def _token_count(text_col) -> F.Column:
    return F.size(
        F.filter(F.split(text_col, " "), lambda t: t != F.lit(""))
    ).cast("long")


def _write_stats(
    spark: SparkSession,
    index_path: str,
    n_docs: int,
    sum_dl: int,
    corpus_version: int | None,
    index_version: int,
) -> None:
    # monotonically-named sidecar generations: the newest readable file
    # wins, and create-exclusive keeps concurrent writers from torn text
    doc = {
        "n_docs": int(n_docs),
        "sum_dl": int(sum_dl),
        "corpus_version": corpus_version,
        "index_version": int(index_version),
    }
    create_text_exclusive(
        spark,
        os.path.join(
            index_path, f"{_STATS_NAME}.{index_version:08d}.json"
        ),
        json.dumps(doc),
    )


def _read_stats(spark: SparkSession, index_path: str) -> dict | None:
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(index_path)
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return None
    names = sorted(
        st.getPath().getName()
        for st in fs.listStatus(p)
        if st.getPath().getName().startswith(_STATS_NAME + ".")
    )
    if not names:
        return None
    return json.loads(
        read_text_sidecar(spark, os.path.join(index_path, names[-1]))
    )


def build_text_index(
    spark: SparkSession,
    corpus_path: str,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> int:
    """Full build: postings of the corpus's LATEST version, committed as
    index version 0 (partitioned by term bucket), plus the stats
    sidecar pinned to the corpus version built against. The one full
    corpus scan an index ever needs."""
    v = _resolve_version(spark, corpus_path, None)
    docs = read_version(spark, corpus_path, v)
    post = _postings(docs, text_col, id_col).repartition("wb")
    commit_initial(post, index_path, ["wb"])
    agg = docs.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum(_token_count(F.col(text_col))), F.lit(0)).alias(
            "s"
        ),
    ).first()
    _write_stats(spark, index_path, agg["n"], agg["s"], v, 0)
    return 0


def refresh_text_index(
    spark: SparkSession,
    corpus_path: str,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> int:
    """Advance the index across the corpus's new commits at O(changed
    documents): equality-tombstone churned docs' postings, append the
    re-tokenized inserted docs, update the sidecar by signed algebra.
    No-op (returns the current index version) when already synced."""
    stats = _read_stats(spark, index_path)
    if stats is None or stats.get("corpus_version") is None:
        raise ValueError(
            f"no usable stats sidecar under {index_path}; build the "
            "index with build_text_index first"
        )
    v_old = stats["corpus_version"]
    v_now = _resolve_version(spark, corpus_path, None)
    iv = _resolve_version(spark, index_path, None)
    if v_now == v_old:
        return iv
    ch = table_changes(spark, corpus_path, v_old, v_now).localCheckpoint()
    ins = F.col("_change_type") == "insert"
    churned = ch.select(F.col(id_col).alias("doc_id")).distinct()
    iv = delete_where_eq(spark, index_path, churned, ["doc_id"])
    new_post = _postings(
        ch.filter(ins).drop("_change_type", "_commit_version"),
        text_col,
        id_col,
    ).repartition("wb")
    iv = commit_append(spark, index_path, new_post)
    sign = F.when(ins, F.lit(1)).otherwise(F.lit(-1))
    d = ch.agg(
        F.coalesce(F.sum(sign), F.lit(0)).alias("dn"),
        F.coalesce(
            F.sum(sign.cast("long") * _token_count(F.col(text_col))),
            F.lit(0),
        ).alias("ds"),
    ).first()
    _write_stats(
        spark,
        index_path,
        stats["n_docs"] + d["dn"],
        stats["sum_dl"] + d["ds"],
        v_now,
        iv,
    )
    return iv


def index_stats(spark: SparkSession, index_path: str) -> tuple[int, int]:
    """(N docs, Σdl) for scoring — sidecar when it matches the index's
    latest version, else one self-healing aggregate over the postings
    (count of distinct docs + Σtf) that rewrites the sidecar."""
    iv = _resolve_version(spark, index_path, None)
    stats = _read_stats(spark, index_path)
    if stats is not None and stats.get("index_version") == iv:
        return stats["n_docs"], stats["sum_dl"]
    agg = (
        read_version(spark, index_path, iv)
        .agg(
            F.count_distinct("doc_id").alias("n"),
            F.coalesce(F.sum("tf"), F.lit(0)).alias("s"),
        )
        .first()
    )
    _write_stats(
        spark,
        index_path,
        agg["n"],
        agg["s"],
        (stats or {}).get("corpus_version"),
        iv,
    )
    return agg["n"], agg["s"]


def search_text_index(
    spark: SparkSession,
    index_path: str,
    terms: list[str],
    k: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k over the index: (doc_id, bm25). Reads only the query
    terms' posting buckets (partition pruning on `wb` + the term filter
    pushed into the scan); df/N/avgdl are broadcast-scale; the per-doc
    score sums ≤ |terms| DECIMAL(20,8) addends so ties and totals are
    aggregation-order-exact — the same scoring contract as
    `analytics/corpus_q.q_bm25_search`."""
    n_docs, sum_dl = index_stats(spark, index_path)
    post = read_version(spark, index_path).filter(
        F.col("wb").isin(_term_buckets(spark, terms))
        & F.col("w").isin(terms)
    )
    df_t = post.groupBy("w").agg(F.count("*").alias("df"))
    nd = float(n_docs)
    avgdl = (sum_dl / n_docs) if n_docs else 1.0
    idf = F.log(
        (F.lit(nd) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tf = F.col("tf").cast("double")
    norm = tf + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / F.lit(avgdl))
    )
    s = F.round(idf * (tf * F.lit(k1 + 1.0) / norm), 8).cast(
        "decimal(20,8)"
    )
    scored = (
        post.join(F.broadcast(df_t), "w")
        .select("doc_id", s.alias("s"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("s").cast("double"), 6).alias("bm25"))
    )
    return scored.orderBy(F.col("bm25").desc(), "doc_id").limit(k)


def _term_buckets(spark: SparkSession, terms: list[str]) -> list[int]:
    """Planning-time bucket ids for the query terms — k rows of local
    compute so the bucket filter is a pruning LITERAL, mirrored by the
    executor-side `term_bucket` expression used at write time."""
    rows = spark.createDataFrame(
        [(t,) for t in terms], "w string"
    ).select(term_bucket(F.col("w")).alias("b"))
    return sorted({r["b"] for r in rows.collect()})
