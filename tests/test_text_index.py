"""Incrementally-maintained BM25 index (operators/text_index.py).

The search RESULT is value-oracled (`text_index_search`); these tests pin
the maintenance mechanics the oracle can't see: postings parity between
incremental refresh and a from-scratch rebuild, sidecar self-healing,
partition pruning on the term bucket, and refresh idempotence.
"""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from vptstools_spark.operators import text_index as tix
from vptstools_spark.plans.timetravel import (
    commit_append,
    commit_initial,
    delete_where,
    read_version,
    update_where,
)

TERMS = ["spark", "hash", "window"]


@pytest.fixture(scope="module")
def churned(spark):
    """(corpus_path, incrementally-refreshed index, rebuilt index)."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    root = tempfile.mkdtemp(prefix="tix_test_")
    corpus = os.path.join(root, "corpus")
    idx = os.path.join(root, "idx")
    idx2 = os.path.join(root, "idx2")
    commit_initial(docs, corpus, [])
    tix.build_text_index(spark, corpus, idx)
    delete_where(spark, corpus, F.col("doc_id") % 10 == 3)
    update_where(
        spark,
        corpus,
        F.col("doc_id") % 10 == 4,
        {"text": "concat(text, ' spark spark spark')"},
    )
    commit_append(
        spark,
        corpus,
        docs.filter(F.col("doc_id") % 10 == 7).select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.lit("spark window hash "), "text").alias("text"),
        ),
    )
    tix.refresh_text_index(spark, corpus, idx)
    tix.build_text_index(spark, corpus, idx2)
    yield corpus, idx, idx2
    shutil.rmtree(root, ignore_errors=True)


def test_refresh_equals_rebuild_postings(spark, churned):
    _, idx, idx2 = churned
    a = read_version(spark, idx).select("w", "doc_id", "tf", "dl")
    b = read_version(spark, idx2).select("w", "doc_id", "tf", "dl")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_refresh_equals_rebuild_search(spark, churned):
    _, idx, idx2 = churned
    got = tix.search_text_index(spark, idx, TERMS, 15).collect()
    want = tix.search_text_index(spark, idx2, TERMS, 15).collect()
    assert got == want


def test_refresh_is_idempotent_when_synced(spark, churned):
    corpus, idx, _ = churned
    before = tix.search_text_index(spark, idx, TERMS, 15).collect()
    v = tix.refresh_text_index(spark, corpus, idx)  # corpus unchanged
    assert v == tix.refresh_text_index(spark, corpus, idx)
    assert tix.search_text_index(spark, idx, TERMS, 15).collect() == before


def test_stats_sidecar_self_heals(spark, churned):
    _, idx, idx2 = churned
    n2, s2 = tix.index_stats(spark, idx2)
    for f in os.listdir(idx):
        if f.startswith("_index_stats"):
            os.remove(os.path.join(idx, f))
    assert tix.index_stats(spark, idx) == (n2, s2)
    # and the heal re-wrote a sidecar so the next read is cache-served
    assert any(
        f.startswith("_index_stats") for f in os.listdir(idx)
    )


def test_search_prunes_to_term_buckets(spark, churned):
    _, idx, _ = churned
    plan = (
        tix.search_text_index(spark, idx, ["spark"], 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [" in plan
    seg = plan.split("PartitionFilters")[1][:120]
    assert "wb" in seg


def test_stats_match_signed_algebra(spark, churned):
    corpus, idx, _ = churned
    n, s = tix.index_stats(spark, idx)
    docs = read_version(spark, corpus)
    agg = docs.agg(
        F.count("*").alias("n"),
        F.sum(
            F.size(F.filter(F.split("text", " "), lambda t: t != F.lit("")))
        ).alias("s"),
    ).first()
    assert (n, s) == (agg["n"], agg["s"])
