"""Prefix-filtered set-similarity join (operators/simjoin.py).

Exactness: the prefix filter may only prune pairs that provably cannot
reach the threshold, so the result must equal the brute-force all-pairs
token-set Jaccard at every threshold. Pruning: the prefix index must emit
strictly fewer join rows than the full token table on a corpus with common
tokens (the point of the technique)."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from vptstools_spark.operators.simjoin import (
    prefix_candidates,
    prefix_ranked,
    similarity_join,
    token_sets,
)

DOCS = [
    (0, "spark shuffles data across the cluster"),
    (1, "spark shuffles data across the whole cluster"),
    (2, "spark shuffles data across the cluster"),  # exact dup of 0
    (3, "ducks swim across the pond quickly today"),
    (4, "ducks swim across the pond very quickly"),
    (5, "entirely unrelated text about window functions"),
    (6, "window functions rank rows inside partitions"),
    (7, "the the the repeated token document"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def brute_force(docs_rows, threshold):
    sets = {i: set(t.split()) for i, t in docs_rows}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        j = inter / union
        if j >= threshold:
            out[(a, b)] = round(j, 4)
    return out


@pytest.mark.parametrize("threshold", [0.5, 0.7, 0.9])
def test_exact_vs_brute_force(spark, docs, threshold):
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in similarity_join(docs, threshold=threshold).collect()
    }
    want = brute_force(DOCS, threshold)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-4)


def test_exact_duplicates_found(spark, docs):
    got = similarity_join(docs, threshold=0.99).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in got} == {(0, 2)}
    assert got[0]["jaccard"] == 1.0


def test_prefix_index_prunes(spark, docs):
    toks = token_sets(docs)
    ranked = prefix_ranked(toks)
    n_all = toks.count()
    n_prefix = ranked.filter(
        F.col("pos") <= F.col("sz") - F.ceil(F.lit(0.7) * F.col("sz")) + 1
    ).count()
    # at t=0.7 the prefix keeps ~30% of each doc's tokens
    assert n_prefix < 0.5 * n_all


def test_candidates_superset_of_results(spark, docs):
    t = 0.5
    cand = {
        (r["da"], r["db"])
        for r in prefix_candidates(prefix_ranked(token_sets(docs)), t).collect()
    }
    assert set(brute_force(DOCS, t)) <= cand


def test_length_filter_inside_join(spark, docs):
    # docs 3 (7 tokens) and 7 (4 distinct tokens): 4 < 0.7*7 → the length
    # filter must keep that pair out of the candidate set entirely
    cand = prefix_candidates(prefix_ranked(token_sets(docs)), 0.7)
    assert cand.filter((F.col("da") == 3) & (F.col("db") == 7)).count() == 0
