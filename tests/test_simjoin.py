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


@pytest.mark.parametrize("threshold", [0.1, 0.25, 0.5, 0.7, 0.9])
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


def test_ceil_double_rounding_guard(spark):
    # 0.1 * 10 rounds to 1.0000000000000002 in doubles, so a bare ceil()
    # yields 2 and shortens a 10-token prefix to 9 — one shorter than the
    # filter's correctness proof allows. The _EPS guard must keep all 10.
    doc = [(0, "a b c d e f g h i j")]
    ranked = prefix_ranked(token_sets(spark.createDataFrame(doc, "doc_id long, text string")))
    from vptstools_spark.operators.simjoin import _iceil

    n_prefix = ranked.filter(
        F.col("pos") <= F.col("sz") - _iceil(F.lit(0.1) * F.col("sz")) + 1
    ).count()
    assert n_prefix == 10


# positional-filter fixture: docs 100 and 101 share EXACTLY one token "zz"
# that ranks 6th in both (after five globally-unique tokens each); their
# tails are disjoint high-df fillers pumped by decoy docs. At t=0.5 the
# prefix is positions 1..6, so "zz" generates the candidate under the old
# length-only filter — but the positional bound 1 + min(10-6, 10-6) = 5 is
# below the required overlap ceil(0.5/1.5 * 20) = 7, so PPJoin prunes it.
POS_DOCS = [
    (100, "ua1 ua2 ua3 ua4 ua5 zz f1 f2 f3 f4"),
    (101, "ub1 ub2 ub3 ub4 ub5 zz g1 g2 g3 g4"),
    (102, "f1 f2 f3 f4 x1 x2 x3 x4 x5 x6"),
    (103, "f1 f2 f3 f4 y1 y2 y3 y4 y5 y6"),
    (104, "g1 g2 g3 g4 p1 p2 p3 p4 p5 p6"),
    (105, "g1 g2 g3 g4 q1 q2 q3 q4 q5 q6"),
]


def test_positional_filter_prunes_hopeless_pair(spark):
    pdocs = spark.createDataFrame(POS_DOCS, "doc_id long, text string")
    ranked = prefix_ranked(token_sets(pdocs))
    pair = (F.col("da") == 100) & (F.col("db") == 101)
    without = prefix_candidates(ranked, 0.5, positional=False)
    with_pos = prefix_candidates(ranked, 0.5, positional=True)
    assert without.filter(pair).count() == 1
    assert with_pos.filter(pair).count() == 0
    # and pruning must not cost exactness on this corpus
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in similarity_join(pdocs, threshold=0.5).collect()
    }
    assert got == brute_force(POS_DOCS, 0.5)


def _sim_pairs(spark, rows, threshold):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in similarity_join(df, threshold=threshold).collect()
    }


def test_router_bitmask_vs_prefix_same_answer(spark):
    """The adaptive router (vocab <= 63 -> bitmask all-pairs; else prefix
    index) is invisible in the answers: a corpus pushed over the vocab
    cut by adding unique filler tokens yields the same pairs among the
    original docs, and both routes equal brute force."""
    import random

    rng = random.Random(7)
    base_vocab = [f"t{i}" for i in range(20)]  # low entropy: bitmask route
    small_rows = [
        (i, " ".join(sorted(rng.sample(base_vocab, rng.randint(5, 12)))))
        for i in range(60)
    ]
    got_small = _sim_pairs(spark, small_rows, 0.7)
    assert got_small == brute_force(small_rows, 0.7)

    # widen the vocabulary past 63 with singleton-token docs: the router
    # flips to the prefix route; pairs among the original docs unchanged
    big_rows = small_rows + [
        (1000 + j, f"unique_{j}_a unique_{j}_b unique_{j}_c")
        for j in range(30)
    ]
    got_big = _sim_pairs(spark, big_rows, 0.7)
    assert {p: j for p, j in got_big.items() if p[0] < 1000 and p[1] < 1000} == got_small
    assert got_big == brute_force(big_rows, 0.7)


def test_router_boundary_jaccard_agrees(spark):
    """Boundary pairs (jaccard exactly at the threshold) survive both
    routes — the exact test is the identical double-division form."""
    rows = [
        (0, " ".join(f"w{i}" for i in range(7))),           # {w0..w6}
        (1, " ".join(f"w{i}" for i in range(10))),          # {w0..w9}: 7/10
        (2, "w0 w1 w2 w3 w4 w5 w6"),                        # dup of 0
    ]
    got = _sim_pairs(spark, rows, 0.7)
    assert got == brute_force(rows, 0.7)
    assert got[(0, 1)] == 0.7 and got[(0, 2)] == 1.0
