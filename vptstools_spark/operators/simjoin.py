"""Prefix-filtered set-similarity join (PPJoin-lite).

The exact-threshold companion to the MinHash/LSH path in
`operators/dedup.py`: find all document pairs with token-set Jaccard ≥ t,
WITHOUT the quadratic all-pairs join and WITHOUT the probabilistic recall
loss of LSH banding. Candidate generation uses the prefix-filtering
principle (Chaudhuri et al. 2006; Xiao et al. "PPJoin", VLDB 2008 —
public papers): order every document's tokens by ascending global document
frequency (rarest first); if Jaccard(a, b) ≥ t then a and b MUST share at
least one token within the first |s| − ⌈t·|s|⌉ + 1 tokens of that ordering.
Joining only on prefix tokens shrinks the candidate join input to the rare
end of the vocabulary — the frequent tokens that dominate a naive
token-equi-join's skew never enter the join.

Reference parity: the reference engine has no set-similarity join; this is
an engine extension in the training-data-pipeline family (SURVEY.md §2
extensions), sitting between `dedup_ngram_jaccard` (exact, df>1 pruning
only) and `dedup_lsh_verified` (approximate candidates).

Scale shape (100 TB):
- token df table: one groupBy over the exploded corpus (map-side partial
  aggregation), vocabulary-sized output;
- per-document ordering: a window partitioned BY DOCUMENT — state is one
  document's token list, never a global sort;
- candidate join: equi-join on prefix tokens with the length filter
  t·max(|a|,|b|) ≤ min(|a|,|b|) applied inside the join condition, so
  length-incompatible pairs are dropped before the shuffle write of the
  verify stage;
- verify: exact overlap count restricted to candidate pairs (semi-join
  pushdown), never all pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Guard against double rounding in threshold arithmetic: t*sz computed in
#: doubles can land just ABOVE an exact integer (e.g. 0.07*100 →
#: 7.000000000000001), making ceil() one too large — which shortens the
#: prefix below what the filter's correctness proof requires and could miss
#: boundary pairs. Subtracting EPS before every ceil restores the exact
#: integer; thresholds are never specified to 9 decimal places, so this can
#: only widen (never narrow) the candidate set — exactness is preserved by
#: the verify stage. Mirrored in the DuckDB oracle (analytics/dedup_q.py).
_EPS = 1e-9


def _iceil(x: Column) -> Column:
    """ceil() with the double-rounding guard above, as a long."""
    return F.ceil(x - F.lit(_EPS))


def token_sets(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct (id, w) token-set table — whitespace tokens, empties dropped."""
    return (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.col(text_col), " ")).alias("w"),
        )
        .filter(F.col("w") != "")
        .distinct()
    )


def prefix_ranked(toks: DataFrame) -> DataFrame:
    """Attach (pos, sz) to each (id, w): pos = rank of w inside its document
    under the global (df ASC, w ASC) token ordering; sz = |token set|.

    The df join is a plain equi-join on the token (vocabulary-sized build
    side — AQE turns it into a broadcast when it fits, and it degrades to a
    shuffle hash join, never a sort-merge explosion, when it does not).
    """
    dfw = toks.groupBy("w").agg(F.count("*").alias("df"))
    ranked = toks.join(dfw, "w")
    win = Window.partitionBy("id").orderBy(F.col("df").asc(), F.col("w").asc())
    return ranked.select(
        "id",
        "w",
        F.row_number().over(win).alias("pos"),
        F.count("*").over(Window.partitionBy("id")).alias("sz"),
    )


def prefix_candidates(
    ranked: DataFrame, threshold: float, positional: bool = True
) -> DataFrame:
    """Candidate pairs (da, db, sa, sb) from the prefix index.

    Three filters, all INSIDE the equi-join condition so pruned rows never
    reach the distinct's shuffle write:

    - prefix length |s| − ⌈t·|s|⌉ + 1 (pre-join row filter);
    - Jaccard length filter min(sz) ≥ ⌈t·max(sz)⌉ (integer form);
    - PPJoin positional filter (Xiao et al., VLDB 2008 §3.2): a matched
      prefix token at 1-indexed positions (pa, pb) bounds the achievable
      overlap by 1 + min(sa − pa, sb − pb) — the token itself plus at best
      the shorter remaining suffix, since both documents order tokens by
      the SAME global (df, w) key. Jaccard ≥ t needs overlap
      α = ⌈t/(1+t)·(sa+sb)⌉, so rows with the bound below α are pruned.
      Exactness is preserved: for any true pair, its globally-FIRST common
      token is inside both prefixes (any earlier common token would sit at a
      smaller position, hence also inside), and at that token every one of
      the pair's o common tokens occupies a distinct later position in both
      suffixes, so 1 + min(sa − pa, sb − pb) ≥ o ≥ α — that row survives.
      This is the pruning that still bites when a low-entropy vocabulary
      makes every prefix token near-universal and the length filter alone
      degenerates to all-pairs.

    `positional=False` keeps the pre-round-4 behavior (length filter only)
    for measuring the candidate-count reduction (PLANS.md).
    """
    prefix = ranked.filter(
        F.col("pos") <= F.col("sz") - _iceil(F.lit(threshold) * F.col("sz")) + 1
    ).select("id", "w", "pos", "sz")
    a = prefix.alias("a")
    b = prefix.alias("b")
    cond = (
        (F.col("a.w") == F.col("b.w"))
        & (F.col("a.id") < F.col("b.id"))
        & (
            F.least(F.col("a.sz"), F.col("b.sz"))
            >= _iceil(F.lit(threshold) * F.greatest(F.col("a.sz"), F.col("b.sz")))
        )
    )
    if positional:
        alpha = _iceil(
            F.lit(threshold / (1.0 + threshold)) * (F.col("a.sz") + F.col("b.sz"))
        )
        ubound = 1 + F.least(
            F.col("a.sz") - F.col("a.pos"), F.col("b.sz") - F.col("b.pos")
        )
        cond = cond & (ubound >= alpha)
    return (
        a.join(b, cond)
        .select(
            F.col("a.id").alias("da"),
            F.col("b.id").alias("db"),
            F.col("a.sz").alias("sa"),
            F.col("b.sz").alias("sb"),
        )
        .distinct()
    )


def similarity_join(
    docs: DataFrame,
    threshold: float = 0.6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All (doc_a, doc_b, jaccard) pairs with token-set Jaccard ≥ threshold.

    Exact result (identical to the quadratic `dedup.jaccard_pairs` on token
    sets) — prefix filtering only prunes candidates that provably cannot
    reach the threshold. Columns: doc_a < doc_b, jaccard rounded to 4 dp.
    """
    # the token-set table feeds three consumers (df counts, prefix index,
    # verify stage) — materialize once, spill-friendly
    from pyspark import StorageLevel

    toks = token_sets(docs, text_col, id_col).persist(StorageLevel.MEMORY_AND_DISK)
    cand = prefix_candidates(prefix_ranked(toks), threshold)
    ta = toks.alias("ta")
    tb = toks.alias("tb")
    common = (
        cand.join(ta, F.col("ta.id") == F.col("da"))
        .join(tb, (F.col("tb.id") == F.col("db")) & (F.col("tb.w") == F.col("ta.w")))
        .groupBy("da", "db", "sa", "sb")
        .agg(F.count("*").alias("c"))
    )
    jac = F.col("c").cast("double") / (
        F.col("sa") + F.col("sb") - F.col("c")
    ).cast("double")
    return (
        common.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            F.round("jaccard", 4).alias("jaccard"),
        )
    )
