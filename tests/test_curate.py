"""End-to-end curation pipeline (operators/curate.py) on a hand-built
corpus with known language/quality/dup structure."""

import pytest
from pyspark.sql import functions as F

from vptstools_spark.operators.curate import CurationConfig, curate_corpus


@pytest.fixture(scope="module")
def corpus(spark):
    # English docs contain 'the'; doc 1 == doc 2 (exact dup); docs 3,4 are
    # near-dups (share every 3-shingle except the tail); doc 5 is German
    # ('scan' marker); doc 6 fails quality (avg word len too high)
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog today"),
        (3, "the merge sort scan of the table rows a value b value c"),
        (4, "the merge sort scan of the table rows a value b value d"),
        (5, "scan scan scan scan und der scan"),
        (6, "the extraordinarily incomprehensible antidisestablishmentarianism manifestation"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_funnel_stages_and_survivors(spark, corpus):
    cfg = CurationConfig(
        keep_langs=("en",), min_stopword_ratio=0.0, max_avg_word_len=8.0
    )
    clean, report = curate_corpus(corpus, cfg)
    stages = {r["stage"]: (r["n_docs"], r["n_dropped"]) for r in report.collect()}
    assert stages["input"] == (6, 0)
    assert stages["lang_filter"] == (5, 1)       # doc 5 is 'de'
    assert stages["quality_filter"] == (4, 1)    # doc 6 avg word len > 8
    assert stages["exact_dedup"] == (3, 1)       # doc 2 == doc 1
    assert stages["near_dedup"] == (2, 1)        # doc 4 near-dups doc 3
    survivors = sorted(r["doc_id"] for r in clean.collect())
    assert survivors == [1, 3]  # smallest id survives each collapse


def test_report_is_monotone_and_ordered(spark, corpus):
    _clean, report = curate_corpus(corpus, CurationConfig(keep_langs=("en",)))
    rows = report.orderBy("stage_ord").collect()
    assert [r["stage"] for r in rows] == [
        "input", "lang_filter", "quality_filter", "exact_dedup", "near_dedup",
    ]
    counts = [r["n_docs"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    # n_dropped telescopes: drops sum to input - final
    assert sum(r["n_dropped"] for r in rows) == counts[0] - counts[-1]


def test_clean_corpus_keeps_schema(spark, corpus):
    clean, _ = curate_corpus(corpus, CurationConfig(keep_langs=("en", "de")))
    assert clean.columns == corpus.columns
