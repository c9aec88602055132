"""Text-analysis operator semantics."""

from pyspark.sql import functions as F

from vptstools_spark.operators.text import (
    fingerprint,
    predict_language,
    quality_features,
    token_count,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, n_chars long")


def test_token_count(spark):
    df = _df(spark, [(0, "one two three", 13)])
    assert df.select(token_count(F.col("text")).alias("n")).collect()[0]["n"] == 3


def test_quality_features(spark):
    df = _df(spark, [(0, "the cat sat a mat", 17)])
    feats = quality_features(F.col("text"), F.col("n_chars"))
    row = df.select(
        feats["n_tokens"].alias("nt"),
        feats["stopword_ratio"].alias("swr"),
        feats["avg_word_len"].alias("awl"),
    ).collect()[0]
    assert row["nt"] == 5
    assert abs(row["swr"] - 2 / 5) < 1e-12  # 'the' and 'a'
    assert abs(row["awl"] - (17 - 4) / 5) < 1e-12


def test_predict_language_argmax_and_tiebreak(spark):
    df = _df(
        spark,
        [
            (0, "the the table", 0),        # en wins 2-1
            (1, "table table the", 0),      # fr wins 2-1
            (2, "nothing matches here", 0), # all zero → first lang wins ties
            (3, "the table", 0),            # 1-1 tie → earlier lang (en) wins
        ],
    )
    got = {r["doc_id"]: r["p"] for r in df.select("doc_id", predict_language(F.col("text")).alias("p")).collect()}
    assert got == {0: "en", 1: "fr", 2: "en", 3: "en"}


def test_fingerprint_normalizes(spark):
    df = _df(spark, [(0, "Hello World", 0), (1, "  hello world ", 0)])
    fps = [r["fp"] for r in df.select(fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1]
    assert len(fps[0]) == 32


def test_bigram_generators_survive_single_token_docs(spark):
    """sequence(1, 0) DESCENDS in Spark, so an unguarded adjacent-pair
    transform hits element_at(a, 0) — a runtime error — on any one-token
    document. All three bigram generators must simply emit no bigrams."""
    from vptstools_spark.operators.pretrain import doc_bigrams

    df = spark.createDataFrame(
        [(1, "solo"), (2, "two words here"), (3, "pair up")],
        "doc_id long, text string",
    )
    got = doc_bigrams(df).collect()
    assert sorted(r.bigram for r in got) == [
        "pair up", "two words", "words here",
    ]


def test_pmi_and_bigram_queries_survive_single_token_docs(spark, tmp_path):
    """End-to-end: registry queries over a corpus containing a one-token
    document must run (the sf fixtures are all multi-token, so this is
    the only coverage of the guard at the query layer)."""
    import pyspark.sql.functions as F
    from vptstools_spark.analytics.text_q import q_bigram_counts, q_pmi_bigrams

    docs = spark.createDataFrame(
        [(i, "alpha" if i % 2 else "alpha beta gamma", "s") for i in range(20)],
        "doc_id long, text string, source string",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    bg = q_bigram_counts(spark, str(tmp_path)).collect()
    assert {r.bigram for r in bg} == {"alpha beta", "beta gamma"}
    pmi = q_pmi_bigrams(spark, str(tmp_path)).collect()
    assert len(pmi) == 2
