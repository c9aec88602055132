"""Text-analysis queries over the documents table: token stats, quality
scoring, language ID, fingerprinting, binary-column metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vptstools_spark.io import table
from vptstools_spark.operators.text import (
    LANG_MARKERS,
    fingerprint,
    predict_language,
    quality_features,
    token_count,
)


def q_text_tokens(spark: SparkSession, sf: str) -> DataFrame:
    d = table(spark, sf, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg(token_count(F.col("text"))), 4).alias("avg_tokens"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
    )


def q_text_quality(spark: SparkSession, sf: str) -> DataFrame:
    d = table(spark, sf, "documents")
    feats = quality_features(F.col("text"), F.col("n_chars"))
    per_doc = d.select(
        "source",
        feats["stopword_ratio"].alias("swr"),
        feats["avg_word_len"].alias("awl"),
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("swr"), 4).alias("stopword_ratio"),
        F.round(F.avg("awl"), 4).alias("avg_word_len"),
    )


def q_text_langid(spark: SparkSession, sf: str) -> DataFrame:
    d = table(spark, sf, "documents").filter(F.col("doc_id") < 200)
    return d.select("doc_id", predict_language(F.col("text")).alias("pred_lang"))


def q_text_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    d = table(spark, sf, "documents")
    return d.groupBy("source").agg(
        F.countDistinct(fingerprint(F.col("text"))).alias("n_unique"),
        F.count("*").alias("n_docs"),
    )


def q_mm_binary_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal plumbing: treat text payloads as opaque bytes; typed
    byte-length metadata per source (operators/multimodal.py carries the
    full blob/meta/mapInPandas path)."""
    d = table(spark, sf, "documents")
    return d.groupBy("source").agg(
        F.count("*").alias("n_blobs"),
        F.sum(F.octet_length("text")).cast("long").alias("total_bytes"),
        F.max(F.octet_length("text")).cast("long").alias("max_bytes"),
    )


def _langid_sql() -> str:
    counts = ",\n               ".join(
        f"len(list_filter(string_split(text, ' '), w -> w = '{marker}')) AS c_{lang}"
        for lang, marker in LANG_MARKERS
    )
    langs = [lang for lang, _ in LANG_MARKERS]
    branches = []
    for i, lang in enumerate(langs):
        conds = []
        for j, other in enumerate(langs):
            if i == j:
                continue
            op = ">" if j < i else ">="
            conds.append(f"c_{lang} {op} c_{other}")
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case = "CASE " + " ".join(branches) + f" ELSE '{langs[-1]}' END"
    return f"""
        WITH c AS (
            SELECT doc_id, {counts}
            FROM documents WHERE doc_id < 200
        )
        SELECT doc_id, {case} AS pred_lang FROM c
    """


QUERIES = {
    "text_tokens": q_text_tokens,
    "text_quality": q_text_quality,
    "text_langid": q_text_langid,
    "text_fingerprint": q_text_fingerprint,
    "mm_binary_stats": q_mm_binary_stats,
}

ORACLES = {
    "text_tokens": """
        SELECT lang,
               COUNT(*) AS n_docs,
               ROUND(AVG(len(string_split(text, ' '))), 4) AS avg_tokens,
               ROUND(AVG(n_chars), 4) AS avg_chars
        FROM documents GROUP BY lang
    """,
    "text_quality": """
        WITH t AS (
            SELECT source,
                   CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
                   CAST(len(list_filter(string_split(text, ' '),
                                        w -> w = 'the' OR w = 'a')) AS DOUBLE) AS n_stop,
                   CAST(n_chars AS DOUBLE) AS n_char
            FROM documents
        )
        SELECT source,
               COUNT(*) AS n_docs,
               ROUND(AVG(n_stop / n_tok), 4) AS stopword_ratio,
               ROUND(AVG((n_char - n_tok + 1.0) / n_tok), 4) AS avg_word_len
        FROM t GROUP BY source
    """,
    "text_langid": _langid_sql(),
    "text_fingerprint": """
        SELECT source,
               COUNT(DISTINCT md5(lower(trim(text)))) AS n_unique,
               COUNT(*) AS n_docs
        FROM documents GROUP BY source
    """,
    "mm_binary_stats": """
        SELECT source,
               COUNT(*) AS n_blobs,
               CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
               CAST(MAX(strlen(text)) AS BIGINT) AS max_bytes
        FROM documents GROUP BY source
    """,
}
