"""Text-analysis queries over the documents table: token stats, quality
scoring, language ID, fingerprinting, binary-column metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vptstools_spark.io import table
from vptstools_spark.operators.text import (
    LANG_MARKERS,
    fingerprint,
    hashed_linear_score,
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


def q_text_readability(spark: SparkSession, sf: str) -> DataFrame:
    """Flesch reading-ease per source — readability as a quality-filter
    feature (classic curation signal next to stopword/length ratios).
    Syllables = vowel-group count per token (≥1), sentences = terminal-
    punctuation count (≥1); the whole formula is JVM regexp + one array
    fold inside codegen, aggregated per source. Oracle rebuilds the
    identical heuristic in SQL."""
    d = table(spark, sf, "documents")
    words = F.filter(F.split(F.col("text"), " "), lambda w: w != F.lit(""))
    nw = F.greatest(F.size(words), F.lit(1))
    syl = F.aggregate(
        F.transform(
            words,
            lambda w: F.greatest(F.regexp_count(w, F.lit("[aeiouy]+")), F.lit(1)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    sent = F.greatest(F.regexp_count(F.col("text"), F.lit("[.!?]")), F.lit(1))
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (nw.cast("double") / sent.cast("double"))
        - F.lit(84.6) * (syl.cast("double") / nw.cast("double"))
    )
    per = d.select("source", flesch.alias("fl"), nw.alias("nw"), syl.alias("syl"))
    return per.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("fl"), 3).alias("flesch"),
        F.sum("nw").cast("long").alias("n_words"),
        F.sum("syl").cast("long").alias("n_syllables"),
    ).orderBy("source")


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


def q_mm_wav_features(spark: SparkSession, sf: str) -> DataFrame:
    """REAL WAV container decode end-to-end: synthesize deterministic
    RIFF/WAVE bytes per doc_id (operators/multimodal.py:synth_wav — mono
    16-bit PCM, rate/sample-count/waveform are pure functions of the id),
    then parse them back with the real chunk-walking parser
    (`wav_features`) and report header fields + PCM stats. The oracle
    recomputes every expected value analytically from the generation
    formula, so a parser bug (chunk alignment, fmt offsets, stride) breaks
    the value hash. Narrow map end-to-end: one Arrow-batched pass, no
    shuffle, no driver data."""
    from vptstools_spark.operators.multimodal import synth_blob_udf, wav_features

    d = (
        table(spark, sf, "documents")
        .filter(F.col("doc_id") < 200)
        .select(F.col("doc_id").alias("id"), synth_blob_udf("wav")(F.col("doc_id")).alias("blob"))
    )
    return (
        wav_features(d)
        .select(
            F.col("id").alias("doc_id"),
            "sample_rate",
            "n_channels",
            "bits",
            "n_samples",
            F.round("rms", 4).alias("rms"),
            "peak",
        )
        .orderBy("doc_id")
    )


def q_mm_bmp_stats(spark: SparkSession, sf: str) -> DataFrame:
    """REAL BMP decode end-to-end: deterministic 24-bpp bottom-up bitmaps
    with row padding (synth_bmp), re-parsed by `bmp_features`; the oracle
    recomputes width/height/pixel stats from the generation formula —
    catching stride/padding/row-order bugs by value."""
    from vptstools_spark.operators.multimodal import bmp_features, synth_blob_udf

    d = (
        table(spark, sf, "documents")
        .filter(F.col("doc_id") < 200)
        .select(F.col("doc_id").alias("id"), synth_blob_udf("bmp")(F.col("doc_id")).alias("blob"))
    )
    return (
        bmp_features(d)
        .select(
            F.col("id").alias("doc_id"),
            "width",
            "height",
            "bpp",
            F.round("mean_px", 4).alias("mean_px"),
            "max_px",
        )
        .orderBy("doc_id")
    )


def q_mm_pcm_frames(spark: SparkSession, sf: str) -> DataFrame:
    """Raw-PCM framing path value-oracled (the operator was pytest-only
    until round 4): deterministic int16 waveforms (synth_pcm) framed into
    32-sample windows by `pcm_frame_energy` — per-frame RMS/peak, with a
    partial final frame whenever the sample count isn't a multiple of 32.
    The oracle regroups the generation formula by i//32."""
    from vptstools_spark.operators.multimodal import pcm_frame_energy, synth_blob_udf

    d = (
        table(spark, sf, "documents")
        .filter(F.col("doc_id") < 200)
        .select(F.col("doc_id").alias("id"), synth_blob_udf("pcm")(F.col("doc_id")).alias("blob"))
    )
    return (
        pcm_frame_energy(d, frame_samples=32)
        .select(
            F.col("id").alias("doc_id"),
            "frame_id",
            "n_samples",
            F.round("rms", 4).alias("rms"),
            "peak",
        )
        .orderBy("doc_id", "frame_id")
    )


def q_mm_bmp_patches(spark: SparkSession, sf: str) -> DataFrame:
    """ViT-style patchify over real decoded BMPs
    (`operators/multimodal.py:bmp_patches`): 2×2 pixel tiles from the
    TOP-DOWN-reoriented image, partial edge patches dropped, per-patch
    channel-byte mean/max. The oracle re-derives every patch from the
    synth_bmp generation formula ((id + 3r + 5c) % 256 at top-down (r,c)),
    so a row-flip or stride bug changes the values — this is the
    decode→tile front of an image-pretraining pipeline with the codec
    swapped for the BMP walker."""
    from vptstools_spark.operators.multimodal import bmp_patches, synth_blob_udf

    d = (
        table(spark, sf, "documents")
        .filter(F.col("doc_id") < 200)
        .select(F.col("doc_id").alias("id"), synth_blob_udf("bmp")(F.col("doc_id")).alias("blob"))
    )
    return (
        bmp_patches(d, patch=2)
        .select(
            F.col("id").alias("doc_id"),
            "patch_row",
            "patch_col",
            F.round("mean_px", 4).alias("mean_px"),
            "max_px",
        )
        .orderBy("doc_id", "patch_row", "patch_col")
    )


def q_text_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """Repetition scoring — a core pre-training quality signal: per-doc word
    count, distinct-word ratio, and top-word mass. Explode → two-level
    aggregation; both aggregations combine map-side, and the (doc_id, word)
    exchange is the only shuffle."""
    d = table(spark, sf, "documents").filter(F.col("doc_id") < 300)
    wc = (
        d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    return (
        wc.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_words"),
            F.count("*").alias("n_distinct"),
            F.max("c").alias("top_c"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_distinct",
            F.round(F.col("n_distinct") / F.col("n_words"), 4).alias("distinct_ratio"),
            F.round(F.col("top_c") / F.col("n_words"), 4).alias("top_word_ratio"),
        )
    )


def q_text_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """Unicode-light text canonicalization (lowercase, strip non-alnum,
    collapse whitespace) and its effect on dedup: distinct normalized
    fingerprints per source. Pure JVM expressions — no Python in the path."""
    d = table(spark, sf, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(F.md5(norm)).alias("n_distinct_norm"),
    )


def q_vocab_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus vocabulary build — the first step of any tokenizer/LM-data
    pipeline: term frequency + document frequency per word, top-100 by
    count. Explode → one (word) exchange with map-side partial aggs; the
    global top-k is a TakeOrdered over the (tiny) vocabulary, not a sort of
    the corpus."""
    d = table(spark, sf, "documents")
    words = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("w"))
    return (
        words.groupBy("w")
        .agg(
            F.count("*").alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.col("tf").desc(), "w")
        .limit(100)
    )


def q_tfidf_top(spark: SparkSession, sf: str) -> DataFrame:
    """TF-IDF per (doc, word) with the top-3 scoring words per document.
    The corpus-level document-frequency table is small (vocabulary-sized)
    and broadcast back onto the per-doc term counts; N is a 1-row scalar
    broadcast. Ranking is a window partitioned by doc_id — no global sort."""
    from pyspark.sql import Window

    d = table(spark, sf, "documents").filter(F.col("doc_id") < 50)
    corpus = table(spark, sf, "documents")
    tf = (
        d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
    )
    df_tbl = (
        corpus.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("w"))
        .groupBy("w")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    n_docs = corpus.agg(F.count("*").alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("w")
    )
    return (
        tf.join(F.broadcast(df_tbl), "w")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "w", "tf", "df", "tfidf", "rnk")
    )


def q_bigram_counts(spark: SparkSession, sf: str) -> DataFrame:
    """N-gram LM counts: top-50 bigrams across the corpus. Adjacent-pair
    generation is a pure JVM array transform (no Python, no self-join);
    1-indexed element_at matches the oracle's list semantics."""
    d = table(spark, sf, "documents")
    # split once per row; the pair transform then indexes the materialized
    # array instead of re-tokenizing three times inside one expression
    # guard single-token docs: sequence(1, 0) is DESCENDING in Spark and
    # element_at(a, 0) raises; DuckDB's generate_series(1, 0) is just empty
    bigrams = d.select(F.split(F.col("text"), " ").alias("a")).filter(
        F.size("a") >= 2
    ).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(a) - 1),"
                " i -> concat(element_at(a, i), ' ', element_at(a, i + 1)))"
            )
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(50)
    )


def q_fuzzy_part_match(spark: SparkSession, sf: str) -> DataFrame:
    """Blocked fuzzy self-match: near-identical part names (levenshtein ≤ 3)
    within a p_size block. The blocking key turns the quadratic all-pairs
    edit-distance scan into per-block equi-join candidates — same
    candidate-restriction idea as LSH banding, with a JVM levenshtein as the
    verifier. Key inequality halves the pairs and removes self-matches."""
    p = table(spark, sf, "part").select("p_partkey", "p_name", "p_size")
    a = p.select(
        F.col("p_size").alias("size"),
        F.col("p_partkey").alias("pk_a"),
        F.col("p_name").alias("name_a"),
    )
    b = p.select(
        F.col("p_size").alias("size"),
        F.col("p_partkey").alias("pk_b"),
        F.col("p_name").alias("name_b"),
    )
    # fan the quadratic verify stage out across cores: the part scan is a
    # single input split, and a broadcast join would keep the whole O(n²/B)
    # candidate evaluation on that one task — repartition on the block key
    # so each block's pair enumeration is its own task
    return (
        a.repartition(32, "size")
        .join(b, "size")
        .filter(F.col("pk_a") < F.col("pk_b"))
        # length gap > 3 can't be within distance 3 — cheap reject before the
        # DP; the 3-arg bounded levenshtein then early-exits rows over budget
        .filter(
            F.abs(F.length("name_a") - F.length("name_b")) <= 3
        )
        .filter(F.levenshtein("name_a", "name_b", 3) >= 0)
        .groupBy("size")
        .agg(F.count("*").alias("n_pairs"))
    )


def _langid_case_parts() -> tuple[str, str]:
    """(marker-count column list, argmax CASE) — the SQL mirror of
    `predict_language`, shared by the langid and pipeline-funnel oracles."""
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
    return counts, case


def _langid_sql() -> str:
    counts, case = _langid_case_parts()
    return f"""
        WITH c AS (
            SELECT doc_id, {counts}
            FROM documents WHERE doc_id < 200
        )
        SELECT doc_id, {case} AS pred_lang FROM c
    """


def _pipeline_filter_sql() -> str:
    counts, case = _langid_case_parts()
    return f"""
        WITH c AS (
            SELECT doc_id, source, n_chars, text, {counts}
            FROM documents
        ),
        staged AS (
            SELECT doc_id, source, n_chars,
                   {case} AS pred_lang,
                   md5(lower(trim(text))) AS fp
            FROM c
        ),
        quality AS (
            SELECT * FROM staged WHERE pred_lang = 'en' AND n_chars >= 100
        ),
        surv AS (
            SELECT source FROM (
                SELECT source, ROW_NUMBER() OVER (PARTITION BY fp
                                                  ORDER BY doc_id) AS rn
                FROM quality
            ) WHERE rn = 1
        )
        SELECT t.source,
               t.n_total, t.n_lang, t.n_quality,
               COALESCE(f.n_final, 0) AS n_final
        FROM (
            SELECT source, COUNT(*) AS n_total,
                   COUNT(*) FILTER (pred_lang = 'en') AS n_lang,
                   COUNT(*) FILTER (pred_lang = 'en' AND n_chars >= 100)
                       AS n_quality
            FROM staged GROUP BY source
        ) t
        LEFT JOIN (SELECT source, COUNT(*) AS n_final
                   FROM surv GROUP BY source) f
          ON t.source = f.source
    """


def q_pipeline_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Training-data cleaning funnel — the composite pipeline every
    pretraining corpus goes through, as ONE declarative plan: language
    filter → length/quality filter → exact-dedup keep-first, with per-source
    survivor counts at each stage. Stage predicates are conditional
    aggregates over a single scan; only the dedup stage adds a shuffle
    (window on the fingerprint)."""
    from vptstools_spark.operators.text import fingerprint, predict_language

    d = table(spark, sf, "documents")
    staged = d.select(
        "doc_id",
        "source",
        "n_chars",
        predict_language(F.col("text")).alias("pred_lang"),
        fingerprint(F.col("text")).alias("fp"),
    )
    ok_lang = F.col("pred_lang") == "en"
    ok_quality = ok_lang & (F.col("n_chars") >= 100)
    totals = staged.groupBy("source").agg(
        F.count("*").alias("n_total"),
        F.count_if(ok_lang).alias("n_lang"),
        F.count_if(ok_quality).alias("n_quality"),
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    final = (
        staged.filter(ok_quality)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("source")
        .agg(F.count("*").alias("n_final"))
    )
    return totals.join(final, "source", "left").na.fill(0, ["n_final"])


def q_langid_confusion(spark: SparkSession, sf: str) -> DataFrame:
    """Language-ID confusion matrix: labeled `lang` vs the n-gram-marker
    prediction, over the whole corpus — the QA view of the langid stage
    (per-cell counts expose which language pairs the heuristic conflates).
    One narrow map + one groupBy on a 25-cell key space."""
    from vptstools_spark.operators.text import predict_language

    d = table(spark, sf, "documents")
    return (
        d.select("lang", predict_language(F.col("text")).alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n_docs"))
    )


def q_mi_lang_source(spark: SparkSession, sf: str) -> DataFrame:
    """Mutual information between two categorical columns (lang × source):
    per-cell pointwise MI and MI contribution, the dependence screen for
    corpus composition ("does source determine language?") and for feature
    selection. One joint-count aggregate + two broadcast marginal joins —
    counts stay integers until a single double division per cell, and
    ln((n_xy·N)/(n_x·n_y)) is evaluated as a double ratio so the cell math
    never overflows at corpus scale. MI total = SUM(mi_term) ≥ 0."""
    d = table(spark, sf, "documents")
    joint = d.groupBy("lang", "source").agg(F.count("*").alias("n_xy"))
    mx = joint.groupBy("lang").agg(F.sum("n_xy").alias("n_x"))
    my = joint.groupBy("source").agg(F.sum("n_xy").alias("n_y"))
    tot = joint.agg(F.sum("n_xy").alias("n_tot"))
    ratio = (F.col("n_xy").cast("double") * F.col("n_tot").cast("double")) / (
        F.col("n_x").cast("double") * F.col("n_y").cast("double")
    )
    pmi = F.log(ratio)
    return (
        joint.join(F.broadcast(mx), "lang")
        .join(F.broadcast(my), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "source",
            "n_xy",
            F.round(pmi, 6).alias("pmi"),
            F.round(
                (F.col("n_xy").cast("double") / F.col("n_tot")) * pmi, 8
            ).alias("mi_term"),
        )
    )


def q_text_length_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language length profile: doc count, mean chars, exact median and
    p90 token counts — the length-filter calibration view of a cleaning
    pipeline (percentile ↔ quantile_cont share the interpolation rule)."""
    from vptstools_spark.operators.text import token_count

    d = table(spark, sf, "documents")
    t = d.select("lang", "n_chars", token_count(F.col("text")).alias("n_tok"))
    return t.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(F.percentile("n_tok", F.lit(0.5)), 4).alias("p50_tokens"),
        F.round(F.percentile("n_tok", F.lit(0.9)), 4).alias("p90_tokens"),
    )


def q_profile_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Column-profiling pass over the corpus, per source: row counts,
    distinct langs, whitespace-token averages, char-length extrema — the
    data-quality monitoring stage a production pipeline runs on every
    ingest batch. One hash aggregation; countDistinct rewrites to a
    two-phase expand+agg (partial per partition), so no key ever
    concentrates."""
    d = table(spark, sf, "documents")
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum(F.when(F.length("text") == 0, 1).otherwise(0)).alias("n_empty"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.round(F.avg(F.size(F.split(F.trim(F.col("text")), r"\s+"))), 2).alias(
            "avg_ws_tokens"
        ),
    )


def q_quality_classifier(spark: SparkSession, sf: str) -> DataFrame:
    """Hashed-linear (fasttext-style) quality classifier: per-document
    sigmoid score over md5-hashed token weights, computed as a per-row
    higher-order aggregate — no explode, no shuffle, scan-speed scoring."""
    d = table(spark, sf, "documents")
    score = F.round(hashed_linear_score(F.col("text")), 4)
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        score.alias("score"),
        (score >= 0.5).alias("keep"),
    ).filter(F.col("score").isNotNull())


def q_inverted_index(spark: SparkSession, sf: str) -> DataFrame:
    """Inverted index build: per term, document frequency and the sorted
    postings list (rendered as a comma-joined string so the value oracle
    can hash it). Postings are collect_set + sort_array — dedup happens in
    the aggregate, order is imposed after, so the result is deterministic
    under any shuffle schedule. Top-20 terms by df; at scale the postings
    table is what you'd range-partition by term and write bucketed."""
    d = table(spark, sf, "documents")
    return (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.concat_ws(",", F.sort_array(F.collect_set("doc_id"))).alias("postings"),
        )
        .orderBy(F.col("df").desc(), "term")
        .limit(20)
    )


QUERIES = {
    "text_readability": q_text_readability,
    "inverted_index": q_inverted_index,
    "profile_documents": q_profile_documents,
    "quality_classifier": q_quality_classifier,
    "text_tokens": q_text_tokens,
    "text_quality": q_text_quality,
    "text_langid": q_text_langid,
    "langid_confusion": q_langid_confusion,
    "mi_lang_source": q_mi_lang_source,
    "text_length_stats": q_text_length_stats,
    "text_fingerprint": q_text_fingerprint,
    "text_repetition": q_text_repetition,
    "text_normalize": q_text_normalize,
    "mm_binary_stats": q_mm_binary_stats,
    "mm_wav_features": q_mm_wav_features,
    "mm_bmp_stats": q_mm_bmp_stats,
    "mm_bmp_patches": q_mm_bmp_patches,
    "mm_pcm_frames": q_mm_pcm_frames,
    "vocab_topk": q_vocab_topk,
    "tfidf_top": q_tfidf_top,
    "bigram_counts": q_bigram_counts,
    "fuzzy_part_match": q_fuzzy_part_match,
    "pipeline_filter": q_pipeline_filter,
}

def _langid_confusion_sql() -> str:
    counts, case = _langid_case_parts()
    return f"""
        WITH c AS (
            SELECT doc_id, lang, {counts}
            FROM documents
        )
        SELECT lang, {case} AS pred_lang, COUNT(*) AS n_docs
        FROM c GROUP BY lang, pred_lang
    """


ORACLES = {
    "text_readability": """
        WITH t AS (
            SELECT source,
                   list_filter(string_split(text, ' '), x -> x <> '') AS w,
                   GREATEST(len(regexp_extract_all(text, '[.!?]')), 1) AS s
            FROM documents
        ),
        m AS (
            SELECT source, s,
                   GREATEST(len(w), 1) AS nw,
                   list_aggregate(
                       list_transform(w, x ->
                           GREATEST(len(regexp_extract_all(x, '[aeiouy]+')), 1)),
                       'sum') AS syl
            FROM t
        )
        SELECT source,
               COUNT(*) AS n_docs,
               ROUND(AVG(206.835 - 1.015 * (CAST(nw AS DOUBLE) / s)
                         - 84.6 * (CAST(syl AS DOUBLE) / nw)), 3) AS flesch,
               CAST(SUM(nw) AS BIGINT) AS n_words,
               CAST(SUM(syl) AS BIGINT) AS n_syllables
        FROM m GROUP BY source ORDER BY source
    """,
    "mm_bmp_patches": """
        WITH ids AS (
            SELECT DISTINCT doc_id AS id FROM documents WHERE doc_id < 200
        ),
        dims AS (SELECT id, 8 + id % 3 AS width FROM ids),
        grid AS (
            SELECT id, pr.pr, pc.pc
            FROM dims,
                 (SELECT unnest(generate_series(0, 2)) AS pr) pr,
                 (SELECT unnest(generate_series(0, 4)) AS pc) pc
            WHERE pc.pc < width // 2
        ),
        cells AS (
            SELECT id, pr, pc,
                   CAST((id + 3 * (2 * pr + dr.d) + 5 * (2 * pc + dc.d)) % 256
                        AS DOUBLE) AS v
            FROM grid,
                 (SELECT unnest(generate_series(0, 1)) AS d) dr,
                 (SELECT unnest(generate_series(0, 1)) AS d) dc
        )
        SELECT id AS doc_id, pr AS patch_row, pc AS patch_col,
               ROUND(AVG(v), 4) AS mean_px, CAST(MAX(v) AS INT) AS max_px
        FROM cells GROUP BY 1, 2, 3
        ORDER BY doc_id, patch_row, patch_col
    """,
    "mi_lang_source": """
        WITH joint AS (
            SELECT lang, source, COUNT(*) AS n_xy
            FROM documents GROUP BY lang, source
        ),
        mx AS (SELECT lang, SUM(n_xy) AS n_x FROM joint GROUP BY lang),
        my AS (SELECT source, SUM(n_xy) AS n_y FROM joint GROUP BY source),
        tot AS (SELECT SUM(n_xy) AS n_tot FROM joint)
        SELECT j.lang, j.source, j.n_xy,
               ROUND(ln((CAST(j.n_xy AS DOUBLE) * CAST(n_tot AS DOUBLE))
                        / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE))), 6)
                   AS pmi,
               ROUND((CAST(j.n_xy AS DOUBLE) / n_tot)
                     * ln((CAST(j.n_xy AS DOUBLE) * CAST(n_tot AS DOUBLE))
                          / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE))), 8)
                   AS mi_term
        FROM joint j
        JOIN mx USING (lang)
        JOIN my USING (source)
        CROSS JOIN tot
    """,
    "inverted_index": """
WITH toks AS (
    SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
)
SELECT term, COUNT(*) AS df,
       array_to_string(list_sort(list(doc_id)), ',') AS postings
FROM toks WHERE term <> ''
GROUP BY term ORDER BY df DESC, term LIMIT 20
""",
    "pipeline_filter": _pipeline_filter_sql(),
    "quality_classifier": """
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), w -> len(w) > 0) AS toks,
                   len(string_split(text, ' ')) AS n_tokens
            FROM documents
        ),
        s AS (
            SELECT doc_id, n_tokens, len(toks) AS n,
                   0.0 + list_reduce(
                       list_transform(toks, tok ->
                           (CAST('0x' || SUBSTRING(md5('w#' || tok), 1, 6) AS BIGINT)
                            % 2001 - 1000) / 1000.0),
                       (acc, x) -> acc + x) AS total
            FROM t WHERE len(toks) > 0
        )
        SELECT doc_id, n_tokens,
               ROUND(1.0 / (1.0 + EXP(-4.0 * (total / n))), 4) AS score,
               ROUND(1.0 / (1.0 + EXP(-4.0 * (total / n))), 4) >= 0.5 AS keep
        FROM s
    """,
    "langid_confusion": _langid_confusion_sql(),
    "text_length_stats": """
        SELECT lang,
               COUNT(*) AS n_docs,
               ROUND(AVG(n_chars), 4) AS avg_chars,
               ROUND(quantile_cont(len(string_split(text, ' ')), 0.5), 4)
                   AS p50_tokens,
               ROUND(quantile_cont(len(string_split(text, ' ')), 0.9), 4)
                   AS p90_tokens
        FROM documents GROUP BY lang
    """,
    "vocab_topk": """
        WITH words AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents
        )
        SELECT w, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
        FROM words GROUP BY w
        ORDER BY tf DESC, w
        LIMIT 100
    """,
    "tfidf_top": """
        WITH words AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents
        ),
        tf AS (
            SELECT doc_id, w, COUNT(*) AS tf FROM words
            WHERE doc_id < 50 GROUP BY doc_id, w
        ),
        dfr AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY w),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.w, tf.tf, dfr.df,
                   ROUND(tf.tf * ln(n.n_docs / dfr.df), 4) AS tfidf
            FROM tf JOIN dfr ON tf.w = dfr.w CROSS JOIN n
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                         ORDER BY tfidf DESC, w) AS rnk
            FROM scored
        )
        SELECT doc_id, w, tf, df, tfidf, rnk FROM ranked WHERE rnk <= 3
    """,
    "fuzzy_part_match": """
        SELECT a.p_size AS size, COUNT(*) AS n_pairs
        FROM part a JOIN part b
          ON a.p_size = b.p_size AND a.p_partkey < b.p_partkey
        WHERE levenshtein(a.p_name, b.p_name) <= 3
        GROUP BY a.p_size
    """,
    "bigram_counts": """
        WITH grams AS (
            SELECT unnest(list_transform(
                       generate_series(1, len(string_split(text, ' ')) - 1),
                       i -> string_split(text, ' ')[i] || ' ' ||
                            string_split(text, ' ')[i + 1])) AS bigram
            FROM documents
        )
        SELECT bigram, COUNT(*) AS n
        FROM grams GROUP BY bigram
        ORDER BY n DESC, bigram
        LIMIT 50
    """,
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
    "text_repetition": """
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents WHERE doc_id < 300
        ),
        wc AS (SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY 1, 2)
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_words,
               COUNT(*) AS n_distinct,
               ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(c), 4) AS distinct_ratio,
               ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 4) AS top_word_ratio
        FROM wc GROUP BY doc_id
    """,
    "text_normalize": """
        SELECT source, COUNT(*) AS n_docs,
               COUNT(DISTINCT md5(trim(regexp_replace(regexp_replace(
                   lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')))) AS n_distinct_norm
        FROM documents GROUP BY source
    """,
    "mm_binary_stats": """
        SELECT source,
               COUNT(*) AS n_blobs,
               CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
               CAST(MAX(strlen(text)) AS BIGINT) AS max_bytes
        FROM documents GROUP BY source
    """,
    # analytic recomputation of the synth_wav generation formula: the Spark
    # side round-trips these values through REAL RIFF bytes and the parser
    "mm_wav_features": """
        WITH params AS (
            SELECT doc_id,
                   CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
                   64 + (doc_id % 5) * 16 AS n
            FROM documents WHERE doc_id < 200
        ), samples AS (
            SELECT doc_id, sample_rate, n, UNNEST(GENERATE_SERIES(0, n - 1)) AS i
            FROM params
        ), vals AS (
            SELECT doc_id, sample_rate, n,
                   (doc_id * 7 + i * 13) % 201 - 100 AS x
            FROM samples
        )
        SELECT doc_id, sample_rate,
               CAST(1 AS INT) AS n_channels, CAST(16 AS INT) AS bits,
               CAST(n AS BIGINT) AS n_samples,
               ROUND(SQRT(AVG(CAST(x * x AS DOUBLE))), 4) AS rms,
               CAST(MAX(ABS(x)) AS INT) AS peak
        FROM vals GROUP BY doc_id, sample_rate, n ORDER BY doc_id
    """,
    "mm_pcm_frames": """
        WITH params AS (
            SELECT doc_id, 64 + (doc_id % 5) * 16 AS n
            FROM documents WHERE doc_id < 200
        ), s AS (
            SELECT doc_id, UNNEST(GENERATE_SERIES(0, n - 1)) AS i FROM params
        ), v AS (
            SELECT doc_id, CAST(i // 32 AS INT) AS frame_id,
                   (doc_id * 7 + i * 13) % 201 - 100 AS x
            FROM s
        )
        SELECT doc_id, frame_id, CAST(COUNT(*) AS INT) AS n_samples,
               ROUND(SQRT(AVG(CAST(x * x AS DOUBLE))), 4) AS rms,
               CAST(MAX(ABS(x)) AS INT) AS peak
        FROM v GROUP BY doc_id, frame_id ORDER BY doc_id, frame_id
    """,
    # analytic recomputation of the synth_bmp generation formula (top-row
    # r=0; the Spark side must undo the bottom-up row order and padding)
    "mm_bmp_stats": """
        WITH params AS (
            SELECT doc_id, CAST(8 + doc_id % 3 AS INT) AS w, 6 AS h
            FROM documents WHERE doc_id < 200
        ), px AS (
            SELECT doc_id, w, h,
                   (doc_id + r.r * 3 + c.c * 5) % 256 AS v
            FROM params,
                 (SELECT UNNEST(GENERATE_SERIES(0, 5)) AS r) r,
                 LATERAL (SELECT UNNEST(GENERATE_SERIES(0, w - 1)) AS c) c
        )
        SELECT doc_id, w AS width, CAST(h AS INT) AS height,
               CAST(24 AS INT) AS bpp,
               ROUND(AVG(CAST(v AS DOUBLE)), 4) AS mean_px,
               CAST(MAX(v) AS INT) AS max_px
        FROM px GROUP BY doc_id, w, h ORDER BY doc_id
    """,
}

ORACLES["profile_documents"] = """
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT lang) AS n_langs,
           CAST(SUM(CASE WHEN LENGTH(text) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
           ROUND(AVG(n_chars), 2) AS avg_chars,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars,
           ROUND(AVG(LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+'))), 2) AS avg_ws_tokens
    FROM documents
    GROUP BY source
"""


def q_pmi_bigrams(spark: SparkSession, sf: str) -> DataFrame:
    """Collocation mining: top-20 bigrams by pointwise mutual information
    PMI = ln(c_xy * N / (c_x * c_y)) with a min-count floor — the
    keyphrase signal raw frequency misses (frequent pairs of rare words).
    One tokenized pass feeds both the unigram and bigram counts; the
    unigram table broadcasts onto the bigram aggregate, and N re-joins
    as a 1-row broadcast, so PMI costs one corpus fold + vocab-sized
    joins."""
    d = table(spark, sf, "documents")
    toks = d.select(F.split(F.col("text"), " ").alias("a"))
    uni = toks.select(F.explode("a").alias("w")).groupBy("w").agg(
        F.count("*").alias("c")
    )
    n_tok = uni.agg(F.sum("c").cast("double").alias("n"))
    bi = (
        # size(a) < 2 would make sequence(1, size(a)-1) DESCENDING ([1, 0])
        # and element_at(a, 0) is a runtime error — filter, don't transform
        toks.filter(F.size("a") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(a) - 1),"
                    " i -> struct(element_at(a, i) AS w1,"
                    "             element_at(a, i + 1) AS w2))"
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c_xy"))
        .filter(F.col("c_xy") >= 5)
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    return (
        bi.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(n_tok))
        .select(
            "w1",
            "w2",
            "c_xy",
            F.round(
                F.log(
                    F.col("c_xy") * F.col("n")
                    / (F.col("c1") * F.col("c2").cast("double"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(20)
    )


ORACLES["pmi_bigrams"] = """
    WITH toks AS (
        SELECT string_split(text, ' ') AS a FROM documents
    ),
    uni AS (
        SELECT w, COUNT(*) AS c FROM (
            SELECT UNNEST(a) AS w FROM toks
        ) GROUP BY w
    ),
    n_tok AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM uni),
    bi AS (
        SELECT w1, w2, COUNT(*) AS c_xy FROM (
            SELECT UNNEST(list_transform(generate_series(1, len(a) - 1),
                                         i -> a[i])) AS w1,
                   UNNEST(list_transform(generate_series(1, len(a) - 1),
                                         i -> a[i + 1])) AS w2
            FROM toks
        )
        GROUP BY 1, 2
        HAVING COUNT(*) >= 5
    )
    SELECT w1, w2, c_xy,
           ROUND(LN(c_xy * (SELECT n FROM n_tok)
                    / (u1.c * CAST(u2.c AS DOUBLE))), 6) AS pmi
    FROM bi
    JOIN uni u1 ON u1.w = bi.w1
    JOIN uni u2 ON u2.w = bi.w2
    ORDER BY pmi DESC, w1, w2
    LIMIT 20
"""

QUERIES["pmi_bigrams"] = q_pmi_bigrams


def q_lexical_diversity(spark: SparkSession, sf: str) -> DataFrame:
    """Lexical diversity per source: type-token ratio and hapax share
    (words occurring once) - corpus-quality features that catch
    template/boilerplate sources (low TTR) and OCR noise (high hapax).
    One tokenized pass -> per-(source, word) counts -> per-source
    closed forms; everything is vocabulary-sized after the first fold."""
    d = table(spark, sf, "documents")
    counts = (
        d.select("source", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").alias("c"))
    )
    return counts.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.round(F.count("*") / F.sum("c"), 6).alias("ttr"),
        F.round(
            F.count(F.when(F.col("c") == 1, 1)) / F.count("*"), 6
        ).alias("hapax_share"),
    )


ORACLES["lexical_diversity"] = """
    WITH counts AS (
        SELECT source, w, COUNT(*) AS c FROM (
            SELECT source, UNNEST(string_split(text, ' ')) AS w
            FROM documents
        ) GROUP BY 1, 2
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           COUNT(*) AS n_types,
           ROUND(COUNT(*) / CAST(SUM(c) AS DOUBLE), 6) AS ttr,
           ROUND(COUNT(*) FILTER (c = 1) / CAST(COUNT(*) AS DOUBLE), 6)
               AS hapax_share
    FROM counts GROUP BY 1
"""

QUERIES["lexical_diversity"] = q_lexical_diversity


def q_rake_keywords(spark: SparkSession, sf: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al.): candidate phrases are
    maximal runs of non-stopword tokens (stopwords = tokens appearing
    in > 60% of documents — corpus-derived, deterministic), each word
    scores degree/frequency (degree = Σ length of phrases containing
    it), and a phrase scores the sum of its word scores. Scores are
    kept as integer MICRO-scores (⌊deg·10⁶/freq⌋) so the per-phrase sum
    is order-independent and cross-engine exact. Per-doc windows only
    (partitioned by doc_id); the word/phrase tables are
    vocabulary-bounded. Top 10 phrases by score."""
    from pyspark.sql import Window

    d = table(spark, sf, "documents")
    n_docs = d.count()
    toks = d.select(
        "doc_id",
        F.posexplode(
            F.filter(F.split("text", " "), lambda w: w != F.lit(""))
        ).alias("pos", "w"),
    )
    stop = (
        toks.groupBy("w")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") > 0.6 * float(n_docs))
        .select("w")
    )
    nonstop = toks.join(F.broadcast(stop), "w", "left_anti")
    wn = Window.partitionBy("doc_id").orderBy("pos")
    runs = nonstop.withColumn(
        "grp", F.col("pos") - F.row_number().over(wn)
    )
    phrases = runs.groupBy("doc_id", "grp").agg(
        F.concat_ws(" ", F.collect_list(F.struct("pos", "w").w)).alias("p0"),
        F.array_sort(F.collect_list(F.struct("pos", "w"))).alias("ws"),
    ).select(
        F.concat_ws(
            " ", F.transform("ws", lambda s: s.getField("w"))
        ).alias("phrase"),
        F.size("ws").alias("plen"),
        F.transform("ws", lambda s: s.getField("w")).alias("words"),
    )
    word_stats = (
        phrases.select(F.explode("words").alias("w"), "plen")
        .groupBy("w")
        .agg(
            F.count("*").alias("freq"),
            F.sum("plen").alias("deg"),
        )
        .select(
            "w",
            F.floor(F.col("deg") * 1000000 / F.col("freq")).alias("uscore"),
        )
    )
    scored = (
        phrases.select("phrase", F.posexplode("words").alias("i", "w"))
        .join(F.broadcast(word_stats), "w")
        .groupBy("phrase", "i")
        .agg(F.first("uscore").alias("uscore"))
        .groupBy("phrase")
        .agg(F.sum("uscore").alias("u"), F.count("*").alias("plen"))
    )
    # distinct phrase strings score once; occurrence counts reported
    occ = phrases.groupBy("phrase").agg(F.count("*").alias("n_occurrences"))
    return (
        scored.join(occ, "phrase")
        .select(
            "phrase",
            "n_occurrences",
            F.round(F.col("u") / 1e6, 4).alias("rake_score"),
        )
        .orderBy(F.col("rake_score").desc(), "phrase")
        .limit(10)
    )


ORACLES["rake_keywords"] = """
    WITH toks AS (
        SELECT doc_id, u.w, u.pos FROM documents,
        LATERAL (
            SELECT UNNEST(l) AS w,
                   UNNEST(GENERATE_SERIES(0, LEN(l) - 1)) AS pos
            FROM (SELECT LIST_FILTER(STRING_SPLIT(text, ' '),
                                     x -> x <> '') AS l)
        ) u
    ), stop AS (
        SELECT w FROM (
            SELECT w, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY w
        ) WHERE df > 0.6 * (SELECT COUNT(*) FROM documents)
    ), nonstop AS (
        SELECT * FROM toks WHERE w NOT IN (SELECT w FROM stop)
    ), runs AS (
        SELECT doc_id, w, pos,
               pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
                   AS grp
        FROM nonstop
    ), phrases AS (
        SELECT STRING_AGG(w, ' ' ORDER BY pos) AS phrase,
               COUNT(*) AS plen
        FROM runs GROUP BY doc_id, grp
    ), pw AS (
        SELECT phrase, plen, u.w, u.i FROM phrases,
        LATERAL (
            SELECT UNNEST(STRING_SPLIT(phrase, ' ')) AS w,
                   UNNEST(GENERATE_SERIES(1, LEN(STRING_SPLIT(phrase, ' ')))) AS i
        ) u
    ), ws AS (
        SELECT w, CAST(FLOOR(SUM(plen) * 1000000.0 / COUNT(*)) AS BIGINT)
                      AS uscore
        FROM pw
        GROUP BY w
    ), scored AS (
        SELECT p.phrase, SUM(ws.uscore) AS u
        FROM (SELECT DISTINCT phrase, w, i FROM pw) p
        JOIN ws USING (w)
        GROUP BY p.phrase
    ), occ AS (
        SELECT phrase, COUNT(*) AS n_occurrences FROM phrases GROUP BY 1
    )
    SELECT s.phrase, CAST(occ.n_occurrences AS BIGINT) AS n_occurrences,
           ROUND(s.u / 1000000.0, 4) AS rake_score
    FROM scored s JOIN occ USING (phrase)
    ORDER BY rake_score DESC, phrase
    LIMIT 10
"""
QUERIES["rake_keywords"] = q_rake_keywords


def q_heaps_law_fit(spark: SparkSession, sf: str) -> DataFrame:
    """Heaps'-law fit of vocabulary growth V(n) ≈ K·n^β over corpus
    prefixes (corpus QA for tokenizer/LM planning). V(n) needs no
    cumulative-distinct pass: a token's FIRST document (min doc_id)
    makes V(n) = |tokens with first_doc < n| — one vocabulary-bounded
    aggregate joined to 8 prefix checkpoints. β and ln K come from the
    closed-form log-log OLS over the ≤8-point table; all counts integer,
    so the logs are cross-engine exact."""
    d = table(spark, sf, "documents")
    firsts = (
        d.select(
            "doc_id",
            F.explode(
                F.filter(F.split("text", " "), lambda w: w != F.lit(""))
            ).alias("w"),
        )
        .groupBy("w")
        .agg(F.min("doc_id").alias("fd"))
    )
    top = d.agg((F.max("doc_id") + 1).alias("nd"))
    cps = top.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.lit(8)),
                lambda i: F.floor(F.col("nd") * i / 8),
            )
        ).alias("n")
    )
    v = (
        cps.join(firsts, firsts.fd < cps.n)
        .groupBy("n")
        .agg(F.count("*").alias("v"))
    )
    # each TERM is quantized to DECIMAL(28,20) before SUM (and the sums
    # cast back to double for the closed form): the 8-term double sums
    # were partition-order dependent, which intermittently flipped the
    # 6-dp/4-dp output rounds vs the oracle (observed once in the r9
    # full-registry sweep). Decimal addition is exact and
    # order-independent; the 1e-20 quantization is far below double
    # resolution at these magnitudes, so both engines now compute
    # identical doubles deterministically (the repo's standard
    # order-independence convention, cf. q_huber_location).
    dec = "decimal(28,20)"
    m = v.agg(
        F.count("*").alias("np"),
        F.sum(F.log("n").cast(dec)).cast("double").alias("sx"),
        F.sum(F.log("v").cast(dec)).cast("double").alias("sy"),
        F.sum((F.log("n") * F.log("n")).cast(dec)).cast("double").alias("sxx"),
        F.sum((F.log("n") * F.log("v")).cast(dec)).cast("double").alias("sxy"),
    )
    beta = (F.col("np") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("np") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    lnk = (F.col("sy") - beta * F.col("sx")) / F.col("np")
    return m.select(
        F.col("np").cast("long").alias("n_checkpoints"),
        # + 0.0 normalizes IEEE negative zero (a degenerate flat-vocab
        # corpus makes beta an exact 0 whose sign differs by engine);
        # exact no-op for every nonzero value
        (F.round(beta, 6) + F.lit(0.0)).alias("heaps_beta"),
        F.round(F.exp(lnk), 4).alias("heaps_k"),
    )


ORACLES["heaps_law_fit"] = """
    WITH firsts AS (
        SELECT w, MIN(doc_id) AS fd FROM (
            SELECT doc_id, UNNEST(LIST_FILTER(STRING_SPLIT(text, ' '),
                                              x -> x <> '')) AS w
            FROM documents
        ) GROUP BY w
    ), top AS (SELECT MAX(doc_id) + 1 AS nd FROM documents),
    cps AS (
        SELECT CAST(FLOOR(nd * i / 8.0) AS BIGINT) AS n
        FROM top, UNNEST(GENERATE_SERIES(1, 8)) t(i)
    ), v AS (
        SELECT n, COUNT(*) AS v
        FROM cps JOIN firsts ON firsts.fd < cps.n
        GROUP BY n
    ), m AS (
        SELECT COUNT(*) AS np,
               CAST(SUM(CAST(LN(n) AS DECIMAL(28,20))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(LN(v) AS DECIMAL(28,20))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(LN(n) * LN(n) AS DECIMAL(28,20))) AS DOUBLE)
                   AS sxx,
               CAST(SUM(CAST(LN(n) * LN(v) AS DECIMAL(28,20))) AS DOUBLE)
                   AS sxy
        FROM v
    )
    SELECT CAST(np AS BIGINT) AS n_checkpoints,
           ROUND((np * sxy - sx * sy) / (np * sxx - sx * sx), 6) + 0.0
               AS heaps_beta,
           ROUND(EXP((sy - ((np * sxy - sx * sy) / (np * sxx - sx * sx))
                      * sx) / np), 4) AS heaps_k
    FROM m
"""
QUERIES["heaps_law_fit"] = q_heaps_law_fit
