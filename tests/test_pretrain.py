"""Crafted-input tests for the pretraining-corpus operators
(operators/pretrain.py): sequence packing, PII scan/redaction, and
bigram-LM scoring — plus the anchor-bucket semantic-dedup composition.

The corpus-level queries are value-checked against DuckDB oracles
(analytics/pretrain_q.py via tools/check_correctness.py); these tests pin
the operator semantics on inputs the synthetic corpus can't produce —
actual PII strings, exact bin boundaries, hand-computed NLL.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vptstools_spark.operators.pretrain import (
    bigram_nll,
    doc_bigrams,
    pack_bins,
    pii_counts,
    redact_pii,
)


@pytest.fixture(scope="module")
def pii_df(spark):
    rows = [
        (0, "contact me at alice.smith+work@example.co.uk for details"),
        (1, "server at 10.0.255.7 rebooted and 192.168.1.1 is the gateway"),
        (2, "call 555-867-5309 or 555 123 4567 today"),
        (3, "no pii here just words and word2 tokens"),
        (4, "mixed: bob@test.io from 127.0.0.1 dialed 800-555-1212"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_counts_per_class(pii_df):
    c = pii_counts(F.col("text"))
    got = {
        r["doc_id"]: (r["e"], r["i"], r["p"])
        for r in pii_df.select(
            "doc_id",
            c["email"].alias("e"),
            c["ipv4"].alias("i"),
            c["phone"].alias("p"),
        ).collect()
    }
    assert got[0] == (1, 0, 0)
    assert got[1] == (0, 2, 0)
    assert got[2] == (0, 0, 2)  # both dash and space separators
    assert got[3] == (0, 0, 0)
    assert got[4] == (1, 1, 1)


def test_redact_replaces_every_match(pii_df):
    red = {
        r["doc_id"]: r["red"]
        for r in pii_df.select("doc_id", redact_pii(F.col("text")).alias("red")).collect()
    }
    assert red[0] == "contact me at [EMAIL] for details"
    assert red[1] == "server at [IPV4] rebooted and [IPV4] is the gateway"
    assert red[2] == "call [PHONE] or [PHONE] today"
    assert red[3] == "no pii here just words and word2 tokens"
    assert red[4] == "mixed: [EMAIL] from [IPV4] dialed [PHONE]"


def test_pack_bins_boundaries(spark):
    # budget 10, one shard: docs of 4+4+4 tokens -> third doc STARTS at
    # offset 8 < 10 so it stays in bin 0 (straddles); doc 3 starts at 12.
    rows = [("s", 0, 4), ("s", 1, 4), ("s", 2, 4), ("s", 3, 6), ("s", 4, 10)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tok int")
    got = {
        r["doc_id"]: (r["bin"], r["cum_tokens"])
        for r in pack_bins(df, budget=10).collect()
    }
    assert got[0] == (0, 4)
    assert got[1] == (0, 8)
    assert got[2] == (0, 12)  # starts at 8 -> bin 0
    assert got[3] == (1, 18)  # starts at 12 -> bin 1
    assert got[4] == (1, 28)  # starts at 18 -> bin 1


def test_pack_bins_shards_are_independent(spark):
    rows = [("a", 0, 7), ("b", 0, 7), ("a", 1, 7), ("b", 1, 7)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tok int")
    got = {
        (r["source"], r["doc_id"]): r["bin"]
        for r in pack_bins(df, budget=8).collect()
    }
    # each shard restarts at offset 0: second doc starts at 7 < 8 -> bin 0
    assert got[("a", 0)] == 0 and got[("a", 1)] == 0
    assert got[("b", 0)] == 0 and got[("b", 1)] == 0


def test_bigram_nll_hand_computed(spark):
    # corpus: "x y x y" (bigrams: x y, y x, x y) and "x z" (bigram: x z)
    # c1(x)=3, c1(y)=1; c2(x y)=2, c2(y x)=1, c2(x z)=1
    # doc 0 nll = -(ln(2/3) + ln(1/1) + ln(2/3)) / 3
    df = spark.createDataFrame(
        [(0, "x y x y"), (1, "x z")], "doc_id long, text string"
    )
    bg = doc_bigrams(df)
    got = {r["doc_id"]: r for r in bigram_nll(bg, bg).collect()}
    assert got[0]["n_bigrams"] == 3
    expect0 = -(math.log(2 / 3) + math.log(1.0) + math.log(2 / 3)) / 3
    assert got[0]["avg_nll"] == pytest.approx(round(expect0, 4))
    # doc 1: single bigram "x z": -ln(1/3)
    assert got[1]["n_bigrams"] == 1
    assert got[1]["avg_nll"] == pytest.approx(round(-math.log(1 / 3), 4))


def test_semantic_dedup_drops_identical_vector(spark):
    # two identical vectors land in the same anchor bucket with cosine 1.0;
    # the higher vec_id is the removed one
    from vptstools_spark.operators.similarity import anchor_buckets, cosine

    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [1.0, 0.0]),  # exact dup of 0
        (3, [-1.0, -0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    anchors = [[1.0, 0.0], [0.0, 1.0]]
    bk = anchor_buckets(df, anchors)
    v = df.join(bk, df["vec_id"] == bk["id"]).drop("id")
    a = v.select(F.col("bucket"), F.col("vec_id").alias("va"), F.col("embedding").alias("ea"))
    b = v.select(F.col("bucket"), F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"))
    pairs = (
        a.join(b, "bucket")
        .filter(F.col("va") < F.col("vb"))
        .withColumn("cos", cosine(F.col("ea").cast("array<double>"), F.col("eb").cast("array<double>")))
    )
    hot = pairs.filter(F.col("cos") >= 0.99).collect()
    assert [(r["va"], r["vb"]) for r in hot] == [(0, 2)]


def test_chunk_documents_geometry_and_overlap(spark):
    from vptstools_spark.operators.pretrain import chunk_documents

    docs = spark.createDataFrame(
        [(1, "a" * 450), (2, "xy"), (3, "")], "doc_id long, text string"
    )
    out = chunk_documents(docs, chunk_size=200, stride=150).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 450 chars, stride 150 -> starts 1,151,301; last chunk truncated to 150
    starts = sorted(r.chunk_start for r in by_doc[1])
    assert starts == [1, 151, 301]
    lens = [len(r.chunk_text) for r in sorted(by_doc[1], key=lambda r: r.chunk_id)]
    assert lens == [200, 200, 150]
    # consecutive chunks overlap by chunk_size - stride = 50
    c0, c1 = (
        r.chunk_text
        for r in sorted(by_doc[1], key=lambda r: r.chunk_id)[:2]
    )
    assert c0[150:] == c1[:50]
    # short and empty docs produce exactly one chunk
    assert [r.chunk_text for r in by_doc[2]] == ["xy"]
    assert [r.chunk_text for r in by_doc[3]] == [""]


def test_chunk_documents_rejects_bad_params(spark):
    import pytest

    from vptstools_spark.operators.pretrain import chunk_documents

    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_size=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, stride=0)


def test_write_training_shards_deterministic_and_manifested(spark, tmp_path):
    import json

    from vptstools_spark.operators.pretrain import write_training_shards

    docs = spark.createDataFrame(
        [(i, " ".join(["tok"] * (i % 7 + 1))) for i in range(200)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "shards")
    m1 = write_training_shards(docs, path, n_shards=4)
    assert m1["total_docs"] == 200
    assert m1["total_tokens"] == sum(i % 7 + 1 for i in range(200))
    assert set(m1["shards"]) == {0, 1, 2, 3}
    # every shard directory exists and rereads cleanly
    back = spark.read.parquet(path)
    assert back.count() == 200
    got = {r["shard"] for r in back.select("shard").distinct().collect()}
    assert got == {0, 1, 2, 3}
    # determinism: same corpus in a different input order → same assignment
    m2 = write_training_shards(
        docs.orderBy(__import__("pyspark.sql.functions", fromlist=["f"]).col("doc_id").desc()),
        str(tmp_path / "shards2"),
        n_shards=4,
    )
    assert m1["shards"] == m2["shards"]
    # manifest on disk matches the returned one
    disk = json.load(open(path + "/_manifest.json"))
    assert disk["total_tokens"] == m1["total_tokens"]


def test_temperature_weights_flatten_head(spark):
    from pyspark.sql import functions as F

    from vptstools_spark.operators.pretrain import temperature_weights

    rows = [("big", i) for i in range(90)] + [("small", i) for i in range(10)]
    df = spark.createDataFrame(rows, "source string, doc_id long")
    w = {r["source"]: r for r in temperature_weights(df, alpha=0.5).collect()}
    # alpha=0.5: shares ∝ sqrt(n) → 0.75 / 0.25 instead of 0.9 / 0.1
    assert abs(w["big"]["p_source"] - 0.75) < 1e-9
    assert abs(w["small"]["p_source"] - 0.25) < 1e-9
    # per-doc weight is higher for the tail source
    assert w["small"]["w_doc"] > w["big"]["w_doc"]
    # shares always sum to 1
    assert abs(w["big"]["p_source"] + w["small"]["p_source"] - 1.0) < 1e-12


def test_materialize_mixture_deterministic_and_upsamples(spark):
    from vptstools_spark.operators.pretrain import materialize_mixture

    # head source: 9000 docs; tail source: 16 docs — sqrt temperature
    # gives the tail ~4.5% of a 2000-doc mix (90 instances), forcing
    # multi-epoch upsampling of the 16 docs
    head = spark.range(0, 9000).selectExpr("'head' AS source", "id AS doc_id")
    tail = spark.range(100000, 100016).selectExpr(
        "'tail' AS source", "id AS doc_id"
    )
    d = head.unionByName(tail)
    a = materialize_mixture(d, total_docs=2000)
    b = materialize_mixture(d.repartition(13), total_docs=2000)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    census = {
        r["source"]: r
        for r in a.groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.count_distinct("doc_id").alias("u"),
            F.max("copy_i").alias("mc"),
        )
        .collect()
    }
    assert census["tail"]["n"] > 16  # quota above one epoch
    assert census["tail"]["u"] == 16  # every tail doc participates
    assert census["tail"]["mc"] >= 2  # real epoch copies drawn
    assert census["head"]["mc"] == 1  # head never upsampled
    total = census["head"]["n"] + census["tail"]["n"]
    assert abs(total - 2000) <= 2  # floor rounding only
