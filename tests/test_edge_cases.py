"""Empty/degenerate-input behavior of the round-3 operators: a 100 TB
pipeline hits the empty partition, the empty day, the all-filtered batch —
operators must return empty/identity results, not throw."""

from pyspark.sql import functions as F


def _empty(spark, schema):
    return spark.createDataFrame([], schema)


def test_sketches_on_empty_input(spark):
    from vptstools_spark.operators import sketch

    e = _empty(spark, "k int")
    assert sketch.hll_registers(e, F.col("k"), []).count() == 0
    # global estimate over an empty register table: ONE row (Spark global
    # aggregate semantics) whose linear-counting estimate is exactly 0
    est = sketch.hll_estimate(sketch.hll_registers(e, F.col("k"), []), []).collect()
    assert len(est) == 1
    assert est[0]["hll_est"] == 0.0 and est[0]["zero_registers"] == 256
    assert sketch.cm_sketch(e, F.col("k")).count() == 0
    # empty dim → all-zero bloom mask that admits nothing
    mask = sketch.bloom_build(e, F.col("k"))
    probe = spark.createDataFrame([(1,), (2,)], "k int")
    assert probe.filter(sketch.bloom_might_contain(F.col("k"), mask)).count() == 0


def test_quality_suite_on_empty_frame(spark):
    from vptstools_spark.operators import quality

    e = _empty(spark, "id int, s string")
    rows = {
        r["check"]: (r["metric"], r["passed"])
        for r in quality.run_suite(
            e,
            [
                quality.row_count("rows", lo=1),
                quality.completeness("c", "s"),
            ],
        ).collect()
    }
    assert rows["rows"] == (0.0, False)
    # 0/0 completeness is a null metric → fails closed, renders as null
    assert rows["c"][1] is False


def test_curate_empty_corpus(spark):
    from vptstools_spark.operators.curate import CurationConfig, curate_corpus

    e = _empty(spark, "doc_id long, text string")
    clean, report = curate_corpus(e, CurationConfig())
    assert clean.count() == 0
    rows = report.orderBy("stage_ord").collect()
    assert [r["n_docs"] for r in rows] == [0, 0, 0, 0, 0]
    assert all(r["n_dropped"] == 0 for r in rows)


def test_graph_ops_on_empty_edges(spark):
    from vptstools_spark.operators.graph import (
        bounded_reachability,
        label_propagation,
        triangle_count,
    )

    e = _empty(spark, "src int, dst int")
    assert triangle_count(e).count() == 0
    assert label_propagation(e, iters=2).count() == 0
    seeds = spark.createDataFrame([(7,)], "node int")
    got = bounded_reachability(e, seeds, depth=3).collect()
    assert [(r["node"], r["hops"]) for r in got] == [(7, 0)]


def test_scd2_empty_log(spark):
    from vptstools_spark.operators.scd import scd2_from_log

    e = _empty(spark, "k int, a string, ts timestamp, id long")
    assert scd2_from_log(e, "k", "a", "ts", ["id"]).count() == 0


def test_entity_resolution_empty_and_singleton(spark):
    from vptstools_spark.operators.entity import entity_profile, resolve_entities

    e = _empty(spark, "id long, name string")
    block = F.substring("name", 1, 3)
    assert resolve_entities(e, "id", "name", block).count() == 0
    one = spark.createDataFrame([(42, "solo")], "id long, name string")
    resolved = resolve_entities(one, "id", "name", block)
    assert resolved.collect()[0]["entity_id"] == 42
    prof = entity_profile(resolved, "id", "name").collect()[0]
    assert prof["n_records"] == 1 and prof["canonical_name"] == "solo"


def test_bpe_empty_vocab(spark):
    from vptstools_spark.operators.bpe import bpe_train

    e = _empty(spark, "word string, freq bigint")
    merges, seg = bpe_train(e, iters=3)
    assert merges == [] and seg.count() == 0


def test_hits_empty_edges(spark):
    from vptstools_spark.operators.graph import hits

    edges = spark.createDataFrame([], "src string, dst string, w double")
    assert hits(edges, iters=2, weight_col="w").collect() == []


def test_proximity_join_no_pairs(spark):
    from vptstools_spark.operators.spatial import proximity_join

    a = spark.createDataFrame([(1, 0.0, 0.0)], "id long, lat double, lon double")
    b = spark.createDataFrame([(2, 50.0, 50.0)], "id long, lat double, lon double")
    assert proximity_join(a, b, 10.0).collect() == []


def test_covariance_empty_vectors(spark):
    from vptstools_spark.operators.linalg import covariance_matrix

    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert covariance_matrix(df, "embedding").collect() == []


def test_nb_empty_test_split(spark):
    from vptstools_spark.analytics.mlprep_q import nb_train_score

    rows = [(i, "en", "a b c") for i in range(1, 5)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    empty = df.filter("doc_id < 0")
    assert nb_train_score(df, empty).collect() == []
