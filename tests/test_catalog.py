"""Cross-table transactional catalog (plans/catalog.py)."""

import pytest

from vptstools_spark.plans.catalog import (
    catalog_add_table,
    catalog_commit,
    catalog_init,
    catalog_pins,
    pinned_table_versions,
    read_catalog_table,
    register_catalog,
)
from vptstools_spark.plans.timetravel import (
    CommitConflictError,
    commit_append,
    commit_initial,
)


def _mk(spark, rows, schema="k int, v double"):
    return spark.createDataFrame(rows, schema)


@pytest.fixture()
def warehouse(spark, tmp_path):
    orders = str(tmp_path / "orders")
    rollup = str(tmp_path / "rollup")
    commit_initial(_mk(spark, [(1, 10.0), (2, 20.0)]), orders)
    commit_initial(_mk(spark, [(0, 30.0)], "grp int, total double"), rollup)
    cat = str(tmp_path / "cat")
    catalog_init(spark, cat, {"orders": (orders, 0), "rollup": (rollup, 0)})
    return cat, orders, rollup


def test_staged_versions_invisible_until_catalog_commit(spark, warehouse):
    cat, orders, rollup = warehouse
    # stage new versions in BOTH table logs — catalog still serves v0s
    commit_append(spark, orders, _mk(spark, [(3, 30.0)]))
    commit_append(spark, rollup, _mk(spark, [(1, 30.0)], "grp int, total double"))
    assert read_catalog_table(spark, cat, "orders").count() == 2
    assert read_catalog_table(spark, cat, "rollup").count() == 1

    # one atomic swap exposes both together
    v = catalog_commit(spark, cat, {"orders": 1, "rollup": 1})
    assert read_catalog_table(spark, cat, "orders", v).count() == 3
    assert read_catalog_table(spark, cat, "rollup", v).count() == 2
    # the old catalog version is still a consistent snapshot
    assert read_catalog_table(spark, cat, "orders", 0).count() == 2


def test_catalog_commit_guards(spark, warehouse):
    cat, orders, _rollup = warehouse
    with pytest.raises(ValueError):  # version not committed in table log
        catalog_commit(spark, cat, {"orders": 9})
    with pytest.raises(ValueError):  # unknown table
        catalog_commit(spark, cat, {"nope": 0})
    commit_append(spark, orders, _mk(spark, [(3, 30.0)]))
    with pytest.raises(CommitConflictError):  # stale expected_version
        catalog_commit(spark, cat, {"orders": 1}, expected_version=7)
    v = catalog_commit(spark, cat, {"orders": 1}, expected_version=0)
    assert v == 1
    assert catalog_pins(spark, cat)["orders"][1] == 1


def test_add_table_retention_and_sql_face(spark, warehouse, tmp_path):
    cat, orders, rollup = warehouse
    extra = str(tmp_path / "extra")
    commit_initial(_mk(spark, [(9, 9.0)]), extra)
    catalog_add_table(spark, cat, "extra", extra, 0)
    commit_append(spark, orders, _mk(spark, [(3, 30.0)]))
    catalog_commit(spark, cat, {"orders": 1})

    pinned = pinned_table_versions(spark, cat)
    assert pinned[orders] == {0, 1}  # both catalog commits' pins survive
    assert pinned[rollup] == {0}
    assert pinned[extra] == {0}

    views = register_catalog(spark, cat)
    assert views == ["extra", "orders", "rollup"]
    assert spark.sql("SELECT count(*) n FROM orders").collect()[0]["n"] == 3
    # pinned view of the PREVIOUS catalog version is the old warehouse
    register_catalog(spark, cat, 1)
    assert spark.sql("SELECT count(*) n FROM orders").collect()[0]["n"] == 2


def test_catalog_publish_stream_sink_multi_table_exactly_once(spark, tmp_path):
    """Stream → fact commits + derived rollup recompute + ONE catalog
    swap per batch; catalog readers always see fact and rollup from the
    same batch; quiet re-run changes nothing."""
    from pyspark.sql import functions as F

    from vptstools_spark.streaming.incremental import catalog_publish_stream_sink
    from vptstools_spark.plans.timetravel import history

    src = str(tmp_path / "src")
    fact = str(tmp_path / "fact")
    roll = str(tmp_path / "roll")
    cat = str(tmp_path / "cat")
    ckpt = str(tmp_path / "ckpt")
    schema = "k long, grp string, v double"

    def totals(snapshot):
        return snapshot.groupBy("grp").agg(
            F.sum("v").alias("total"), F.count("*").alias("n")
        )

    def run():
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(src)
        catalog_publish_stream_sink(
            stream, cat, fact, ckpt, keys=["k"],
            derived={"rollup": (roll, totals)},
        ).awaitTermination()

    spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], schema).write.mode(
        "append"
    ).parquet(src)
    run()
    pins1 = __import__(
        "vptstools_spark.plans.catalog", fromlist=["catalog_pins"]
    ).catalog_pins(spark, cat)
    f1 = read_catalog_table(spark, cat, "fact")
    r1 = read_catalog_table(spark, cat, "rollup")
    assert sorted((r["grp"], r["total"]) for r in r1.collect()) == [
        ("a", 1.0), ("b", 2.0),
    ]
    assert f1.count() == 2

    # second wave: update k=1, insert k=3 (both in group a)
    spark.createDataFrame([(1, "a", 5.0), (3, "a", 3.0)], schema).write.mode(
        "append"
    ).parquet(src)
    run()
    r2 = read_catalog_table(spark, cat, "rollup")
    assert sorted((r["grp"], r["total"], r["n"]) for r in r2.collect()) == [
        ("a", 8.0, 2), ("b", 2.0, 1),
    ]
    # cross-table consistency at EVERY catalog version: the pinned rollup
    # always equals totals() of the SAME version's pinned fact — the
    # property per-table logs alone cannot give a reader
    from vptstools_spark.plans.catalog import _cat_versions

    for cv in _cat_versions(spark, cat):
        fact_cv = read_catalog_table(spark, cat, "fact", cv)
        roll_cv = read_catalog_table(spark, cat, "rollup", cv)
        assert sorted(map(tuple, roll_cv.collect())) == sorted(
            map(tuple, totals(fact_cv).collect())
        ), cv

    # quiet re-run: no new versions anywhere
    nf, nr = len(history(spark, fact)), len(history(spark, roll))
    nc = len(_cat_versions(spark, cat))
    run()
    assert len(history(spark, fact)) == nf
    assert len(history(spark, roll)) == nr
    assert len(_cat_versions(spark, cat)) == nc


def test_catalog_publish_replay_recomputes_lagging_derived(spark, tmp_path):
    """Crash window: fact committed for a batch, derived NOT, catalog
    stale. The replayed batch must recompute the lagging derived table
    from this batch's fact snapshot BEFORE the catalog swap — guarding
    on the fact alone would pin new-fact with stale-rollup (ADVICE r5)."""
    from pyspark.sql import functions as F

    from vptstools_spark.plans.catalog import _cat_versions
    from vptstools_spark.plans.timetravel import commit_upsert, history
    from vptstools_spark.streaming.incremental import catalog_publish_stream_sink

    src = str(tmp_path / "src")
    fact = str(tmp_path / "fact")
    roll = str(tmp_path / "roll")
    cat = str(tmp_path / "cat")
    ckpt = str(tmp_path / "ckpt")
    schema = "k long, grp string, v double"

    def totals(snapshot):
        return snapshot.groupBy("grp").agg(
            F.sum("v").alias("total"), F.count("*").alias("n")
        )

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        catalog_publish_stream_sink(
            stream, cat, fact, ckpt, keys=["k"],
            derived={"rollup": (roll, totals)},
        ).awaitTermination()

    spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], schema).write.mode(
        "append"
    ).parquet(src)
    run()

    # Simulate the crash state for the NEXT batch: the fact upsert
    # landed (with its batch_id guard) but the derived recompute and
    # catalog swap never ran.
    wave2 = spark.createDataFrame([(1, "a", 5.0), (3, "a", 3.0)], schema)
    wave2.write.mode("append").parquet(src)
    commit_upsert(spark, fact, wave2, keys=["k"], extra={"batch_id": 1})
    n_fact = len(history(spark, fact))

    run()  # the replay

    assert len(history(spark, fact)) == n_fact  # fact commit NOT repeated
    r = read_catalog_table(spark, cat, "rollup")
    assert sorted((x["grp"], x["total"], x["n"]) for x in r.collect()) == [
        ("a", 8.0, 2), ("b", 2.0, 1),
    ]
    # every catalog version stays internally consistent
    for cv in _cat_versions(spark, cat):
        fact_cv = read_catalog_table(spark, cat, "fact", cv)
        roll_cv = read_catalog_table(spark, cat, "rollup", cv)
        assert sorted(map(tuple, roll_cv.collect())) == sorted(
            map(tuple, totals(fact_cv).collect())
        ), cv
