"""Entity resolution (operators/entity.py): blocking recall limits, edit
verification, transitive closure, canonicalization."""

from pyspark.sql import functions as F

from vptstools_spark.operators.entity import (
    candidate_pairs,
    entity_profile,
    resolve_entities,
)


def _records(spark, rows):
    return spark.createDataFrame(rows, "id long, name string")


def BLOCK():
    # built lazily: Column construction needs an active SparkContext,
    # which doesn't exist at collection time
    return F.substring("name", 1, 3)


def test_transitive_chain_resolves_to_one_entity(spark):
    # acme ~ acmes ~ acmess: consecutive pairs are 1 edit apart, the ends
    # are 2 apart — transitive closure must still unify the chain
    df = _records(spark, [(1, "acme"), (2, "acmes"), (3, "acmess"), (4, "zzz")])
    out = {r["id"]: r["entity_id"] for r in resolve_entities(df, "id", "name", BLOCK(), 1).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 4}


def test_blocking_limits_candidates(spark):
    # 'bolt' vs 'colt' are 1 edit apart but block apart (first-3 differ):
    # blocking trades that recall for never running all-pairs
    df = _records(spark, [(1, "bolt"), (2, "colt")])
    assert candidate_pairs(df, "id", "name", BLOCK(), 1).count() == 0


def test_edit_budget_is_enforced(spark):
    df = _records(spark, [(1, "gadget"), (2, "gadgets"), (3, "gadzooks")])
    pairs = {(r["id_a"], r["id_b"]) for r in candidate_pairs(df, "id", "name", BLOCK(), 1).collect()}
    assert pairs == {(1, 2)}  # gadzooks is >1 edit from both


def test_profile_canonical_name_is_min_id_record(spark):
    df = _records(spark, [(5, "acme inc"), (2, "acme ink"), (9, "acme inc")])
    resolved = resolve_entities(df, "id", "name", BLOCK(), 1)
    prof = entity_profile(resolved, "id", "name").collect()
    assert len(prof) == 1
    row = prof[0]
    assert row["entity_id"] == 2
    assert row["n_records"] == 3 and row["n_names"] == 2
    assert row["canonical_name"] == "acme ink"  # record 2's surface form
