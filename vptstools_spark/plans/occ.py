"""Optimistic concurrency with LOGICAL conflict detection and rebase —
the Delta-style conflict matrix over `plans/timetravel.py`'s commit log.

The base layer's contract is physical: two writers racing to one version
number produce one winner and one `CommitConflictError`, even when their
changes are disjoint (two appends, an append racing a compaction). At
100 TB with simultaneous ingest, compaction and GDPR deletes on one
table, no-retry OCC is an operational wall: every maintenance pass fails
some ingest batch. This module adds what Delta's commit protocol layers
on top (public docs: "Concurrency control" conflict matrix; Iceberg's
commit retry semantics are the same shape): each transaction PREPARES
its artifacts once against a base snapshot (data files, delete vectors —
written under collision-free dir labels), then PUBLISHES in a loop — on
losing the physical race it reads the interleaved commits, checks its
read/write sets against what actually changed, and REBASES (republishes
the same artifacts against the new head) when the sets are disjoint.
Genuinely conflicting interleavings RE-DERIVE (re-prepare against the
new head — always correct, costs one more pass) or raise
`ConcurrentTransactionError` where re-derivation cannot be correct
(schema/spec changed under a prepared write).

Read/write sets per op, and what each rebase checks:

- `append_atomic` — write-set: its new files. Rebases over every winner
  that neither changed the schema/partition spec nor could invalidate a
  constraint probe; winners that added rows/rules under table
  constraints re-run enforcement against the head before publishing.
  Appends commute: any serial order yields the same table.
- `delete_where_atomic` — write-set: position vectors referencing
  base-version files. Rebases over ADDITIVE winners (append / MOR
  delete / update / MOR upsert add artifacts, remove nothing) because
  every referenced file provably survives; Delta WriteSerializable
  semantics — rows a winner appended that match the predicate STAY (the
  delete serializes before the append). Winners that removed/rewrote
  files (compact, purge, COW) would orphan the vectors → re-derive.
- `upsert_mor_atomic` — write-set: new files + vectors for `keys`.
  Rebases over additive winners ONLY when the winners' new data files
  contain none of the loser's keys (checked by scanning just those
  files — O(interleaved delta), never the table); an overlap means the
  prepared vectors miss rows that must be replaced → re-derive.
- `compact_atomic` — write-set: the victim files it rewrites. Rebases
  over additive winners whose new vectors hit no victim (such a vector's
  target would vanish in the rewrite and its deletes resurrect) → else
  re-derives. Maintenance never clobbers ingest; ingest never waits.

Every rebased commit records `{"txn": {"base_version", "rebased_over"}}`
so history shows which commits were replayed and across what.

Reference semantics matched: Delta Lake's documented conflict matrix
(Append vs Append never conflicts; anything vs a metadata change
conflicts; WriteSerializable orders deletes before concurrent appends).
The reference repo (aloftdata/vptstools) has no concurrency story — a
single pandas process; this subsystem exists for the 100 TB target.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from vptstools_spark.plans.skipping import list_data_files
from vptstools_spark.plans.timetravel import (
    _DATA_DIR,
    _DV_FILE,
    _DV_POS,
    _carry,
    _commit,
    _enforce,
    _list_versions,
    _read_commit,
    _read_snapshot,
    _resolve_version,
    _write_snapshot_files,
    CommitConflictError,
    clear_write_intent,
    read_version,
    register_write_intent,
)


class _Intents:
    """Write-intent registrations for one transaction: every dir label
    this transaction will write under is declared to `vacuum_table`
    BEFORE the first file lands (timetravel.register_write_intent), and
    ALL labels are cleared in the caller's finally — success publishes a
    commit that references the files (vacuum-safe forever), failure
    makes them reclaimable the moment the intent drops. This closes the
    prepare→publish window the age gate only narrows: an OCC rebase loop
    can hold prepared-but-unpublished files across arbitrary wall-clock
    time (constraint re-enforcement, repeated lost races), so a vacuum
    with ANY min_age could otherwise reap a live writer's artifacts."""

    def __init__(self, spark: SparkSession, path: str):
        self._spark, self._path, self._labels = spark, path, []

    def register(self, label: str) -> str:
        register_write_intent(self._spark, self._path, label)
        self._labels.append(label)
        return label

    def clear_all(self) -> None:
        for label in self._labels:
            try:
                clear_write_intent(self._spark, self._path, label)
            except Exception:
                pass  # a leftover intent is safe (cleaned by operator)


class ConcurrentTransactionError(CommitConflictError):
    """The interleaved commits LOGICALLY conflict with this transaction
    (not just a version-number race) and re-derivation cannot be
    correct: the table's schema or partition spec changed under the
    prepared write."""


#: artifact-additive ops: add files/vectors/equality entries, remove
#: nothing — every pre-existing file and vector survives them
_ADDITIVE_OPS = {"append", "delete", "update", "upsert_mor", "delete_eq"}
#: metadata loosening: can never invalidate a prepared write
_SAFE_METADATA_OPS = {"drop_constraints"}
#: row-preserving rewrites: remove files but never change row content
_REWRITE_OPS = {"purge_deletes", "compact", "cluster"}


def _interleaved(
    spark: SparkSession, path: str, base_v: int, head_v: int
) -> list[dict]:
    """The winners' commits in (base_v, head_v]. Raises the history-gap
    contract error if expiry removed part of the range."""
    have = {
        v: None for v in _list_versions(spark, path) if base_v < v <= head_v
    }
    missing = [v for v in range(base_v + 1, head_v + 1) if v not in have]
    if missing:
        raise ConcurrentTransactionError(
            f"cannot rebase across expired history of {path}: versions "
            f"{missing} are gone; re-prepare against the head"
        )
    return [
        _read_commit(spark, path, v) for v in range(base_v + 1, head_v + 1)
    ]


def _is_additive(commit: dict) -> bool:
    op = commit["op"]
    return op in _ADDITIVE_OPS or op in _SAFE_METADATA_OPS


def _new_dvs(base: dict, head_chain: list[dict]) -> list[str]:
    """Delete-vector files the interleaved commits introduced."""
    base_dvs = set(base.get("delete_files") or [])
    out: list[str] = []
    for c in head_chain:
        for f in c.get("delete_files") or []:
            if f not in base_dvs and f not in out:
                out.append(f)
    return out


def _dv_targets(spark: SparkSession, path: str, dv_rels: list[str]) -> set[str]:
    """Distinct data files a set of delete-vector parquets reference —
    vectors are broadcast-small by table contract, so this is a
    metadata-scale read."""
    if not dv_rels:
        return set()
    df = spark.read.parquet(
        *[os.path.join(path, _DATA_DIR, f) for f in dv_rels]
    )
    return {r["file"] for r in df.select("file").distinct().collect()}


def _txn_extra(base_v: int, head_v: int) -> dict:
    if head_v == base_v:
        return {}
    return {
        "txn": {
            "base_version": base_v,
            "rebased_over": list(range(base_v + 1, head_v + 1)),
        }
    }


def _write_dv(
    spark: SparkSession, path: str, hits: DataFrame, label: str
) -> list[str]:
    """Write (file, pos) vector rows under a unique dv dir; return the
    rels. Unique labels are what let concurrent deleters prepare without
    colliding on a shared `dv{n}` directory."""
    dv_dir = os.path.join(path, _DATA_DIR, label)
    hits.write.mode("error").parquet(dv_dir)
    marker = f"{_DATA_DIR}/{label}/"
    return sorted(
        f[f.index(marker) + len(_DATA_DIR) + 1 :]
        for f in list_data_files(spark, dv_dir)
    )


def append_atomic(
    spark: SparkSession, path: str, df: DataFrame, max_retries: int = 5
) -> int:
    """APPEND with rebase: data files are written ONCE against the base
    snapshot; losing the commit race re-checks the interleaved commits
    and republishes the SAME files against the new head — never a
    rewrite. Two appenders, or an appender racing a compaction, all
    succeed, and the result equals some serial order of the commits
    (appends commute; a compaction never sees files that don't exist
    yet). Raises `ConcurrentTransactionError` when a winner changed the
    schema or partition spec (rename/evolve/overwrite/restore/COW
    upsert), `ConstraintViolationError` when re-enforcement against the
    new head fails. Returns the committed version."""
    base_v = _resolve_version(spark, path, None)
    base = _read_commit(spark, path, base_v)
    cur_schema = {
        f.name: f.dataType.simpleString()
        for f in read_version(spark, path, base_v).schema.fields
    }
    new_schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    if cur_schema != new_schema:
        raise ValueError(
            f"append schema {sorted(new_schema.items())} does not match "
            f"table schema {sorted(cur_schema.items())}"
        )
    _enforce(df, base, "append", table=read_version(spark, path, base_v))
    pcols = base["partition_cols"]
    intents = _Intents(spark, path)
    try:
        label = intents.register(f"v{base_v + 1}-t{uuid.uuid4().hex[:8]}")
        rels = _write_snapshot_files(
            df, path, base_v + 1, pcols,
            vlabel=label, transforms=base.get("partition_transforms"),
        )
        for _ in range(max_retries + 1):
            head_v = _resolve_version(spark, path, None)
            head = _read_commit(spark, path, head_v)
            if head_v != base_v:
                winners = _interleaved(spark, path, base_v, head_v)
                blocked = [
                    w["op"]
                    for w in winners
                    if not _is_additive(w)
                    and w["op"] not in _REWRITE_OPS
                    and w["op"] != "set_constraints"
                ]
                if blocked:
                    raise ConcurrentTransactionError(
                        f"append prepared at version {base_v} of {path} cannot "
                        f"rebase over interleaved {blocked} commits (schema- or "
                        "snapshot-defining); re-prepare against the head"
                    )
                if (head.get("constraints") or []) and any(
                    w["op"] in ("append", "update", "upsert_mor", "set_constraints")
                    for w in winners
                ):
                    # winners added rows or rules: the uniqueness probe
                    # against the base snapshot is stale — re-enforce on head
                    _enforce(
                        df, head, "append",
                        table=read_version(spark, path, head_v),
                    )
            try:
                _commit(
                    spark,
                    path,
                    head_v + 1,
                    head["files"] + rels,
                    head["partition_cols"],
                    "append",
                    head.get("partition_types"),
                    {**_carry(head), **_txn_extra(base_v, head_v)},
                )
                return head_v + 1
            except CommitConflictError:
                continue  # physical race: loop re-reads the newer head
        raise CommitConflictError(
            f"append to {path} lost the commit race {max_retries + 1} times; "
            "table is under heavy write contention"
        )
    finally:
        intents.clear_all()


def delete_where_atomic(
    spark: SparkSession, path: str, predicate, max_retries: int = 5
) -> int:
    """Merge-on-read DELETE with rebase: the position vectors are
    computed ONCE against the base snapshot; over additive winners they
    republish as-is (every referenced file survives — WriteSerializable:
    rows a winner appended that match the predicate are NOT deleted, the
    delete serializes first). Winners that rewrote files re-derive the
    vectors against the new head. Returns the committed version."""
    cond = F.expr(predicate) if isinstance(predicate, str) else predicate

    def prepare(v: int) -> tuple[list[str], int]:
        snap = _read_snapshot(spark, path, v, with_position=True)
        hits = snap.filter(cond).select(
            F.col(_DV_FILE).alias("file"), F.col(_DV_POS).alias("pos")
        )
        label = intents.register(f"dv{v + 1}-t{uuid.uuid4().hex[:8]}")
        rels = _write_dv(spark, path, hits, label)
        n = (
            spark.read.parquet(
                *[os.path.join(path, _DATA_DIR, f) for f in rels]
            ).count()
            if rels
            else 0
        )
        return rels, n

    intents = _Intents(spark, path)
    try:
        base_v = _resolve_version(spark, path, None)
        dv_rels, n_deleted = prepare(base_v)
        for _ in range(max_retries + 1):
            head_v = _resolve_version(spark, path, None)
            head = _read_commit(spark, path, head_v)
            if head_v != base_v:
                winners = _interleaved(spark, path, base_v, head_v)
                if not all(_is_additive(w) for w in winners):
                    # a winner rewrote files: the prepared vectors may
                    # reference dropped files (their deletes would silently
                    # vanish) — re-derive against the head
                    base_v = head_v
                    dv_rels, n_deleted = prepare(base_v)
                    head = _read_commit(spark, path, head_v)
            try:
                _commit(
                    spark,
                    path,
                    head_v + 1,
                    head["files"],
                    head["partition_cols"],
                    "delete",
                    head.get("partition_types"),
                    {
                        **_carry(head),
                        "delete_files": (head.get("delete_files") or [])
                        + dv_rels,
                        "n_deleted": n_deleted,
                        **_txn_extra(base_v, head_v),
                    },
                )
                return head_v + 1
            except CommitConflictError:
                continue
        raise CommitConflictError(
            f"delete on {path} lost the commit race {max_retries + 1} times"
        )
    finally:
        intents.clear_all()


def delete_where_eq_atomic(
    spark: SparkSession,
    path: str,
    keys_df: DataFrame,
    keys: list[str],
    max_retries: int = 5,
) -> int:
    """EQUALITY delete with rebase: the key file is written once and —
    because an equality entry references NO data files, and the strict
    sequence rule scopes it to whatever files exist below its final
    commit version — it republishes over every winner that kept the key
    columns meaningful: additive commits, row-preserving rewrites
    (compaction outputs inherit the keys), even COW upserts. Only
    schema-bearing winners (rename/overwrite/restore) block, with the
    contract error."""
    bad = [k for k in keys if k not in keys_df.columns]
    if bad:
        raise ValueError(f"keys_df lacks key columns {bad}")
    base_v = _resolve_version(spark, path, None)
    intents = _Intents(spark, path)
    try:
        return _delete_where_eq_atomic_body(
            spark, path, keys_df, keys, max_retries, base_v, intents
        )
    finally:
        intents.clear_all()


def _delete_where_eq_atomic_body(
    spark, path, keys_df, keys, max_retries, base_v, intents
) -> int:
    label = intents.register(f"eq{base_v + 1}-t{uuid.uuid4().hex[:8]}")
    eq_dir = os.path.join(path, _DATA_DIR, label)
    keys_df.select(*keys).distinct().write.mode("error").parquet(eq_dir)
    marker = f"{_DATA_DIR}/{label}/"
    rels = sorted(
        f[f.index(marker) + len(_DATA_DIR) + 1 :]
        for f in list_data_files(spark, eq_dir)
    )
    _SCHEMA_BEARING = {"rename_columns", "widen_types", "overwrite", "restore"}
    for _ in range(max_retries + 1):
        head_v = _resolve_version(spark, path, None)
        head = _read_commit(spark, path, head_v)
        if head_v != base_v:
            winners = _interleaved(spark, path, base_v, head_v)
            blocked = [
                w["op"] for w in winners if w["op"] in _SCHEMA_BEARING
                or w["op"].startswith("merge(")
            ]
            if blocked:
                raise ConcurrentTransactionError(
                    f"equality delete prepared at version {base_v} of "
                    f"{path} cannot rebase over {blocked} (key columns "
                    "may have changed meaning); re-prepare against head"
                )
        new_v = head_v + 1
        try:
            _commit(
                spark,
                path,
                new_v,
                head["files"],
                head["partition_cols"],
                "delete_eq",
                head.get("partition_types"),
                {
                    **_carry(head),
                    "eq_deletes": (head.get("eq_deletes") or [])
                    + [
                        {
                            "files": rels,
                            "keys": list(keys),
                            "stored_keys": list(keys),
                            "version": new_v,
                        }
                    ],
                    "file_seqs": {
                        **{f: head_v for f in head["files"]},
                        **(head.get("file_seqs") or {}),
                    },
                    **_txn_extra(base_v, head_v),
                },
            )
            return new_v
        except CommitConflictError:
            continue
    raise CommitConflictError(
        f"equality delete on {path} lost the commit race "
        f"{max_retries + 1} times"
    )


def upsert_mor_atomic(
    spark: SparkSession,
    path: str,
    delta: DataFrame,
    keys: list[str],
    delete_col: str | None = None,
    max_retries: int = 5,
) -> int:
    """MERGE-ON-READ upsert with logical conflict detection: on losing
    the race, the loser checks whether the winners' NEW data files
    contain any of its keys (a scan of just the interleaved delta —
    O(changed data), never the table). No overlap → the prepared files
    and vectors are still a correct merge → republish against the head;
    overlap or a non-additive winner → re-prepare against the new head
    so winner rows are properly replaced. Returns the committed
    version."""
    upserts = delta.filter(~F.col(delete_col)) if delete_col else delta
    upserts = upserts.drop(*([delete_col] if delete_col else []))
    key_df = delta.select(*keys).distinct()

    def check_schema(v: int) -> dict:
        commit = _read_commit(spark, path, v)
        cur = {
            f.name: f.dataType.simpleString()
            for f in read_version(spark, path, v).schema.fields
        }
        new = {
            f.name: f.dataType.simpleString() for f in upserts.schema.fields
        }
        if cur != new:
            raise ValueError(
                f"merge-on-read upsert schema {sorted(new.items())} does "
                f"not match table schema {sorted(cur.items())}"
            )
        return commit

    def prepare(v: int) -> tuple[list[str], list[str]]:
        commit = check_schema(v)
        _enforce(
            upserts, commit, "upsert_mor",
            table=read_version(spark, path, v), replace_keys=keys,
        )
        snap = _read_snapshot(spark, path, v, with_position=True)
        hits = snap.join(F.broadcast(key_df), keys, "left_semi").select(
            F.col(_DV_FILE).alias("file"), F.col(_DV_POS).alias("pos")
        )
        token = uuid.uuid4().hex[:8]
        dv_rels = _write_dv(
            spark, path, hits, intents.register(f"dv{v + 1}-t{token}")
        )
        rels = _write_snapshot_files(
            upserts, path, v + 1, commit["partition_cols"],
            vlabel=intents.register(f"v{v + 1}-t{token}"),
            transforms=commit.get("partition_transforms"),
        )
        return rels, dv_rels

    intents = _Intents(spark, path)
    try:
        return _upsert_mor_atomic_loop(
            spark, path, keys, key_df, prepare, max_retries
        )
    finally:
        intents.clear_all()


def _upsert_mor_atomic_loop(
    spark, path, keys, key_df, prepare, max_retries
) -> int:
    base_v = _resolve_version(spark, path, None)
    rels, dv_rels = prepare(base_v)
    for _ in range(max_retries + 1):
        head_v = _resolve_version(spark, path, None)
        head = _read_commit(spark, path, head_v)
        if head_v != base_v:
            winners = _interleaved(spark, path, base_v, head_v)
            rebase_ok = all(_is_additive(w) for w in winners)
            if rebase_ok:
                base = _read_commit(spark, path, base_v)
                new_files = sorted(set(head["files"]) - set(base["files"]))
                if new_files:
                    added = spark.read.parquet(
                        *[
                            os.path.join(path, _DATA_DIR, f)
                            for f in new_files
                        ]
                    )
                    if set(keys) <= set(added.columns):
                        rebase_ok = (
                            added.join(
                                F.broadcast(key_df), keys, "left_semi"
                            )
                            .limit(1)
                            .count()
                            == 0
                        )
                    else:
                        rebase_ok = False
            if not rebase_ok:
                base_v = head_v
                rels, dv_rels = prepare(base_v)
                head = _read_commit(spark, path, head_v)
        try:
            _commit(
                spark,
                path,
                head_v + 1,
                head["files"] + rels,
                head["partition_cols"],
                "upsert_mor",
                head.get("partition_types"),
                {
                    **_carry(head),
                    "delete_files": (head.get("delete_files") or [])
                    + dv_rels,
                    **_txn_extra(base_v, head_v),
                },
            )
            return head_v + 1
        except CommitConflictError:
            continue
    raise CommitConflictError(
        f"upsert on {path} lost the commit race {max_retries + 1} times"
    )


def compact_atomic(
    spark: SparkSession,
    path: str,
    min_files: int = 4,
    max_partition_bytes: int = 1 << 30,
    zorder_by: list[str] | None = None,
    max_retries: int = 5,
) -> dict:
    """Small-file compaction with rebase: victims are chosen and
    rewritten ONCE against the base snapshot; losing the race to
    additive winners republishes the same compacted files with
    carried = head files minus victims — UNLESS a winner's new delete
    vectors hit a victim (the rewrite would drop the vector's target
    file and resurrect its deleted rows), in which case the compaction
    re-derives against the head. Ingest never waits for maintenance;
    maintenance never clobbers ingest. Returns the
    `compact_versioned_table` report."""
    from vptstools_spark.plans.maintenance import (
        _plan_compaction,
        _rewrite_victims,
    )

    def prepare(v: int):
        victims, n_parts = _plan_compaction(
            spark, path, v, min_files, max_partition_bytes
        )
        if not victims:
            return victims, n_parts, []
        rels = _rewrite_victims(
            spark, path, v, victims, zorder_by,
            intents.register(f"v{v + 1}-c{uuid.uuid4().hex[:8]}"),
        )
        return victims, n_parts, rels

    intents = _Intents(spark, path)
    try:
        return _compact_atomic_loop(spark, path, prepare, max_retries)
    finally:
        intents.clear_all()


def _compact_atomic_loop(spark, path, prepare, max_retries) -> dict:
    base_v = _resolve_version(spark, path, None)
    victims, n_parts, rels = prepare(base_v)
    for _ in range(max_retries + 1):
        head_v = _resolve_version(spark, path, None)
        head = _read_commit(spark, path, head_v)
        base = _read_commit(spark, path, base_v)
        if head_v != base_v:
            winners = _interleaved(spark, path, base_v, head_v)
            # a winner's new POSITION vectors must hit no victim, and a
            # winner EQUALITY delete blocks outright: the prepared
            # rewrite predates the entry, and its output files would
            # carry seqs ABOVE the entry's version — the entry would
            # stop masking the rewritten rows (resurrection)
            rebase_ok = (
                all(_is_additive(w) for w in winners)
                and not any(w["op"] == "delete_eq" for w in winners)
                and not (
                    _dv_targets(spark, path, _new_dvs(base, winners))
                    & set(victims)
                )
            )
            if not rebase_ok:
                base_v = head_v
                victims, n_parts, rels = prepare(base_v)
                head = _read_commit(spark, path, head_v)
                base = _read_commit(spark, path, base_v)
        if not victims:
            return {
                "version": head_v,
                "compacted_partitions": 0,
                "files_before": len(head["files"]),
                "files_after": len(head["files"]),
            }
        carried = [f for f in head["files"] if f not in set(victims)]
        try:
            _commit(
                spark,
                path,
                head_v + 1,
                carried + rels,
                head["partition_cols"],
                "compact",
                head.get("partition_types"),
                {**_carry(head), **_txn_extra(base_v, head_v)},
            )
            return {
                "version": head_v + 1,
                "compacted_partitions": n_parts,
                "files_before": len(head["files"]),
                "files_after": len(carried) + len(rels),
            }
        except CommitConflictError:
            continue
    raise CommitConflictError(
        f"compaction on {path} lost the commit race {max_retries + 1} times"
    )
