"""Shallow (zero-copy) table clone.

``shallow_clone`` creates a NEW versioned table whose v0 references the
source snapshot's data bytes without rewriting them — Delta's ``CLONE
... SHALLOW`` / Iceberg's snapshot-ref pattern. From then on the two
tables evolve independently: appends, deletes, compaction, vacuum and
expiry on either side never disturb the other.

Two design decisions make this safe on a filesystem lakehouse:

1. **Hard links, not path references.** Delta's shallow clone stores
   absolute paths into the source table, which makes ``VACUUM`` on the
   source break every clone (a documented Delta footgun). Here each
   referenced file is hard-linked into the clone's own data dir (same
   inode, zero data bytes copied), so the clone owns a name for every
   byte it references: vacuuming or expiring the SOURCE can only unlink
   the source's name. On an object store the link step becomes a
   server-side copy (S3 ``CopyObject`` — also no data download); the
   fallback when the destination is on a different device is a plain
   copy, and the commit records how many files got which treatment.

2. **Relabeled file names + shifted sequence numbers.** Source-relative
   names like ``v3/part=..`` are linked as ``clone-v3/part=..`` so the
   clone's own future commits (``v1``, ``v2``, …) can never collide with
   inherited version dirs. All file-keyed commit metadata (skipping
   stats, row counts, schema epochs, delete vectors, equality-delete
   sequence numbers) is rewritten through the same relabeling; position
   delete-vector files are rewritten (they NAME data files in their
   rows), which is cheap because vectors are broadcast-small by the
   table contract. Equality-delete entries and the per-file sequence map
   are shifted down by the source version so every inherited sequence is
   ≤ 0: rows appended to the clone (sequence = commit version ≥ 1) are
   provably out of reach of inherited delete entries, preserving
   Iceberg's strict "entry deletes only from older files" rule across
   the clone boundary.

At 100 TB the cost is one driver-side metadata pass over the file LIST
(O(files), no data read, no shuffle): cloning a petabyte table costs the
same as cloning a gigabyte one. This is the test/dev-sandbox and
experiment-branching primitive: fork prod, mutate freely, drop the dir.

Reference semantics: Delta Lake SHALLOW CLONE (public docs), Iceberg
snapshot references. Reference repo has no table layer; this extends the
lakehouse surface mandated by SURVEY.md §2's scale goals.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

from vptstools_spark.plans.timetravel import (
    _DATA_DIR,
    _commit,
    _read_commit,
    _resolve_version,
)

__all__ = ["shallow_clone"]


def _local(p: str) -> str:
    """Strip a file: scheme so os-level link/copy calls work."""
    if p.startswith("file://"):
        return p[len("file://") :]
    if p.startswith("file:"):
        return p[len("file:") :]
    return p


def _relabel(rel: str) -> str:
    """Prefix the version-dir segment: ``v3/part=1/f.parquet`` →
    ``clone-v3/part=1/f.parquet``. Injective per source table (first
    segments are unique commit labels), never collides with the clone's
    own ``v{k}`` / ``b-{name}-v{k}`` / ``dv{k}`` labels, and composes
    (clone-of-clone stacks another ``clone-`` prefix)."""
    head, sep, tail = rel.partition("/")
    return f"clone-{head}{sep}{tail}"


def _link_or_copy(src_abs: str, dst_abs: str) -> str:
    os.makedirs(os.path.dirname(dst_abs), exist_ok=True)
    try:
        os.link(src_abs, dst_abs)
        return "linked"
    except OSError:
        # cross-device (or FS without hard links): fall back to a copy —
        # correctness is identical, only the zero-copy property degrades
        shutil.copy2(src_abs, dst_abs)
        return "copied"


def shallow_clone(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    version: int | None = None,
) -> int:
    """Clone `src_path`'s snapshot at `version` (default latest) into a
    new table at `dst_path` (v0) without rewriting data. Returns 0.

    The clone inherits the snapshot's full logical state — schema,
    column order, partition spec + hidden transforms, rename history,
    constraints, skipping stats, pending position/equality deletes —
    but NOT the source's other versions, branches or tags: history
    starts fresh at the clone (Delta semantics)."""
    src = _local(src_path)
    dst = _local(dst_path)
    v = _resolve_version(spark, src, version)
    commit = _read_commit(spark, src, v)
    from vptstools_spark.plans.timetravel import _log_path

    if os.path.exists(_local(_log_path(dst, 0))):
        raise ValueError(f"destination {dst_path} is already a table")

    src_root = os.path.join(src, _DATA_DIR)
    dst_root = os.path.join(dst, _DATA_DIR)
    treatment = {"linked": 0, "copied": 0}

    # -- data files: link under relabeled version dirs ------------------
    new_files = []
    rename_map = {}
    for rel in commit["files"]:
        new_rel = _relabel(rel)
        rename_map[rel] = new_rel
        treatment[
            _link_or_copy(
                os.path.join(src_root, rel), os.path.join(dst_root, new_rel)
            )
        ] += 1
        new_files.append(new_rel)

    # -- position delete vectors: REWRITE (their rows name data files) --
    dv_rels = []
    src_dvs = commit.get("delete_files") or []
    if src_dvs:
        import pyarrow as pa
        import pyarrow.parquet as pq

        tables = [
            pq.read_table(os.path.join(src_root, f)) for f in src_dvs
        ]
        merged = pa.concat_tables(tables)
        files_col = [rename_map.get(f, f) for f in merged["file"].to_pylist()]
        rewritten = pa.table(
            {"file": pa.array(files_col, pa.string()), "pos": merged["pos"]}
        )
        dv_rel = "clone-dv/vectors.parquet"
        out = os.path.join(dst_root, dv_rel)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        pq.write_table(rewritten, out)
        dv_rels = [dv_rel]

    # -- equality deletes: link key files, shift the sequence domain ----
    # Inherited sequences/entry versions are all ≤ src version; shifting
    # by -v maps them to ≤ 0, so clone-side appends (seq = version ≥ 1)
    # are strictly newer than every inherited entry — the Iceberg rule
    # "entry deletes only files with seq < entry version" keeps holding
    # with the same relative order it had in the source.
    eq_entries = []
    for e in commit.get("eq_deletes") or []:
        entry_files = []
        for rel in e["files"]:
            new_rel = _relabel(rel)
            treatment[
                _link_or_copy(
                    os.path.join(src_root, rel),
                    os.path.join(dst_root, new_rel),
                )
            ] += 1
            entry_files.append(new_rel)
        eq_entries.append(
            {**e, "files": entry_files, "version": int(e["version"]) - v}
        )
    file_seqs = {
        rename_map[f]: int(s) - v
        for f, s in (commit.get("file_seqs") or {}).items()
        if f in rename_map
    }

    def _rekey(m: dict | None) -> dict:
        return {
            rename_map[f]: val
            for f, val in (m or {}).items()
            if f in rename_map
        }

    extra = {
        "columns": commit.get("columns"),
        "constraints": commit.get("constraints") or [],
        "partition_transforms": commit.get("partition_transforms") or {},
        "rename_history": commit.get("rename_history") or [],
        "file_epochs": _rekey(commit.get("file_epochs")),
        "delete_files": dv_rels,
        "eq_deletes": eq_entries,
        "file_seqs": file_seqs,
        "stats_cols": commit.get("stats_cols") or [],
        "file_stats": _rekey(commit.get("file_stats")),
        "file_rows": _rekey(commit.get("file_rows")),
        "cloned_from": {"path": src_path, "version": v},
        "clone_files": treatment,
        # the clone keeps the source's commit-log format for life
        "format_version": int(commit.get("format_version") or 1),
    }
    _commit(
        spark,
        dst,
        0,
        new_files,
        commit.get("partition_cols") or [],
        "clone",
        commit.get("partition_types") or {},
        extra,
    )
    return 0
