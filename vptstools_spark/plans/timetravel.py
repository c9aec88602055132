"""Versioned table snapshots (time travel) over plain parquet — a
copy-on-write commit log in the Delta/Iceberg family, scoped to what an
engine without a transaction service can promise honestly: immutable data
files + a JSON commit per version listing the files that make up that
snapshot. Readers pin any version; writers never mutate or delete a file
an older commit references.

Write path is PARTITION-scoped copy-on-write: an upsert rewrites only the
partitions its delta touches (new files under `data/v{n}/`), and the new
commit references the untouched partitions' files from the PREVIOUS
commit unchanged — so at 100 TB a small delta costs one rewrite of the
touched partitions and a KB-scale commit, and every historical version
remains readable at zero storage cost beyond the rewritten partitions.

Concurrency: commits publish via ATOMIC create-exclusive on the commit
file (io.create_text_exclusive), so two writers racing to the same
version produce one winner and one `CommitConflictError` — Delta-style
optimistic concurrency on filesystems with atomic create (HDFS, local;
plain S3 needs a conditional-put layer — documented, not papered over).
Vacuuming old versions is a two-step explicit decision (`expire_versions`
drops commits, `vacuum_table` deletes data files no surviving commit
references), never a write-path side effect. Diffing two versions
composes with `operators/scd.py:snapshot_diff`.

Merge-on-read deletes (`delete_where`): instead of rewriting every
touched partition, a delete commit writes POSITION-DELETE sidecar files
— parquet rows of (data-file relative path, row index) derived from
Spark's `_metadata.file_path` / `_metadata.row_index` scan columns — and
carries every data file unchanged (the Iceberg-v2 position-delete /
Delta deletion-vector design, re-expressed with public Spark metadata
columns). Readers apply the vectors as a BROADCAST anti-join on
(file, pos), so the 100 TB fact side never shuffles for a delete; the
explicit contract is that accumulated vectors stay broadcast-small and
`purge_deletes` (file-scoped compaction: rewrite only the dirty files,
carry the clean ones, clear the vectors) is the remedy when they don't.
`commit_append` is the matching blind append (new files only, nothing
rewritten), so small-delta maintenance on a huge table is
delete_where + commit_append — two KB-scale commits and zero partition
rewrites — with `commit_upsert` remaining the copy-on-write path that
materializes deletes for the partitions it rewrites.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from vptstools_spark.io import (
    create_text_exclusive,
    read_text_sidecar,
    write_text_sidecar,
)
from vptstools_spark.plans.skipping import list_data_files

_LOG_DIR = "_log"
_DATA_DIR = "data"
#: per-branch commit logs live under `_branch_log/{name}/` — same commit
#: format, own version counter, data files shared in `data/` (branches.py)
_BRANCH_LOG_ROOT = "_branch_log"
#: immutable named refs (tags) — `_refs/{name}.json` pointing at a
#: main-line version; tagged versions are protected from expiry
_REFS_DIR = "_refs"


class CommitConflictError(RuntimeError):
    """Another writer committed this version first. The loser's snapshot
    files are orphans (never referenced — `vacuum_table` reclaims them);
    retry by re-reading the latest version and re-applying the delta."""


class ConstraintViolationError(ValueError):
    """A commit's incoming rows violate a table constraint; the commit is
    rejected before any commit file is published (the already-written
    snapshot files are orphans, reclaimed by `vacuum_table`)."""


def _carry(prev: dict) -> dict:
    """Persistent commit metadata every successor commit must re-state:
    the committed column order (schema-evolution alignment), pending
    position-delete vectors, and table constraints. Dropping any of these
    on one commit path silently changes table semantics — restore lost
    `columns` that way before r5."""
    return {
        "columns": prev.get("columns"),
        "delete_files": prev.get("delete_files") or [],
        "constraints": prev.get("constraints") or [],
        # column-rename support (rename_columns): the ordered rename maps
        # and each file's schema EPOCH (how many renames preceded its
        # write) — reads apply rename_history[epoch:] to that file
        "rename_history": prev.get("rename_history") or [],
        "file_epochs": prev.get("file_epochs") or {},
        # hidden-partitioning transforms: every write path re-derives the
        # partition columns from these specs
        "partition_transforms": prev.get("partition_transforms") or {},
        # equality-delete entries (delete_where_eq) and the per-file
        # data SEQUENCE map that scopes them (Iceberg v2 sequence
        # numbers): an entry deletes only from files whose seq is
        # STRICTLY below the entry's commit version, so later appends —
        # and a merge commit's own files — are untouched
        "eq_deletes": prev.get("eq_deletes") or [],
        "file_seqs": prev.get("file_seqs") or {},
        # file-skipping statistics (Iceberg manifest min/max): declared
        # tracked columns + the per-file [min, max] map every commit
        # maintains for its new files from parquet FOOTERS (driver-side
        # metadata reads, never a data scan)
        "stats_cols": prev.get("stats_cols") or [],
        "file_stats": prev.get("file_stats") or {},
        # widened logical column types (widen_column_types): reads cast
        # every file's column up to the recorded type — metadata-only
        # type evolution, old files never rewritten
        "cast_types": prev.get("cast_types") or {},
        # files written z-clustered (cluster_versioned_table): lets the
        # INCREMENTAL cluster pass rewrite only the unclustered accretion;
        # consumers intersect with the live file list (entries for files a
        # later commit dropped are inert)
        "clustered_files": prev.get("clustered_files") or [],
        # per-file ROW COUNTS (Iceberg manifest record counts): carried
        # files keep theirs; _commit footer-reads new files' — powers
        # metadata-only COUNT(*) (snapshot_rowcount)
        "file_rows": prev.get("file_rows") or {},
        # commit log format (2 = O(changed files) delta commits): a
        # table keeps the format it was created with; every successor
        # restates it so _commit knows how to serialize
        "format_version": int(prev.get("format_version") or 1),
    }


def _log_path(path: str, version: int, log_dir: str = _LOG_DIR) -> str:
    return os.path.join(path, log_dir, f"{version:08d}.json")


def _stat_render(v):
    """JSON-able, ORDER-PRESERVING rendering of a parquet footer min/max
    (or a query value): numbers stay numeric; date/datetime become
    zero-padded ISO strings (lexicographic == chronological); strings
    stay strings. None ⇒ the value class is not trackable — callers keep
    the file conservatively."""
    import datetime as _dt

    if isinstance(v, bool) or v is None:
        return None  # bool min/max prunes ~nothing; not worth the entry
    if isinstance(v, (int, float)):
        return v
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%dT%H:%M:%S.%f")
    if isinstance(v, _dt.date):
        return v.strftime("%Y-%m-%d") + "T00:00:00.000000"
    if isinstance(v, str):
        return v
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    return None


def _footer_rowcount(abs_path: str) -> int:
    """Row count of one parquet file from its footer (pyarrow metadata
    read — KB, never the data)."""
    import pyarrow.fs as pafs
    import pyarrow.parquet as pq

    if "://" in abs_path:
        fs, p = pafs.FileSystem.from_uri(abs_path)
    else:
        fs, p = pafs.LocalFileSystem(), abs_path
    return int(pq.read_metadata(p, filesystem=fs).num_rows)


def _footer_stats(abs_path: str, cols: list[str]) -> dict:
    """Per-column [min, max] for one parquet file, from its FOOTER row-
    group statistics (pyarrow metadata read — KB, not the data). Columns
    with any stat-less or unrenderable row group are omitted (reads keep
    the file conservatively); all-NULL files record a null marker so
    range predicates can skip them."""
    import pyarrow.fs as pafs
    import pyarrow.parquet as pq

    if "://" in abs_path:
        fs, p = pafs.FileSystem.from_uri(abs_path)
    else:
        fs, p = pafs.LocalFileSystem(), abs_path
    md = pq.read_metadata(p, filesystem=fs)
    want = set(cols)
    agg: dict[str, list] = {}
    bad: set[str] = set()
    nulls_only: dict[str, bool] = {}
    for rg_i in range(md.num_row_groups):
        rg = md.row_group(rg_i)
        for ci in range(rg.num_columns):
            cm = rg.column(ci)
            name = cm.path_in_schema
            if name not in want or name in bad:
                continue
            st = cm.statistics
            if st is None:
                bad.add(name)
                continue
            if not st.has_min_max:
                # a row group with rows but no min/max: all-NULL is fine
                # (no range can match), anything else is untrackable
                if st.null_count == cm.num_values or cm.num_values == 0:
                    nulls_only.setdefault(name, True)
                    continue
                bad.add(name)
                continue
            mn, mx = _stat_render(st.min), _stat_render(st.max)
            if mn is None or mx is None:
                bad.add(name)
                continue
            nulls_only[name] = False
            if name not in agg:
                agg[name] = [mn, mx]
            else:
                agg[name][0] = min(agg[name][0], mn)
                agg[name][1] = max(agg[name][1], mx)
    out = {c: v for c, v in agg.items() if c not in bad}
    for c, only in nulls_only.items():
        if only and c not in bad and c not in out:
            out[c] = None  # explicit all-NULL marker: skippable for ranges
    return out


def _stats_keep_file(entry, op: str, qv) -> bool:
    """Does a file's recorded [min, max] admit `col op value`? Missing
    entry or type-family mismatch ⇒ keep (conservative); the all-NULL
    marker (None) never matches a comparison."""
    if entry is None:
        return False  # all-NULL file: no comparison can be true
    mn, mx = entry
    numeric = isinstance(qv, (int, float)) and not isinstance(qv, bool)
    if numeric != (isinstance(mn, (int, float)) and not isinstance(mn, bool)):
        return True  # incomparable families: never skip on a guess
    if op == "=":
        return mn <= qv <= mx
    if op in ("<", "<="):
        return mn < qv if op == "<" else mn <= qv
    if op in (">", ">="):
        return mx > qv if op == ">" else mx >= qv
    return True


def _list_versions(
    spark: SparkSession, path: str, log_dir: str = _LOG_DIR
) -> list[int]:
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(os.path.join(path, log_dir))
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return []
    out = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.endswith(".json"):
            out.append(int(name[:-5]))
    return sorted(out)


def _read_commit_raw(
    spark: SparkSession, path: str, version: int, log_dir: str = _LOG_DIR
) -> dict:
    return json.loads(
        read_text_sidecar(spark, _log_path(path, version, log_dir))
    )


#: ---- commit format v2: O(changed files) delta commits --------------------
#: A format-1 commit restates the FULL live-file list and every per-file
#: map — ~10 MB of JSON PER COMMIT at 100 k files, multiplied into every
#: read at high commit rates (the r7 verdict's largest remaining 100 TB
#: design liability). A format-2 commit stores only `add_files` /
#: `remove_files` plus the per-file map entries of the ADDED files (the
#: Iceberg manifest idea, rendered as a delta chain with checkpoints —
#: Delta Lake's log shape); `_read_commit` resolves the chain back to
#: the nearest full base (a checkpoint under `_log/_ckpt/`, a full
#: commit, or a memoized ancestor) and returns the SAME fully-resolved
#: dict shape both formats always exposed, so every reader works
#: unchanged on either format, including histories that mix them.
#: Resolved docs are cached (bounded LRU) and must be treated as
#: IMMUTABLE by callers — no reader mutates commit dicts (checked), and
#: `_commit` repopulates the entry on every successful write.
_COMMIT_FORMAT_V2 = 2
_CKPT_DIRNAME = "_ckpt"
_CKPT_INTERVAL = 10
#: per-file map keys split into add-deltas by format v2
_PER_FILE_MAPS = ("file_rows", "file_stats", "file_epochs", "file_seqs")
_RESOLVED_COMMIT_CACHE: dict = {}
_RESOLVED_COMMIT_CACHE_MAX = 1024


def _ckpt_path(path: str, version: int, log_dir: str = _LOG_DIR) -> str:
    return os.path.join(path, log_dir, _CKPT_DIRNAME, f"{version:08d}.json")


def _cache_resolved(key: tuple, doc: dict) -> None:
    from collections import OrderedDict

    global _RESOLVED_COMMIT_CACHE
    if not isinstance(_RESOLVED_COMMIT_CACHE, OrderedDict):
        _RESOLVED_COMMIT_CACHE = OrderedDict(_RESOLVED_COMMIT_CACHE)
    _RESOLVED_COMMIT_CACHE[key] = doc
    _RESOLVED_COMMIT_CACHE.move_to_end(key)
    while len(_RESOLVED_COMMIT_CACHE) > _RESOLVED_COMMIT_CACHE_MAX:
        _RESOLVED_COMMIT_CACHE.popitem(last=False)


def _invalidate_resolved(table_path: str) -> None:
    for k in [k for k in _RESOLVED_COMMIT_CACHE if k[0] == table_path]:
        del _RESOLVED_COMMIT_CACHE[k]


def _to_delta(full: dict, parent: dict) -> dict:
    """Render a fully-resolved commit doc as its format-2 delta against
    the resolved parent. `_apply_commit_delta(parent, delta)` reproduces
    `full` exactly — the round-trip invariant tests assert."""
    pf, cf = set(parent["files"]), set(full["files"])
    delta = {
        k: v
        for k, v in full.items()
        if k not in ("files", "clustered_files", *_PER_FILE_MAPS)
    }
    delta["format"] = _COMMIT_FORMAT_V2
    delta["base"] = parent["version"]
    adds = sorted(cf - pf)
    delta["add_files"] = adds
    delta["remove_files"] = sorted(pf - cf)
    delta["_maps"] = [k for k in _PER_FILE_MAPS if k in full]
    for mk in delta["_maps"]:
        m = full.get(mk) or {}
        pm = parent.get(mk) or {}
        # every CHANGED entry, not just the added files': the commit
        # that first enables a per-file feature (stats_cols / renames /
        # eq-deletes) stamps entries for ALL then-live files — stored
        # once, O(changed entries) ever after
        delta[f"{mk}_add"] = {
            f: v for f, v in m.items() if pm.get(f) != v
        }
    delta["clustered_add"] = sorted(
        set(full.get("clustered_files") or [])
        - set(parent.get("clustered_files") or [])
    )
    return delta


def _apply_commit_delta(parent: dict, raw: dict) -> dict:
    """Resolve one format-2 delta on top of the resolved parent doc."""
    files = sorted(
        (set(parent["files"]) - set(raw["remove_files"]))
        | set(raw["add_files"])
    )
    fset = set(files)
    doc = {
        k: v
        for k, v in raw.items()
        if k
        not in (
            "format",
            "base",
            "add_files",
            "remove_files",
            "_maps",
            "clustered_add",
            *[f"{mk}_add" for mk in _PER_FILE_MAPS],
        )
    }
    doc["files"] = files
    for mk in raw.get("_maps") or []:
        merged = {
            f: v for f, v in (parent.get(mk) or {}).items() if f in fset
        }
        merged.update(raw.get(f"{mk}_add") or {})
        doc[mk] = merged
    doc["clustered_files"] = sorted(
        (
            set(parent.get("clustered_files") or [])
            | set(raw.get("clustered_add") or [])
        )
        & fset
    )
    return doc


def _read_commit(
    spark: SparkSession, path: str, version: int, log_dir: str = _LOG_DIR
) -> dict:
    """The FULLY-RESOLVED commit doc at `version` — identical shape for
    format-1 (stored full) and format-2 (delta chain) commits. Callers
    must treat the returned dict as immutable (it is shared via a
    bounded memo; commits are immutable once published, so entries never
    go stale — `_commit` re-caches on write and `commit_initial` purges
    a recreated table's path)."""
    key = (path, log_dir, version)
    hit = _RESOLVED_COMMIT_CACHE.get(key)
    if hit is not None:
        return hit
    chain: list[dict] = []
    v = version
    base: dict | None = None
    while True:
        k2 = (path, log_dir, v)
        hit = _RESOLVED_COMMIT_CACHE.get(k2)
        if hit is not None:
            base = hit
            break
        try:
            base = json.loads(
                read_text_sidecar(spark, _ckpt_path(path, v, log_dir))
            )
            _cache_resolved(k2, base)
            break
        except Exception:
            pass
        raw = _read_commit_raw(spark, path, v, log_dir)
        if int(raw.get("format") or 1) < _COMMIT_FORMAT_V2:
            base = raw  # format-1 commits ARE fully resolved
            _cache_resolved(k2, base)
            break
        chain.append(raw)
        v = int(raw["base"])
    for raw in reversed(chain):
        base = _apply_commit_delta(base, raw)
        _cache_resolved((path, log_dir, int(raw["version"])), base)
    return base


#: Iceberg-style partition TRANSFORMS — hidden partitioning: the table
#: partitions by a DERIVED column (day of a timestamp, hash bucket,
#: truncated prefix) that writers never supply and readers never see;
#: every write path derives it automatically and `read_version_pruned`
#: maps predicates on the SOURCE column to planning-time partition
#: pruning on the derived one. Kinds:
#:   ("years", src)           -> trunc(src, 'year')        (monotone)
#:   ("months", src)          -> trunc(src, 'month')       (monotone)
#:   ("days", src)            -> to_date(src)              (monotone)
#:   ("hours", src)           -> 'yyyy-MM-dd-HH' render    (monotone)
#:   ("bucket", src, n)       -> pmod(hash(src), n)        (equality)
#:   ("truncate_int", src, w) -> src - pmod(src, w)        (monotone)
#:   ("truncate_str", src, w) -> substring(src, 1, w)      (monotone)
#: Pick granularity by partition-count budget, as in Iceberg: days on a
#: year of data is ~365 directories; on a decade it is a small-files
#: factory — months/years exist for exactly that reason.
_TRANSFORM_KINDS = {
    "years", "months", "days", "hours", "bucket",
    "truncate_int", "truncate_str",
}
#: kinds where T is order-preserving, so range predicates map to ranges;
#: bucket is the one non-monotone kind — it prunes EQUALITY only (a
#: range over hash buckets is meaningless), which read_version_pruned's
#: mapping rules state explicitly
_MONOTONE_KINDS = {
    "years", "months", "days", "hours", "truncate_int", "truncate_str"
}


def _transform_expr(spec: tuple, x: Column) -> Column:
    kind = spec[0]
    if kind == "years":
        return F.trunc(F.to_date(x), "year")
    if kind == "months":
        return F.trunc(F.to_date(x), "month")
    if kind == "days":
        return F.to_date(x)
    if kind == "hours":
        # Iceberg's hour() transform, rendered human-readable; the
        # fixed-width zero-padded form is lexicographically monotone,
        # so range predicates map through it like days/months
        return F.date_format(x, "yyyy-MM-dd-HH")
    if kind == "bucket":
        return F.pmod(F.hash(x), F.lit(int(spec[2])))
    if kind == "truncate_int":
        return (x - F.pmod(x, F.lit(int(spec[2])))).cast("long")
    if kind == "truncate_str":
        return F.substring(x, 1, int(spec[2]))
    raise ValueError(f"unknown partition transform kind {kind!r}")


def _derive(df: DataFrame, transforms: dict | None) -> DataFrame:
    """Add each transform's derived partition column (idempotent: an
    existing column of the same name is overwritten with the canonical
    derivation, so a stale caller-supplied value can never disagree)."""
    for name, spec in (transforms or {}).items():
        df = df.withColumn(name, _transform_expr(tuple(spec), F.col(spec[1])))
    return df


def _partition_of(rel_file: str, partition_cols: list[str]) -> tuple:
    """Partition values parsed from a file's `col=value` path segments
    (hive layout, as written by partitionBy)."""
    vals = {}
    for seg in rel_file.split("/"):
        if "=" in seg:
            k, _, v = seg.partition("=")
            if k in partition_cols:
                vals[k] = v
    return tuple(vals.get(c) for c in partition_cols)


def _write_snapshot_files(
    df: DataFrame,
    path: str,
    version: int,
    partition_cols: list[str],
    vlabel: str | None = None,
    transforms: dict | None = None,
) -> list[str]:
    """Write `df` as this version's new immutable files; return their
    paths RELATIVE to the table's data dir. `vlabel` overrides the
    version-dir name (branch commits write under `b-{name}-v{k}` so
    their dirs can never collide with main-line `v{k}` dirs — the data
    dir is SHARED across main and branches, which is what makes a fork
    and a fast-forward merge zero-copy metadata operations)."""
    vlabel = vlabel or f"v{version}"
    vdir = os.path.join(path, _DATA_DIR, vlabel)
    df = _derive(df, transforms)
    w = df.write.mode("error")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(vdir)
    files = list_data_files(df.sparkSession, vdir)
    rels = []
    for f in files:
        idx = f.index(f"{_DATA_DIR}/{vlabel}/")
        rels.append(f[idx + len(_DATA_DIR) + 1 :])
    return sorted(rels)


def _commit(
    spark: SparkSession,
    path: str,
    version: int,
    files: list[str],
    partition_cols: list[str],
    op: str,
    partition_types: dict[str, str] | None = None,
    extra: dict | None = None,
    log_dir: str = _LOG_DIR,
) -> None:
    """Publish a commit via ATOMIC create-exclusive: the commit file IS
    the transaction — snapshot files are invisible until it exists, and
    two writers racing to the same version number produce exactly one
    winner (Delta-style optimistic concurrency on filesystems with atomic
    create; see io.create_text_exclusive for the object-store caveat)."""
    import time

    extra = dict(extra or {})
    hist = extra.get("rename_history") or []
    if hist:
        # COMPLETE per-file schema-epoch map: carried files keep their
        # recorded epoch, files new to this commit get the current one
        # (= number of renames that precede their write). Completeness is
        # the invariant that lets successors tell carried from new.
        prev_eps = extra.get("file_epochs") or {}
        extra["file_epochs"] = {
            f: prev_eps.get(f, len(hist)) for f in files
        }
    else:
        # keep pre-rename commits clean of empty bookkeeping
        extra.pop("rename_history", None)
        extra.pop("file_epochs", None)
    if extra.get("eq_deletes"):
        # complete per-file sequence map: carried files keep their seq,
        # files new to this commit get the current version — tracking
        # starts at the first eq-delete commit, where assigning every
        # then-existing file THAT version is exactly right (the entry
        # applies to seq <= its version)
        prev_seqs = extra.get("file_seqs") or {}
        extra["file_seqs"] = {
            f: prev_seqs.get(f, version) for f in files
        }
    else:
        extra.pop("eq_deletes", None)
        extra.pop("file_seqs", None)
    if extra.get("stats_cols"):
        # complete per-file skipping-stats map: carried files keep their
        # recorded ranges; files NEW to this commit get footer-derived
        # min/max for the tracked columns — one driver-side metadata
        # read per new file, so every write path (append, upsert,
        # compaction rewrite) keeps the manifest current for free
        prev_fs = extra.get("file_stats") or {}
        extra["file_stats"] = {
            f: (
                prev_fs[f]
                if f in prev_fs
                else _footer_stats(
                    os.path.join(path, _DATA_DIR, f), extra["stats_cols"]
                )
            )
            for f in files
        }
    else:
        extra.pop("stats_cols", None)
        extra.pop("file_stats", None)
    # complete per-file row-count map, maintained UNCONDITIONALLY: one
    # pyarrow footer read per file NEW to this commit (KB, driver-side)
    # buys metadata-only COUNT(*) at any table size (snapshot_rowcount)
    prev_rows = extra.get("file_rows") or {}
    extra["file_rows"] = {
        f: (
            prev_rows[f]
            if f in prev_rows
            else _footer_rowcount(os.path.join(path, _DATA_DIR, f))
        )
        for f in files
    }
    full_doc = {
        "version": version,
        "op": op,
        # wall-clock commit time (epoch seconds): powers
        # TIMESTAMP AS OF reads and age-based retention; version
        # numbers stay the ordering authority (clock skew between
        # writers can't reorder history)
        "ts": time.time(),
        "partition_cols": partition_cols,
        # declared types beat hive directory-name inference on read
        # (inference can only guess numeric/date/string — a boolean
        # or decimal partition column would come back as string)
        "partition_types": partition_types or {},
        "files": sorted(files),
        **(extra or {}),
    }
    if full_doc.get("clustered_files"):
        # normalized order makes the v2 set-algebra reproduction exact
        full_doc["clustered_files"] = sorted(full_doc["clustered_files"])
    # format v2 (O(changed files) commits): versions after 0 store only
    # the delta vs the resolved parent; resolution reproduces full_doc
    # exactly. An unresolvable parent degrades to writing full — always
    # a valid base, never wrong.
    payload = full_doc
    if int(full_doc.get("format_version") or 1) >= _COMMIT_FORMAT_V2 and version > 0:
        try:
            parent = _read_commit(spark, path, version - 1, log_dir)
            payload = _to_delta(full_doc, parent)
        except Exception:
            payload = full_doc
    ok = create_text_exclusive(
        spark, _log_path(path, version, log_dir), json.dumps(payload)
    )
    if not ok:
        raise CommitConflictError(
            f"version {version} of {path} was committed by another writer; "
            "re-read the latest version and retry the upsert"
        )
    _cache_resolved((path, log_dir, version), full_doc)
    if (
        payload is not full_doc
        and version % _CKPT_INTERVAL == 0
    ):
        # periodic checkpoint bounds the delta-chain walk (Delta Lake's
        # _last_checkpoint cadence); overwrite-idempotent, never racy
        # (the version's content is already fixed by the exclusive
        # commit above)
        from vptstools_spark.io import write_text_overwrite

        write_text_overwrite(
            spark, _ckpt_path(path, version, log_dir), json.dumps(full_doc)
        )
    if log_dir == _LOG_DIR:
        # best-effort O(1)-open hint (never authoritative: readers verify
        # and probe forward; a lost overwrite race just means one extra
        # probe). Expiry maintains the "no gap above the hint" invariant.
        from vptstools_spark.io import write_text_overwrite

        write_text_overwrite(
            spark, _latest_hint_path(path), json.dumps({"version": version})
        )


def commit_initial(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    extra: dict | None = None,
    partition_transforms: dict | None = None,
    stats_cols: list[str] | None = None,
    format_version: int = 2,
) -> int:
    """Version 0: full snapshot write + commit. Returns the version.

    `format_version` picks the commit-log format the table keeps for
    life: 2 (default) stores each commit as an O(changed files) DELTA
    against its parent with periodic full checkpoints — at 100 k files
    this turns ~10 MB of restated JSON per commit into KBs; 1 restates
    the full file list + per-file maps every commit (the pre-r8 format,
    still written and read bit-compatibly). Readers never see the
    difference: `_read_commit` resolves either format to the same full
    doc.

    `partition_transforms` enables HIDDEN partitioning (Iceberg shape):
    `{"p_day": ("days", "ts")}` partitions by a column DERIVED from
    `ts` — writers never supply it (every later commit derives it from
    the spec), readers never see it (the logical schema excludes it),
    and `read_version_pruned` maps source-column predicates onto it for
    planning-time partition pruning. Transform names must appear in
    `partition_cols` and must not collide with data columns.

    `stats_cols` declares the FILE-SKIPPING columns (Iceberg manifest
    min/max): every commit records, per data file, the footer [min, max]
    of each declared column, and `read_version_pruned` uses them to cut
    the file list before any scan. Declare the columns queries range
    over (sort/cluster by them — plans/zorder.py — to make per-file
    ranges tight); partition columns are excluded (the hive path already
    prunes them)."""
    pcols = partition_cols or []
    s_cols = list(stats_cols or [])
    for c in s_cols:
        if c not in df.columns or c in pcols:
            raise ValueError(
                f"stats column {c!r} must be a non-partition data column"
            )
    transforms = dict(partition_transforms or {})
    for name, spec in transforms.items():
        spec = tuple(spec)
        if spec[0] not in _TRANSFORM_KINDS:
            raise ValueError(
                f"unknown transform kind {spec[0]!r} for {name!r}; "
                f"supported: {sorted(_TRANSFORM_KINDS)}"
            )
        if spec[1] not in df.columns:
            raise ValueError(
                f"transform {name!r} references missing column {spec[1]!r}"
            )
        if name in df.columns:
            raise ValueError(
                f"transform name {name!r} collides with a data column; "
                "hidden partition columns live outside the logical schema"
            )
        if name not in pcols:
            raise ValueError(
                f"transform {name!r} must be listed in partition_cols"
            )
    derived = _derive(df, transforms)
    missing = [c for c in pcols if c not in derived.columns]
    if missing:
        raise ValueError(f"partition columns {missing} not in the frame")
    if format_version not in (1, _COMMIT_FORMAT_V2):
        raise ValueError(f"unknown commit format_version {format_version}")
    # table (re)creation is the one event that can reuse a memoized
    # version-dir label (`v0`) or commit version with different
    # contents — purge both memos first
    _invalidate_vdir_schemas(path)
    _invalidate_resolved(path)
    rels = _write_snapshot_files(derived, path, 0, pcols)
    ptypes = {
        f.name: f.dataType.simpleString()
        for f in derived.schema.fields
        if f.name in pcols
    }
    _commit(
        df.sparkSession,
        path,
        0,
        rels,
        pcols,
        "initial",
        ptypes,
        {
            # logical schema: the hidden derived columns stay out
            "columns": df.columns,
            "partition_transforms": {
                k: list(v) for k, v in transforms.items()
            },
            "stats_cols": s_cols,
            "format_version": format_version,
            **(extra or {}),
        },
    )
    return 0


def commit_upsert(
    spark: SparkSession,
    path: str,
    delta: DataFrame,
    keys: list[str],
    delete_col: str | None = None,
    expected_version: int | None = None,
    extra: dict | None = None,
    evolve_schema: bool = False,
) -> int:
    """Partition-scoped copy-on-write upsert: delta rows replace same-key
    rows, `delete_col`-true rows are tombstones. Only partitions present
    in the delta are rewritten; the new commit carries the previous
    commit's files for every untouched partition. Returns the new
    version.

    Concurrency: pass `expected_version` (the version this delta was
    derived against) for compare-and-swap semantics — a cheap early
    `CommitConflictError` when someone already committed past it. Even
    without it, the final commit publish is atomic create-exclusive, so a
    lost race NEVER corrupts the log; the loser's orphaned snapshot files
    are reclaimed by `vacuum_table`.

    Schema: by default the delta's data columns must match the table's
    exactly (a clear error beats a silent NULL-fill that erases data on
    replaced rows). `evolve_schema=True` permits ADDITIVE evolution —
    extra delta columns are appended to the table schema and earlier
    rows read as NULL for them (carried old files are never rewritten;
    `read_version` aligns schemas at read time from the commit's
    recorded column list). Dropping or retyping a column is always
    rejected — that is a rewrite, not an evolution."""
    versions = _list_versions(spark, path)
    if not versions:
        raise ValueError(f"no table at {path}; commit_initial first")
    prev_v = versions[-1]
    if expected_version is not None and prev_v != expected_version:
        raise CommitConflictError(
            f"table {path} is at version {prev_v}, not the expected "
            f"{expected_version}; re-derive the delta and retry"
        )
    prev = _read_commit(spark, path, prev_v)
    pcols = prev["partition_cols"]
    new_v = prev_v + 1

    upserts = delta.filter(~F.col(delete_col)) if delete_col else delta
    upserts = upserts.drop(*([delete_col] if delete_col else []))

    cur_schema = {
        f.name: f.dataType.simpleString()
        for f in read_version(spark, path, prev_v).schema.fields
    }
    new_schema = {
        f.name: f.dataType.simpleString() for f in upserts.schema.fields
    }
    missing = set(cur_schema) - set(new_schema)
    added = set(new_schema) - set(cur_schema)
    retyped = {
        c for c in set(cur_schema) & set(new_schema)
        if cur_schema[c] != new_schema[c]
    }
    if retyped:
        raise ValueError(
            f"delta retypes columns {sorted(retyped)} "
            f"({ {c: (cur_schema[c], new_schema[c]) for c in sorted(retyped)} }); "
            "type changes require a rewrite, not an upsert"
        )
    if missing:
        raise ValueError(
            f"delta is missing table columns {sorted(missing)}; an upsert "
            "replaces whole rows — a NULL-fill here would silently erase "
            "data (project the delta onto the full schema explicitly)"
        )
    if added and not evolve_schema:
        raise ValueError(
            f"delta adds columns {sorted(added)}; pass evolve_schema=True "
            "for additive schema evolution"
        )
    # incoming (non-tombstone) rows must satisfy the table's constraints;
    # unique rules probe the snapshot minus the keys this delta replaces
    _enforce(
        upserts,
        prev,
        "upsert",
        table=read_version(spark, path, prev_v),
        replace_keys=keys,
    )

    transforms = prev.get("partition_transforms") or {}
    if pcols:
        # one collect yields BOTH forms of each touched partition tuple:
        # the typed values (drive the scope filter) and Spark's own
        # cast-to-string rendering (drives the path comparison — the
        # dynamic partition writer renders directory names as
        # escapePathName(cast(v as string)), so NULL →
        # __HIVE_DEFAULT_PARTITION__, booleans → 'true', doubles in
        # Spark's scientific form; Python str() diverges on all three
        # and silently duplicated rows before r5)
        from vptstools_spark.operators.merge import (
            escape_partition_segment,
            scope_to_partitions,
        )

        rows = (
            _derive(delta, transforms).select(*pcols)
            .distinct()
            .select(
                F.struct(*pcols).alias("t"),
                F.struct(
                    *[F.col(c).cast("string").alias(c) for c in pcols]
                ).alias("s"),
            )
            .collect()
        )
        raw = [tuple(r["t"][c] for c in pcols) for r in rows]
        touched_str = {
            tuple(escape_partition_segment(r["s"][c]) for c in pcols)
            for r in rows
        }
        # files whose path lacks a segment for SOME current partition
        # column were written under an earlier partition spec
        # (evolve_partitioning is metadata-only): their partition values
        # are not decidable from the path, so they can never be carried —
        # a COW upsert migrates them to the current spec (Iceberg's
        # rewrite-on-write rule for pre-evolution files)
        legacy = {
            f for f in prev["files"] if None in _partition_of(f, pcols)
        }
        # hidden partition columns re-derive from their source columns on
        # the logical read, so scoping works without exposing them
        cur = scope_to_partitions(
            _derive(read_version(spark, path, prev_v), transforms), pcols, raw
        )
        if legacy:
            from vptstools_spark.operators.merge import anti_scope_to_partitions

            # touched-partition rows (from ALL files, legacy included) are
            # already in `cur`; add the legacy files' rows OUTSIDE the
            # touched partitions so dropping the files loses nothing
            legacy_rows = _read_snapshot(
                spark, path, prev_v, file_subset=legacy
            )
            ptypes = prev.get("partition_types") or {}
            for c in pcols:
                # a now-partitioning column added by schema evolution AFTER
                # the legacy file was written: those rows are NULL for it
                if c not in legacy_rows.columns:
                    legacy_rows = legacy_rows.withColumn(
                        c, F.lit(None).cast(ptypes.get(c, "string"))
                    )
            # legacy files can also predate additive SCHEMA evolution:
            # allowMissingColumns fills their missing columns with NULL,
            # matching how read_version reads them in place
            cur = cur.unionByName(
                anti_scope_to_partitions(
                    _derive(legacy_rows, transforms), pcols, raw
                ),
                allowMissingColumns=True,
            )
        if transforms:
            cur = cur.drop(*transforms.keys())
        carried = [
            f
            for f in prev["files"]
            if f not in legacy and _partition_of(f, pcols) not in touched_str
        ]
    else:
        cur = read_version(spark, path, prev_v)
        carried = []
    survivors = cur.join(delta.select(*keys).distinct(), keys, "left_anti")
    # allowMissingColumns only ever fills the SURVIVOR side (schema checks
    # above guarantee upserts ⊇ table columns): survivors read NULL for
    # newly added columns, exactly the additive-evolution semantics
    merged = survivors.unionByName(upserts, allowMissingColumns=True)
    rels = _write_snapshot_files(
        merged, path, new_v, pcols, transforms=transforms
    )
    _commit(
        spark,
        path,
        new_v,
        carried + rels,
        pcols,
        "upsert",
        prev.get("partition_types"),
        {
            # carried partitions keep their pending delete vectors; the
            # rewrite materialized deletes only for TOUCHED partitions.
            # Entries referencing dropped files match nothing (harmless);
            # purge_deletes clears them
            **_carry(prev),
            # stable column order: table order first, additions appended —
            # read_version aligns mixed-schema file sets against this
            "columns": list(cur_schema) + sorted(added),
            **(extra or {}),
        },
    )
    return new_v


#: hidden scan-position columns a merge-on-read read threads through the
#: plan; dropped before the caller sees the DataFrame (user tables must
#: not collide with these names)
_DV_FILE = "__dv_file"
_DV_POS = "__dv_pos"


def _latest_hint_path(path: str) -> str:
    return os.path.join(path, _LOG_DIR, "_latest")


def _resolve_latest_fast(spark: SparkSession, path: str) -> int | None:
    """O(1) latest-version resolution via the `_latest` hint sidecar
    (Delta's `_last_checkpoint` idea): read the hinted version, verify
    its commit exists, then probe FORWARD until the first gap — correct
    even when the hint is stale (a racing writer's hint lost the
    overwrite race), because commits are dense above the head the hint
    names. Returns None when there is no usable hint (caller falls back
    to the O(#versions) listing). At scale this replaces an object-store
    LIST of the whole log with ~2 point reads per table open."""
    try:
        hinted = int(json.loads(
            read_text_sidecar(spark, _latest_hint_path(path))
        )["version"])
    except Exception:
        return None
    jvm = spark.sparkContext._jvm
    fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    )
    def _exists(v: int) -> bool:
        return fs.exists(jvm.org.apache.hadoop.fs.Path(_log_path(path, v)))
    if hinted < 0 or not _exists(hinted):
        return None  # hint predates expiry or is corrupt: fall back
    v = hinted
    while _exists(v + 1):
        v += 1
    return v


def _resolve_version(spark: SparkSession, path: str, version: int | None) -> int:
    if version is None:
        fast = _resolve_latest_fast(spark, path)
        if fast is not None:
            return fast
    versions = _list_versions(spark, path)
    if not versions:
        raise ValueError(f"no table at {path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        # a clear contract error instead of a parquet-not-found stack:
        # distinguishes "never existed" from "expired" by position
        state = "has been expired" if v < versions[0] else "does not exist"
        raise ValueError(
            f"version {v} of {path} {state}; available versions: "
            f"{versions[0]}..{versions[-1]}"
        )
    return v


#: immutable-version-dir parquet schema memo (see _read_snapshot).
#: Bounded LRU: a long-lived driver scanning many tables must not grow
#: it without limit, and `commit_initial` purges a table's entries so a
#: table DROPPED AND RECREATED at the same path (which reuses the `v0`
#: dir label) can never serve the old table's schema (ADVICE r7).
from collections import OrderedDict as _OrderedDict

_VDIR_SCHEMA_CACHE: "_OrderedDict[str, object]" = _OrderedDict()
_VDIR_SCHEMA_CACHE_MAX = 4096


def _vdir_schema_get(base: str):
    sch = _VDIR_SCHEMA_CACHE.get(base)
    if sch is not None:
        _VDIR_SCHEMA_CACHE.move_to_end(base)
    return sch


def _vdir_schema_put(base: str, schema) -> None:
    _VDIR_SCHEMA_CACHE[base] = schema
    _VDIR_SCHEMA_CACHE.move_to_end(base)
    while len(_VDIR_SCHEMA_CACHE) > _VDIR_SCHEMA_CACHE_MAX:
        _VDIR_SCHEMA_CACHE.popitem(last=False)


def _invalidate_vdir_schemas(table_path: str) -> None:
    """Drop every cached vdir schema under a table path — called when a
    table is (re)created at that path, the one event that can reuse an
    already-memoized version-dir label with different contents."""
    root = os.path.join(table_path, _DATA_DIR)
    for k in [k for k in _VDIR_SCHEMA_CACHE if k.startswith(root)]:
        del _VDIR_SCHEMA_CACHE[k]


#: position-delete vectors have a FIXED two-column shape everywhere they
#: are written (delete_where / commit_upsert_mor / update_where): passing
#: it explicitly saves a schema-inference listing per dv read — a fixed
#: driver cost every MOR snapshot assembly and change-feed build paid
_DV_READ_SCHEMA = "file string, pos bigint"

#: memoized distinct `file` targets per dv path — vector files are
#: immutable once their commit publishes, so the driver-side pyarrow
#: read (see _distinct_dv_targets) is a pay-once cost. Entries for
#: vacuumed dv dirs are merely unused. Bounded like the vdir schema memo.
_DV_TARGETS_CACHE: "_OrderedDict[str, frozenset]" = _OrderedDict()


def _dv_targets_cached(spark: SparkSession, data_root: str, rel_dvs) -> set[str]:
    """Union of target files across the given dv paths, memoized per dv
    path. Falls back to a distributed read inside _distinct_dv_targets
    for non-local filesystems."""
    out: set[str] = set()
    for rel in rel_dvs:
        p = os.path.join(data_root, rel)
        hit = _DV_TARGETS_CACHE.get(p)
        if hit is None:
            dv = spark.read.schema(_DV_READ_SCHEMA).parquet(p)
            hit = frozenset(_distinct_dv_targets(dv, [p]))
            _DV_TARGETS_CACHE[p] = hit
            while len(_DV_TARGETS_CACHE) > _VDIR_SCHEMA_CACHE_MAX:
                _DV_TARGETS_CACHE.popitem(last=False)
        out |= hit
    return out


def _read_snapshot(
    spark: SparkSession,
    path: str,
    version: int,
    with_position: bool = False,
    file_subset: set[str] | None = None,
    log_dir: str = _LOG_DIR,
    partition_filter: Column | None = None,
    apply_deletes: bool = True,
) -> DataFrame:
    """Assemble a commit's file list into one DataFrame, applying any
    position-delete vectors and equality-delete entries the commit
    carries (`apply_deletes=False` reads the raw file contents — the
    purge path probes eligibility that way). Equality entries follow
    Iceberg's STRICT sequence rule: they delete only from files whose
    data sequence is LESS than the entry's commit version, so a commit
    that pairs an entry with its own appended files (commit_upsert_eq)
    never deletes its own rows. `with_position=True`
    keeps the (relative file, row index) scan columns (`_DV_FILE`,
    `_DV_POS`) for writers that derive new vectors; `file_subset`
    restricts the scan to the listed relative files (purge reads ONLY
    the dirty files this way — the pruning happens at file-list time,
    not as a post-scan filter)."""
    commit = _read_commit(spark, path, version, log_dir)
    data_root = os.path.join(path, _DATA_DIR)
    files = commit["files"]
    if file_subset is not None:
        files = [f for f in files if f in file_subset]
    if not files:
        raise ValueError(f"version {version} is empty")
    delete_files = (commit.get("delete_files") or []) if apply_deletes else []
    eq_entries = (commit.get("eq_deletes") or []) if apply_deletes else []
    want_pos = with_position or bool(delete_files) or bool(eq_entries)
    # a snapshot's files span several version dirs (carried + new), and
    # hive partition discovery can't cross the non-hive `vN` segment —
    # read each version dir with its own basePath and union
    by_vdir: dict[str, list[str]] = {}
    for f in files:
        vdir = f.split("/", 1)[0]
        by_vdir.setdefault(vdir, []).append(os.path.join(data_root, f))
    hist = commit.get("rename_history") or []
    eps = commit.get("file_epochs") or {}
    parts = []
    for vdir, fs in sorted(by_vdir.items()):
        # version dirs are immutable once their commit publishes, so the
        # inferred (data + partition) schema per vdir is memoized: every
        # later assembly of this dir skips parquet footer inference —
        # measurable driver time when change feeds / snapshot reads are
        # rebuilt per maintenance call at small-delta scale
        base = os.path.join(data_root, vdir)
        reader = spark.read.option("basePath", base)
        cached = _vdir_schema_get(base)
        if cached is not None:
            reader = reader.schema(cached)
        p = reader.parquet(*fs)
        if cached is None:
            _vdir_schema_put(base, p.schema)
        if hist:
            # apply the renames committed AFTER this file group was
            # written (a version dir is written by exactly one commit, so
            # its files share one schema epoch); withColumnRenamed is a
            # no-op for columns the old files never had
            marker = f"/{_DATA_DIR}/"
            rel0 = fs[0][fs[0].rindex(marker) + len(marker):]
            for m in hist[eps.get(rel0, 0):]:
                for old, new in m.items():
                    p = p.withColumnRenamed(old, new)
        if want_pos:
            # rel path after the LAST '/data/' matches the commit's
            # relative file names regardless of scheme/prefix
            p = p.select(
                "*",
                F.substring_index(
                    F.col("_metadata.file_path"), f"/{_DATA_DIR}/", -1
                ).alias(_DV_FILE),
                F.col("_metadata.row_index").alias(_DV_POS),
            )
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        # a snapshot's file set can mix schemas after additive evolution
        # (carried old files never get rewritten); missing columns read
        # as NULL, and the commit's recorded column order aligns them
        out = out.unionByName(p, allowMissingColumns=True)
    if partition_filter is not None:
        # applied while hidden partition columns are still visible (hive
        # discovery surfaces them here; the logical column select below
        # drops them) — Catalyst folds the constant predicate into
        # planning-time partition pruning
        out = out.filter(partition_filter)
    if delete_files:
        # prune vector files whose (memoized, driver-side) target sets
        # don't intersect the files actually being scanned — a
        # file_subset read of a commit's NEW files provably skips every
        # carried vector (they can only target older files), dropping
        # the anti-join and its broadcast stage from the plan entirely
        scanned = set(files)
        live_dvs = [
            f
            for f in delete_files
            if _dv_targets_cached(spark, data_root, [f]) & scanned
        ]
        if live_dvs:
            dv = spark.read.schema(_DV_READ_SCHEMA).parquet(
                *[os.path.join(data_root, f) for f in live_dvs]
            )
            # BROADCAST anti-join: the fact side never shuffles for a
            # delete; vectors are bounded broadcast-small by contract
            # (purge_deletes is the remedy when they accumulate past that)
            out = out.join(
                F.broadcast(dv),
                (out[_DV_FILE] == dv["file"]) & (out[_DV_POS] == dv["pos"]),
                "left_anti",
            )
    if eq_entries:
        # EQUALITY deletes (Iceberg-v2 shape): each entry's key tuples
        # anti-join the scan, scoped by data sequence — only rows from
        # files whose seq <= the entry's commit version are eligible, so
        # later-appended rows with the same key survive. The key files
        # are broadcast-small by the same contract as position vectors.
        seqs = commit.get("file_seqs") or {}
        sdf = spark.createDataFrame(
            [(f, int(seqs.get(f, 0))) for f in files],
            "__eq_file string, __eq_seq int",
        )
        out = out.join(
            F.broadcast(sdf), out[_DV_FILE] == sdf["__eq_file"], "left"
        ).drop("__eq_file")
        for e in eq_entries:
            keys_df = (
                spark.read.parquet(
                    *[os.path.join(data_root, f) for f in e["files"]]
                )
                .select(*e.get("stored_keys", e["keys"]))
                .toDF(*e["keys"])
                .distinct()
            )
            cond = F.col("__eq_seq") < F.lit(int(e["version"]))
            for k in e["keys"]:
                cond = cond & out[k].eqNullSafe(keys_df[k])
            out = out.join(F.broadcast(keys_df), cond, "left_anti")
        out = out.drop("__eq_seq")
    cols = commit.get("columns")
    if cols:
        keep = [c for c in cols if file_subset is None or c in out.columns]
        out = out.select(*keep, *([_DV_FILE, _DV_POS] if with_position else []))
    elif want_pos and not with_position:
        out = out.drop(_DV_FILE, _DV_POS)
    for c, dt in (commit.get("cast_types") or {}).items():
        # widened logical types (widen_column_types): every file reads
        # up to the recorded type; files already written wide are no-ops
        if c in out.columns:
            out = out.withColumn(c, F.col(c).cast(dt))
    for c, dt in (commit.get("partition_types") or {}).items():
        # a file_subset of pre-evolution files can lack a partition column
        # entirely (added by later schema evolution); nothing to cast then
        if c in out.columns:
            out = out.withColumn(c, F.col(c).cast(dt))
    return out


def read_version(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    timestamp: float | None = None,
) -> DataFrame:
    """Read a pinned snapshot (default: latest). `basePath` keeps hive
    partition columns parsing even though the file list spans versions;
    position-delete vectors, if the commit carries any, are applied as a
    broadcast anti-join on (file, row index). `timestamp` (epoch seconds)
    is the TIMESTAMP AS OF form — the snapshot live at that instant."""
    if timestamp is not None:
        if version is not None:
            raise ValueError("pass version OR timestamp, not both")
        version = version_at_timestamp(spark, path, timestamp)
    v = _resolve_version(spark, path, version)
    return _read_snapshot(spark, path, v)


def set_stats_cols(
    spark: SparkSession, path: str, cols: list[str]
) -> int:
    """Declare (or change) the file-skipping statistics columns on an
    EXISTING table as a metadata commit: every current data file gets
    footer-derived [min, max] for the new column set (driver-side
    metadata reads — one footer per file, no data scan), and every later
    commit maintains the map for its new files automatically. Returns
    the new version."""
    prev_v = _resolve_version(spark, path, None)
    prev = _read_commit(spark, path, prev_v)
    pcols = prev["partition_cols"]
    logical = prev.get("columns") or []
    for c in cols:
        if (logical and c not in logical) or c in pcols:
            raise ValueError(
                f"stats column {c!r} must be a non-partition data column"
            )
    new_v = prev_v + 1
    _commit(
        spark,
        path,
        new_v,
        prev["files"],
        pcols,
        "set_stats_cols",
        prev.get("partition_types"),
        {
            **_carry(prev),
            "stats_cols": list(cols),
            # re-stat everything under the NEW column set
            "file_stats": {},
        },
    )
    return new_v


def skipped_files(
    spark: SparkSession,
    path: str,
    col: str,
    op: str,
    value,
    version: int | None = None,
) -> tuple[list[str], list[str]]:
    """(kept, skipped) data files for `col op value` under the commit's
    file-skipping stats — the inspectable face of the pruning
    `read_version_pruned` applies. Files without a usable entry are
    always kept (skipping must never be a guess)."""
    v = _resolve_version(spark, path, version)
    commit = _read_commit(spark, path, v)
    fstats = commit.get("file_stats") or {}
    if col not in (commit.get("stats_cols") or []):
        return list(commit["files"]), []
    qv = _stat_render(value)
    if qv is None:
        return list(commit["files"]), []
    kept, skipped = [], []
    for f in commit["files"]:
        st = fstats.get(f) or {}
        if col not in st:
            kept.append(f)
        elif _stats_keep_file(st[col], op, qv):
            kept.append(f)
        else:
            skipped.append(f)
    return kept, skipped


def read_version_pruned(
    spark: SparkSession,
    path: str,
    col: str,
    op: str,
    value,
    version: int | None = None,
) -> DataFrame:
    """Hidden-partitioning read: `col op value` over a snapshot, with the
    predicate ADDITIONALLY mapped onto every partition transform derived
    from `col` — the Iceberg trick that makes `WHERE ts >= X` prune a
    days(ts)-partitioned table without the user knowing the layout.
    Mapping rules: `=` maps through any transform (T(col)=T(value));
    range ops map through MONOTONE transforms only (days/truncate:
    col <= v ⇒ T(col) <= T(v), at transform granularity — the residual
    row filter restores exactness); bucket prunes equality only. The
    transform predicate is a constant-foldable expression, so pruning
    happens at planning time against the hive partition values. Tables
    without a matching transform just get the row filter (same answer,
    no pruning) — the call is always safe."""
    _OPS = {
        "=": lambda a, b: a == b,
        "<": lambda a, b: a < b,
        "<=": lambda a, b: a <= b,
        ">": lambda a, b: a > b,
        ">=": lambda a, b: a >= b,
    }
    if op not in _OPS:
        raise ValueError(f"unsupported op {op!r}; one of {sorted(_OPS)}")
    v = _resolve_version(spark, path, version)
    commit = _read_commit(spark, path, v)
    preds: list[Column] = []
    for name, spec in (commit.get("partition_transforms") or {}).items():
        spec = tuple(spec)
        if spec[1] != col:
            continue
        t_val = _transform_expr(spec, F.lit(value))
        p = F.col(name)
        if op == "=":
            preds.append(p.eqNullSafe(t_val))
        elif spec[0] in _MONOTONE_KINDS:
            # transform granularity: the boundary partition stays in
            # (<= / >= at T-level for every range op); rows inside it
            # are settled by the residual filter
            preds.append(p <= t_val if op in ("<", "<=") else p >= t_val)
    pf = None
    for c in preds:
        pf = c if pf is None else (pf & c)
    # FILE-level skipping on top of directory-level transform pruning:
    # the commit's footer [min, max] manifest cuts the file list before
    # any scan plan exists (skipped_files keeps files without usable
    # stats, so this is never a guess); the residual row filter below
    # restores exactness either way
    subset = None
    if col in (commit.get("stats_cols") or []):
        kept, skipped = skipped_files(spark, path, col, op, value, v)
        if skipped:
            subset = set(kept)
    if subset is not None and not subset:
        # every file provably excluded: empty result with the schema
        return _read_snapshot(spark, path, v).filter(F.lit(False))
    out = _read_snapshot(
        spark, path, v, partition_filter=pf, file_subset=subset
    )
    return out.filter(_OPS[op](F.col(col), F.lit(value)))


def read_version_where(
    spark: SparkSession,
    path: str,
    predicates: list[tuple],
    version: int | None = None,
) -> DataFrame:
    """Conjunction form of `read_version_pruned`: `predicates` is a list
    of (col, op, value) ANDed together. Partition-transform predicates
    union across the conjuncts; file subsets INTERSECT (a file must be
    admissible to every conjunct to be read); the residual row filter
    applies the full conjunction exactly. One scan plan, however many
    conjuncts prune."""
    v = _resolve_version(spark, path, version)
    commit = _read_commit(spark, path, v)
    _OPS = {
        "=": lambda a, b: a == b,
        "<": lambda a, b: a < b,
        "<=": lambda a, b: a <= b,
        ">": lambda a, b: a > b,
        ">=": lambda a, b: a >= b,
    }
    preds: list[Column] = []
    subset: set[str] | None = None
    for col, op, value in predicates:
        if op not in _OPS:
            raise ValueError(f"unsupported op {op!r}; one of {sorted(_OPS)}")
        for name, spec in (commit.get("partition_transforms") or {}).items():
            spec = tuple(spec)
            if spec[1] != col:
                continue
            t_val = _transform_expr(spec, F.lit(value))
            p = F.col(name)
            if op == "=":
                preds.append(p.eqNullSafe(t_val))
            elif spec[0] in _MONOTONE_KINDS:
                preds.append(p <= t_val if op in ("<", "<=") else p >= t_val)
        if col in (commit.get("stats_cols") or []):
            kept, skipped = skipped_files(spark, path, col, op, value, v)
            if skipped:
                kept_set = set(kept)
                subset = kept_set if subset is None else (subset & kept_set)
    if subset is not None and not subset:
        out = _read_snapshot(spark, path, v).filter(F.lit(False))
    else:
        pf = None
        for c in preds:
            pf = c if pf is None else (pf & c)
        out = _read_snapshot(
            spark, path, v, partition_filter=pf, file_subset=subset
        )
    for col, op, value in predicates:
        out = out.filter(_OPS[op](F.col(col), F.lit(value)))
    return out


def version_at_timestamp(
    spark: SparkSession, path: str, timestamp: float
) -> int:
    """The version live at `timestamp` (epoch seconds): the LATEST commit
    whose recorded commit time is <= it (Delta/Iceberg TIMESTAMP AS OF
    resolution). Errors clearly when the timestamp predates the first
    surviving commit (older history may have been expired) — never
    silently serves a later snapshot. Pre-timestamp commits (written
    before commit times were recorded) are treated as time 0."""
    best: int | None = None
    versions = _list_versions(spark, path)
    if not versions:
        raise ValueError(f"no table at {path}")
    for v in versions:
        c = _read_commit(spark, path, v)
        if float(c.get("ts") or 0.0) <= timestamp:
            best = v  # versions ascend; keep the latest qualifying
    if best is None:
        raise ValueError(
            f"timestamp {timestamp} predates the first surviving commit "
            f"of {path} (earliest version {versions[0]}); earlier history "
            "may have been expired"
        )
    return best


def delete_where(
    spark: SparkSession,
    path: str,
    predicate,
    expected_version: int | None = None,
) -> int:
    """Merge-on-read DELETE: write position-delete vectors for the rows
    matching `predicate` (a Column or SQL string over the table's
    columns) and commit with every data file CARRIED unchanged — no
    partition rewrite, however many partitions the predicate touches.
    The vectors are parquet rows (file: relative data file, pos: row
    index within it), computed distributed from the scan's
    `_metadata.file_path` / `row_index` columns (Iceberg-v2 position
    deletes / Delta deletion vectors, on public Spark metadata columns).
    Returns the new version.

    The predicate is evaluated on the CURRENT snapshot (vectors already
    applied), so deleting an already-deleted row is a no-op rather than
    a duplicate vector entry. Prior vectors are carried; readers union
    them. Cost contract: reads apply vectors as a broadcast anti-join,
    so keep cumulative vectors broadcast-small — `purge_deletes`
    compacts them away when they grow."""
    prev_v = _resolve_version(spark, path, None)
    if expected_version is not None and prev_v != expected_version:
        raise CommitConflictError(
            f"table {path} is at version {prev_v}, not the expected "
            f"{expected_version}; re-derive the delete and retry"
        )
    prev = _read_commit(spark, path, prev_v)
    new_v = prev_v + 1
    cond = F.expr(predicate) if isinstance(predicate, str) else predicate
    snap = _read_snapshot(spark, path, prev_v, with_position=True)
    hits = snap.filter(cond).select(
        F.col(_DV_FILE).alias("file"), F.col(_DV_POS).alias("pos")
    )
    dv_dir = os.path.join(path, _DATA_DIR, f"dv{new_v}")
    hits.write.mode("error").parquet(dv_dir)
    data_root = os.path.join(path, _DATA_DIR)
    new_rels = sorted(
        f[f.index(f"{_DATA_DIR}/dv{new_v}/") + len(_DATA_DIR) + 1 :]
        for f in list_data_files(spark, dv_dir)
    )
    # an all-miss predicate can legally write zero part files — the
    # commit still happens (the caller asked for a version boundary)
    n_deleted = (
        spark.read.parquet(*[os.path.join(data_root, f) for f in new_rels]).count()
        if new_rels
        else 0
    )
    _commit(
        spark,
        path,
        new_v,
        prev["files"],
        prev["partition_cols"],
        "delete",
        prev.get("partition_types"),
        {
            **_carry(prev),
            "delete_files": (prev.get("delete_files") or []) + new_rels,
            "n_deleted": n_deleted,
        },
    )
    return new_v


def delete_where_eq(
    spark: SparkSession,
    path: str,
    keys_df: DataFrame,
    keys: list[str],
    expected_version: int | None = None,
) -> int:
    """EQUALITY delete (Iceberg-v2 equality deletes): commit the KEY
    TUPLES to delete — `keys_df` projected onto `keys` — without
    scanning a single data file. Where `delete_where` derives position
    vectors (one snapshot scan to find the rows), a CDC batch that
    already knows its deleted primary keys commits them directly: the
    write cost is the key file alone, and reads resolve the delete with
    the same broadcast anti-join machinery as position vectors, scoped
    by per-file data SEQUENCE numbers so rows appended AFTER this commit
    with the same key are untouched (Iceberg's sequence-number rule).
    `purge_deletes` folds equality deletes into the files they hit
    (finding the dirty files is purge's scan, not the delete's).
    Returns the new version."""
    prev_v = _resolve_version(spark, path, None)
    if expected_version is not None and prev_v != expected_version:
        raise CommitConflictError(
            f"table {path} is at version {prev_v}, not the expected "
            f"{expected_version}; retry the equality delete"
        )
    prev = _read_commit(spark, path, prev_v)
    missing = [k for k in keys if k not in keys_df.columns]
    if missing:
        raise ValueError(f"keys_df lacks key columns {missing}")
    new_v = prev_v + 1
    eq_dir = os.path.join(path, _DATA_DIR, f"eq{new_v}")
    keys_df.select(*keys).distinct().write.mode("error").parquet(eq_dir)
    marker = f"{_DATA_DIR}/eq{new_v}/"
    rels = sorted(
        f[f.index(marker) + len(_DATA_DIR) + 1 :]
        for f in list_data_files(spark, eq_dir)
    )
    _commit(
        spark,
        path,
        new_v,
        prev["files"],
        prev["partition_cols"],
        "delete_eq",
        prev.get("partition_types"),
        {
            **_carry(prev),
            "eq_deletes": (prev.get("eq_deletes") or [])
            + [
                {
                    "files": rels,
                    "keys": list(keys),
                    "stored_keys": list(keys),
                    "version": new_v,
                }
            ],
            # carried files predate this commit: seed their sequence at
            # prev_v so the STRICT rule (seq < entry version) still
            # covers them when tracking starts here
            "file_seqs": {
                **{f: prev_v for f in prev["files"]},
                **(prev.get("file_seqs") or {}),
            },
        },
    )
    return new_v


def commit_upsert_eq(
    spark: SparkSession,
    path: str,
    delta: DataFrame,
    keys: list[str],
    delete_col: str | None = None,
    expected_version: int | None = None,
    extra: dict | None = None,
) -> int:
    """MERGE via EQUALITY deletes — the zero-scan CDC ingestion commit:
    ONE atomic commit that (a) records an equality-delete entry for
    every delta key and (b) appends the delta's non-tombstone rows as
    new files. Unlike `commit_upsert_mor`, whose position-vector pass
    scans the current snapshot to locate replaced rows, this commit's
    write cost is the delta alone — the key resolution happens at READ
    (broadcast anti-join, sequence-scoped so the commit's own files are
    exempt under the strict Iceberg rule) and is folded away by
    `purge_deletes`, which is where the scan is actually paid, once,
    instead of on every ingest batch. The trade: reads carry one more
    broadcast anti-join per un-purged entry, so schedule purges by
    entry count like vectors by row count. Tombstones via `delete_col`
    contribute their key only. Returns the new version."""
    prev_v = _resolve_version(spark, path, None)
    if expected_version is not None and prev_v != expected_version:
        raise CommitConflictError(
            f"table {path} is at version {prev_v}, not the expected "
            f"{expected_version}; re-derive the delta and retry"
        )
    prev = _read_commit(spark, path, prev_v)
    new_v = prev_v + 1
    upserts = delta.filter(~F.col(delete_col)) if delete_col else delta
    upserts = upserts.drop(*([delete_col] if delete_col else []))
    cur_schema = {
        f.name: f.dataType.simpleString()
        for f in read_version(spark, path, prev_v).schema.fields
    }
    new_schema = {
        f.name: f.dataType.simpleString() for f in upserts.schema.fields
    }
    if cur_schema != new_schema:
        raise ValueError(
            f"equality upsert schema {sorted(new_schema.items())} does "
            f"not match table schema {sorted(cur_schema.items())}"
        )
    _enforce(
        upserts,
        prev,
        "upsert_eq",
        table=read_version(spark, path, prev_v),
        replace_keys=keys,
    )
    eq_dir = os.path.join(path, _DATA_DIR, f"eq{new_v}")
    delta.select(*keys).distinct().write.mode("error").parquet(eq_dir)
    marker = f"{_DATA_DIR}/eq{new_v}/"
    eq_rels = sorted(
        f[f.index(marker) + len(_DATA_DIR) + 1 :]
        for f in list_data_files(spark, eq_dir)
    )
    pcols = prev["partition_cols"]
    rels = _write_snapshot_files(
        upserts, path, new_v, pcols,
        transforms=prev.get("partition_transforms"),
    )
    _commit(
        spark,
        path,
        new_v,
        prev["files"] + rels,
        pcols,
        "upsert_eq",
        prev.get("partition_types"),
        {
            **_carry(prev),
            "eq_deletes": (prev.get("eq_deletes") or [])
            + [
                {
                    "files": eq_rels,
                    "keys": list(keys),
                    "stored_keys": list(keys),
                    "version": new_v,
                }
            ],
            "file_seqs": {
                **{f: prev_v for f in prev["files"]},
                **(prev.get("file_seqs") or {}),
            },
            **(extra or {}),
        },
    )
    return new_v


def commit_overwrite(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    partition_cols: list[str] | None = None,
    extra: dict | None = None,
) -> int:
    """INSERT OVERWRITE as a commit: the new version's snapshot is
    exactly `df` — no prior file carried, prior delete vectors dropped
    (no prior file survives for them to hit). The recompute-and-swap
    path for DERIVED tables (rollups, summaries) whose content is a
    function of some upstream state rather than a delta; constraints
    carry and are enforced on the new rows. Schema and partitioning MAY
    change — the overwrite defines both. History stays: the previous
    snapshot remains pinnable/diffable exactly like any version."""
    prev_v = _resolve_version(spark, path, None)
    prev = _read_commit(spark, path, prev_v)
    _enforce(df, prev, "overwrite", table=None)
    new_v = prev_v + 1
    pcols = (
        prev["partition_cols"] if partition_cols is None else partition_cols
    )
    # transforms survive an overwrite only while their source column does
    transforms = {
        k: v
        for k, v in (prev.get("partition_transforms") or {}).items()
        if v[1] in df.columns
    }
    pcols = [c for c in pcols if c in df.columns or c in transforms]
    rels = _write_snapshot_files(df, path, new_v, pcols, transforms=transforms)
    ptypes = {
        f.name: f.dataType.simpleString()
        for f in _derive(df, transforms).schema.fields
        if f.name in pcols
    }
    _commit(
        spark,
        path,
        new_v,
        rels,
        pcols,
        "overwrite",
        ptypes,
        {
            "columns": df.columns,
            "delete_files": [],
            "constraints": prev.get("constraints") or [],
            "partition_transforms": transforms,
            # skipping columns survive an overwrite while they exist in
            # the new schema (the new files get fresh footer stats)
            "stats_cols": [
                c
                for c in (prev.get("stats_cols") or [])
                if c in df.columns and c not in pcols
            ],
            **(extra or {}),
        },
    )
    return new_v


def evolve_partitioning(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
) -> int:
    """Iceberg-style PARTITION EVOLUTION as a metadata-only commit: change
    the table's partition spec without rewriting a byte. Every existing
    file is carried; commits AFTER this one write under the new spec.
    Returns the new version (the current one if the spec is unchanged).

    Why this is safe without a rewrite: reads assemble each version dir
    with its own `basePath`, so a column is sourced from the hive path in
    post-evolution files and from the DATA columns in pre-evolution files
    (partitionBy drops partition columns from the data and encodes them in
    the path; files written under a spec that did NOT include the column
    kept it as data) — `unionByName` aligns the two. The asymmetry that
    DOES need handling is the copy-on-write carry rule: `commit_upsert`
    decides "untouched" by parsing `col=value` path segments, which
    pre-evolution files lack for newly-partitioning columns. Those files
    are detected as LEGACY (a None in their parsed partition tuple) and
    migrated — all their rows are rewritten under the current spec and the
    old file is dropped, never carried (Iceberg's rewrite-on-write rule
    for pre-evolution files). Merge-on-read commits (`commit_append`,
    `delete_where`, `commit_upsert_mor`, `update_where`) carry everything
    by construction and need no rule.

    New partition columns must already exist in the table schema (their
    types are recorded from it); pass `[]` to make the table unpartitioned
    for future writes."""
    prev_v = _resolve_version(spark, path, None)
    prev = _read_commit(spark, path, prev_v)
    pcols = list(partition_cols or [])
    if pcols == prev["partition_cols"]:
        return prev_v
    transforms = prev.get("partition_transforms") or {}
    fields = {
        f.name: f.dataType.simpleString()
        for f in read_version(spark, path, prev_v).schema.fields
    }
    # hidden transform columns count as partitionable; specs for names
    # the new spec drops are retired with it
    missing = [c for c in pcols if c not in fields and c not in transforms]
    if missing:
        raise ValueError(
            f"cannot partition by non-existent columns {missing}; add them "
            "first via commit_upsert(evolve_schema=True)"
        )
    kept_transforms = {n: s for n, s in transforms.items() if n in pcols}
    _commit(
        spark,
        path,
        prev_v + 1,
        prev["files"],
        pcols,
        "evolve_partitioning",
        # keep the PREVIOUS spec's types too: carried files still encode
        # those columns as hive path segments, whose directory-name
        # inference (int/string only) needs the recorded cast on read
        {
            **(prev.get("partition_types") or {}),
            # transform columns keep their previously recorded types
            **{c: fields[c] for c in pcols if c in fields},
        },
        {**_carry(prev), "partition_transforms": kept_transforms},
    )
    return prev_v + 1


def rename_columns(
    spark: SparkSession, path: str, mapping: dict[str, str]
) -> int:
    """Iceberg-style COLUMN RENAME as a metadata-only commit: no file is
    rewritten; instead the commit appends `mapping` to the table's
    rename history and every read applies, per file, exactly the renames
    committed AFTER that file was written (each commit records a complete
    file→schema-epoch map, maintained automatically by `_commit`). Old
    snapshots read under their own commit's history, so pinned reads are
    unaffected; new writes use the new names (schema checks go through
    `read_version`, which renames transparently).

    Refused with clear errors: renaming a PARTITION column (hive path
    segments encode the name — that is a rewrite, use a COW cycle),
    renaming to a name that exists after the rename, renaming a column an
    active constraint references (drop and re-declare the constraint
    around the rename). Returns the new version."""
    import re

    prev_v = _resolve_version(spark, path, None)
    prev = _read_commit(spark, path, prev_v)
    cols = prev.get("columns") or [
        f.name for f in read_version(spark, path, prev_v).schema.fields
    ]
    pcols = prev["partition_cols"]
    missing = [c for c in mapping if c not in cols]
    if missing:
        raise ValueError(f"cannot rename non-existent columns {missing}")
    parts = [c for c in mapping if c in pcols]
    if parts:
        raise ValueError(
            f"cannot rename partition columns {parts}: hive directory "
            "names encode the column name — that is a data rewrite "
            "(evolve_partitioning away, rename, evolve back, or overwrite)"
        )
    new_cols = [mapping.get(c, c) for c in cols]
    if len(set(new_cols)) != len(new_cols):
        raise ValueError(
            f"rename {mapping} collides: resulting columns {new_cols}"
        )
    cons = prev.get("constraints") or []
    if cons:
        blob = json.dumps(cons)
        hit = [
            c for c in mapping if re.search(rf"\b{re.escape(c)}\b", blob)
        ]
        if hit:
            raise ValueError(
                f"columns {hit} are referenced by active constraints; "
                "drop_constraints, rename, then re-declare with the new "
                "names (a silently broken CHECK is worse than this error)"
            )
    transforms = prev.get("partition_transforms") or {}
    clash = [n for n in mapping.values() if n in transforms]
    if clash:
        raise ValueError(
            f"new names {clash} collide with hidden partition-transform "
            "columns"
        )
    # a transform follows its renamed source column (Iceberg semantics:
    # the spec tracks the field, not the name) — reads re-derive from the
    # post-rename logical schema, so old files stay correct
    new_transforms = {
        n: [s[0], mapping.get(s[1], s[1]), *list(s)[2:]]
        for n, s in transforms.items()
    }
    hist = prev.get("rename_history") or []
    # epochs are positions in the PRE-append history: every current file
    # keeps its recorded epoch (0 when the table had no renames yet)
    prev_eps = prev.get("file_epochs") or {}
    _commit(
        spark,
        path,
        prev_v + 1,
        prev["files"],
        pcols,
        "rename_columns",
        prev.get("partition_types"),
        {
            **_carry(prev),
            "columns": new_cols,
            "partition_transforms": new_transforms,
            "rename_history": hist + [dict(mapping)],
            "file_epochs": {f: prev_eps.get(f, 0) for f in prev["files"]},
            # equality-delete entries follow the rename: `keys` tracks
            # the current names (the read applies them to the logical
            # schema); `stored_keys` stays the write-time parquet names
            "eq_deletes": [
                {**e, "keys": [mapping.get(k, k) for k in e["keys"]]}
                for e in (prev.get("eq_deletes") or [])
            ],
            # file-skipping stats follow too: entries are keyed by the
            # LOGICAL column name at the file's commit time, so one
            # remap keeps every lookup consistent post-rename
            "stats_cols": [
                mapping.get(c, c) for c in (prev.get("stats_cols") or [])
            ],
            "file_stats": {
                f: {mapping.get(c, c): st for c, st in (m or {}).items()}
                for f, m in (prev.get("file_stats") or {}).items()
            },
        },
    )
    return prev_v + 1


#: loss-free type promotions (Iceberg v3 type-widening set, minus the
#: date→timestamp case our tables don't need): value domains embed
#: exactly, so reading an old narrow file through a cast is identity
_WIDEN_OK = {
    ("tinyint", "smallint"),
    ("tinyint", "int"),
    ("tinyint", "bigint"),
    ("smallint", "int"),
    ("smallint", "bigint"),
    ("int", "bigint"),
    ("int", "double"),
    ("float", "double"),
}


def _is_widening(old: str, new: str) -> bool:
    if (old, new) in _WIDEN_OK:
        return True
    if old.startswith("decimal(") and new.startswith("decimal("):
        po, so = map(int, old[8:-1].split(","))
        pn, sn = map(int, new[8:-1].split(","))
        # same scale, more precision: every old value representable
        return sn == so and pn > po
    return False


def widen_column_types(
    spark: SparkSession, path: str, mapping: dict[str, str]
) -> int:
    """Iceberg-v3-style TYPE WIDENING as a metadata-only commit: record
    `{column: wider_type}` and let every read cast files up to it — no
    rewrite, however many petabytes sit in the narrow layout. Appends
    may write either width (narrow files cast on read, wide files pass
    through); pinned pre-widen snapshots keep their original types
    (each commit carries its own cast map).

    Only loss-free promotions are allowed (`_WIDEN_OK` + decimal
    precision growth at equal scale) — anything else is a data rewrite
    and is refused, as is widening a partition column (hive directory
    values are rendered in the declared type) or a hidden-transform
    source column (transform rendering would shift). Returns the new
    version."""
    prev_v = _resolve_version(spark, path, None)
    prev = _read_commit(spark, path, prev_v)
    schema = {
        f.name: f.dataType.simpleString()
        for f in _read_snapshot(spark, path, prev_v).schema.fields
    }
    missing = [c for c in mapping if c not in schema]
    if missing:
        raise ValueError(f"cannot widen non-existent columns {missing}")
    parts = [c for c in mapping if c in prev["partition_cols"]]
    if parts:
        raise ValueError(
            f"cannot widen partition columns {parts}: hive path values "
            "are rendered in the declared type"
        )
    tsrc = {
        tuple(s)[1] for s in (prev.get("partition_transforms") or {}).values()
    }
    hits = [c for c in mapping if c in tsrc]
    if hits:
        raise ValueError(
            f"columns {hits} feed hidden partition transforms; widening "
            "them would shift transform rendering — evolve the spec first"
        )
    for c, new in mapping.items():
        old = schema[c]
        if old == new:
            continue
        if not _is_widening(old, new):
            raise ValueError(
                f"{c}: {old} -> {new} is not a loss-free widening "
                f"(allowed: {sorted(_WIDEN_OK)} + decimal precision "
                "growth at equal scale)"
            )
    merged = {**(prev.get("cast_types") or {}), **mapping}
    _commit(
        spark,
        path,
        prev_v + 1,
        prev["files"],
        prev["partition_cols"],
        "widen_types",
        prev.get("partition_types"),
        {**_carry(prev), "cast_types": merged},
    )
    return prev_v + 1


def commit_append(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    expected_version: int | None = None,
) -> int:
    """Blind APPEND: write `df` as new immutable files and commit them
    alongside every existing file — nothing rewritten, prior delete
    vectors carried. With `delete_where` this makes small-delta
    maintenance on a huge table two KB-scale commits and zero partition
    rewrites (`commit_upsert` stays the copy-on-write path). The
    appended frame must match the table schema exactly — append is not
    the evolution path."""
    prev_v = _resolve_version(spark, path, None)
    if expected_version is not None and prev_v != expected_version:
        raise CommitConflictError(
            f"table {path} is at version {prev_v}, not the expected "
            f"{expected_version}; retry the append"
        )
    prev = _read_commit(spark, path, prev_v)
    new_v = prev_v + 1
    cur_schema = {
        f.name: f.dataType.simpleString()
        for f in read_version(spark, path, prev_v).schema.fields
    }
    new_schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    if cur_schema != new_schema:
        raise ValueError(
            f"append schema {sorted(new_schema.items())} does not match "
            f"table schema {sorted(cur_schema.items())}; use commit_upsert "
            "with evolve_schema=True to change the schema"
        )
    # constraints see the appended rows plus (for unique) one collision
    # probe against the current snapshot — rejected BEFORE any file lands
    _enforce(df, prev, "append", table=read_version(spark, path, prev_v))
    pcols = prev["partition_cols"]
    rels = _write_snapshot_files(
        df, path, new_v, pcols,
        transforms=prev.get("partition_transforms"),
    )
    _commit(
        spark,
        path,
        new_v,
        prev["files"] + rels,
        pcols,
        "append",
        prev.get("partition_types"),
        _carry(prev),
    )
    return new_v


def update_where(
    spark: SparkSession,
    path: str,
    predicate,
    assignments: dict[str, str],
    expected_version: int | None = None,
) -> int:
    """Merge-on-read UPDATE: one atomic commit that position-deletes the
    rows matching `predicate` (Column or SQL string) and appends their
    transformed copies — `assignments` maps column → SQL expression over
    the OLD row (standard UPDATE ... SET semantics; expressions may
    reference any column's pre-update value). Completes the DML surface
    next to INSERT (`commit_append`), DELETE (`delete_where`) and MERGE
    (`commit_upsert_mor`), with the same no-rewrite cost model: matched
    rows cost one vector pass + the appended files, never a partition
    rewrite. Constraints are enforced on the updated rows. Returns the
    new version."""
    prev_v = _resolve_version(spark, path, None)
    if expected_version is not None and prev_v != expected_version:
        raise CommitConflictError(
            f"table {path} is at version {prev_v}, not the expected "
            f"{expected_version}; re-derive the update and retry"
        )
    prev = _read_commit(spark, path, prev_v)
    new_v = prev_v + 1
    fields = [
        (f.name, f.dataType)
        for f in read_version(spark, path, prev_v).schema.fields
    ]
    unknown = set(assignments) - {n for n, _ in fields}
    if unknown:
        raise ValueError(f"assignments reference unknown columns {sorted(unknown)}")
    cond = F.expr(predicate) if isinstance(predicate, str) else predicate
    snap = _read_snapshot(spark, path, prev_v, with_position=True)
    matched = snap.filter(cond)
    # all SET expressions evaluate against the OLD row simultaneously
    # (select, not chained withColumn — `SET a = b, b = a` swaps)
    updated = matched.select(
        *[
            F.expr(assignments[c]).cast(t).alias(c)
            if c in assignments
            else F.col(c)
            for c, t in fields
        ]
    )
    # unique probes run against the rows the update RETAINS (matched rows
    # leave, their updated copies are `updated` itself)
    _enforce(
        updated,
        prev,
        "update",
        table=snap.filter(~cond.eqNullSafe(F.lit(True))),
    )
    hits = matched.select(
        F.col(_DV_FILE).alias("file"), F.col(_DV_POS).alias("pos")
    )
    data_root = os.path.join(path, _DATA_DIR)
    dv_dir = os.path.join(data_root, f"dv{new_v}")
    hits.write.mode("error").parquet(dv_dir)
    dv_rels = sorted(
        f[f.index(f"{_DATA_DIR}/dv{new_v}/") + len(_DATA_DIR) + 1 :]
        for f in list_data_files(spark, dv_dir)
    )
    pcols = prev["partition_cols"]
    rels = _write_snapshot_files(
        updated, path, new_v, pcols,
        transforms=prev.get("partition_transforms"),
    )
    _commit(
        spark,
        path,
        new_v,
        prev["files"] + rels,
        pcols,
        "update",
        prev.get("partition_types"),
        {
            **_carry(prev),
            "delete_files": (prev.get("delete_files") or []) + dv_rels,
        },
    )
    return new_v


def commit_upsert_mor(
    spark: SparkSession,
    path: str,
    delta: DataFrame,
    keys: list[str],
    delete_col: str | None = None,
    expected_version: int | None = None,
    extra: dict | None = None,
) -> int:
    """MERGE-ON-READ upsert: ONE atomic commit that (a) position-deletes
    every current row whose key appears in the delta and (b) appends the
    delta's non-tombstone rows as new files — no partition rewrite,
    however many partitions the keys scatter across. This is the
    Delta-DV / Iceberg-v2 MERGE shape: a small CDC batch against a
    100 TB table costs one metadata-scale delete-vector pass plus the
    appended files, where `commit_upsert` (the copy-on-write path) would
    rewrite every touched partition. Reads get slightly slower (vector
    anti-join) until `purge_deletes` compacts; pick COW for few-large-
    partition deltas, MOR for many-partition scatter.

    The delta's schema must match the table exactly (evolution stays on
    the COW path, whose rewrite can align files); constraints are
    enforced the same as `commit_upsert`. Tombstones via `delete_col`
    contribute deletes only. Returns the new version."""
    prev_v = _resolve_version(spark, path, None)
    if expected_version is not None and prev_v != expected_version:
        raise CommitConflictError(
            f"table {path} is at version {prev_v}, not the expected "
            f"{expected_version}; re-derive the delta and retry"
        )
    prev = _read_commit(spark, path, prev_v)
    new_v = prev_v + 1
    upserts = delta.filter(~F.col(delete_col)) if delete_col else delta
    upserts = upserts.drop(*([delete_col] if delete_col else []))
    cur_schema = {
        f.name: f.dataType.simpleString()
        for f in read_version(spark, path, prev_v).schema.fields
    }
    new_schema = {f.name: f.dataType.simpleString() for f in upserts.schema.fields}
    if cur_schema != new_schema:
        raise ValueError(
            f"merge-on-read upsert schema {sorted(new_schema.items())} does "
            f"not match table schema {sorted(cur_schema.items())}; schema "
            "evolution goes through commit_upsert(evolve_schema=True)"
        )
    _enforce(
        upserts,
        prev,
        "upsert_mor",
        table=read_version(spark, path, prev_v),
        replace_keys=keys,
    )
    # position-delete every current row the delta's keys replace (or
    # tombstone): broadcast semi-join keyed on the delta — the fact side
    # is scanned once and never shuffled
    snap = _read_snapshot(spark, path, prev_v, with_position=True)
    hits = snap.join(
        F.broadcast(delta.select(*keys).distinct()), keys, "left_semi"
    ).select(F.col(_DV_FILE).alias("file"), F.col(_DV_POS).alias("pos"))
    data_root = os.path.join(path, _DATA_DIR)
    dv_dir = os.path.join(data_root, f"dv{new_v}")
    hits.write.mode("error").parquet(dv_dir)
    dv_rels = sorted(
        f[f.index(f"{_DATA_DIR}/dv{new_v}/") + len(_DATA_DIR) + 1 :]
        for f in list_data_files(spark, dv_dir)
    )
    pcols = prev["partition_cols"]
    rels = _write_snapshot_files(
        upserts, path, new_v, pcols,
        transforms=prev.get("partition_transforms"),
    )
    _commit(
        spark,
        path,
        new_v,
        prev["files"] + rels,
        pcols,
        "upsert_mor",
        prev.get("partition_types"),
        {
            **_carry(prev),
            "delete_files": (prev.get("delete_files") or []) + dv_rels,
            **(extra or {}),
        },
    )
    return new_v


def purge_deletes(spark: SparkSession, path: str) -> int:
    """File-scoped compaction of position-delete vectors: rewrite ONLY
    the data files some vector actually hits, carry every clean file
    unchanged, and commit with an empty vector list. This is the
    merge-on-read → copy-on-write transition (Iceberg's
    rewrite-position-deletes): run it when vectors accumulate past the
    broadcast-small read contract. Returns the new version (the current
    one if there is nothing to purge — no empty commit)."""
    prev_v = _resolve_version(spark, path, None)
    prev = _read_commit(spark, path, prev_v)
    delete_files = prev.get("delete_files") or []
    eq_entries = prev.get("eq_deletes") or []
    if not delete_files and not eq_entries:
        return prev_v
    data_root = os.path.join(path, _DATA_DIR)
    # vectors may reference files a later upsert already dropped — only
    # files still in the commit are dirty; |files|-scale driver state
    live = set(prev["files"])
    dirty_set: set[str] = set()
    if delete_files:
        dv = spark.read.parquet(
            *[os.path.join(data_root, f) for f in delete_files]
        )
        dirty_set |= {
            r["file"]
            for r in dv.select("file").distinct().collect()
            if r["file"] in live
        }
    if eq_entries:
        # THIS is where the equality deletes pay their scan: finding
        # which eligible files actually hold a matching key (the delete
        # commit itself scanned nothing). One raw read per entry,
        # semi-joined, distinct file list back to the driver.
        seqs = prev.get("file_seqs") or {}
        # _read_snapshot already applied every entry, so surviving rows
        # match NO entry — instead probe the raw eligible rows per entry
        for e in eq_entries:
            keys_df = (
                spark.read.parquet(
                    *[os.path.join(data_root, f) for f in e["files"]]
                )
                .select(*e.get("stored_keys", e["keys"]))
                .toDF(*e["keys"])
                .distinct()
            )
            eligible = sorted(
                f
                for f in prev["files"]
                if int(seqs.get(f, 0)) < int(e["version"])
            )
            if not eligible:
                continue
            raw = _read_snapshot(
                spark, path, prev_v, with_position=True,
                file_subset=set(eligible), apply_deletes=False,
            )
            hit = (
                raw.join(F.broadcast(keys_df), e["keys"], "left_semi")
                .select(_DV_FILE)
                .distinct()
                .collect()
            )
            dirty_set |= {r[_DV_FILE] for r in hit}
    dirty = sorted(dirty_set)
    new_v = prev_v + 1
    pcols = prev["partition_cols"]
    if dirty:
        snap = _read_snapshot(
            spark, path, prev_v, with_position=False, file_subset=set(dirty)
        )
        # old-schema files can predate additive evolution: align to the
        # committed column list with typed NULLs from the full snapshot
        cols = prev.get("columns")
        if cols and set(cols) - set(snap.columns):
            full = {
                f.name: f.dataType
                for f in read_version(spark, path, prev_v).schema.fields
            }
            for c in cols:
                if c not in snap.columns:
                    snap = snap.withColumn(c, F.lit(None).cast(full[c]))
            snap = snap.select(*cols)
        rels = _write_snapshot_files(
            snap, path, new_v, pcols,
            transforms=prev.get("partition_transforms"),
        )
    else:
        rels = []
    carried = [f for f in prev["files"] if f not in set(dirty)]
    _commit(
        spark,
        path,
        new_v,
        carried + rels,
        pcols,
        "purge_deletes",
        prev.get("partition_types"),
        {**_carry(prev), "delete_files": [], "eq_deletes": []},
    )
    return new_v


_CONSTRAINT_KINDS = {"check", "not_null", "unique"}


def _violations(
    df: DataFrame,
    constraints: list[dict],
    table: DataFrame | None = None,
    replace_keys: list[str] | None = None,
) -> dict[str, int]:
    """Per-constraint violation counts for `df` (the rows a commit is
    adding). All `check`/`not_null` rules fold into ONE aggregate pass
    over `df`; ANSI CHECK semantics (NULL/UNKNOWN passes — count_if on
    the negation counts only definite FALSE). A `unique` rule costs one
    duplicate count over `df` plus, when `table` is given, one
    broadcast-semi-join collision probe against the retained table rows
    (minus the rows `replace_keys` says `df` replaces) — i.e. one table
    scan per commit, the price of global uniqueness; NULL key values
    never collide (ANSI)."""
    bad: dict[str, int] = {}
    row_rules: list[tuple[str, Column]] = []
    for c in constraints:
        if c["kind"] == "check":
            row_rules.append((c["name"], F.expr(c["expr"])))
        elif c["kind"] == "not_null":
            for col in c["columns"]:
                row_rules.append((f"{c['name']}({col})", F.col(col).isNotNull()))
    if row_rules:
        r = df.agg(
            *[
                F.count_if(~e).alias(f"c{i}")
                for i, (_, e) in enumerate(row_rules)
            ]
        ).collect()[0]
        for i, (name, _) in enumerate(row_rules):
            if r[f"c{i}"]:
                bad[name] = bad.get(name, 0) + r[f"c{i}"]
    for c in constraints:
        if c["kind"] != "unique":
            continue
        u = c["columns"]
        n_bad = (
            df.groupBy(*u)
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > 1)
            .count()
        )
        if table is not None:
            retained = table
            if replace_keys:
                retained = retained.join(
                    df.select(*replace_keys).distinct(), replace_keys, "left_anti"
                )
            n_bad += retained.join(
                F.broadcast(df.select(*u).distinct()), u, "left_semi"
            ).count()
        if n_bad:
            bad[c["name"]] = bad.get(c["name"], 0) + int(n_bad)
    return bad


def _enforce(
    df: DataFrame,
    prev: dict,
    op: str,
    table: DataFrame | None,
    replace_keys: list[str] | None = None,
) -> None:
    cons = prev.get("constraints") or []
    if not cons:
        return
    bad = _violations(df, cons, table=table, replace_keys=replace_keys)
    if bad:
        raise ConstraintViolationError(
            f"{op} rejected: constraint violations {bad} (counts are "
            "violating incoming rows; fix the delta or drop_constraints)"
        )


def set_constraints(
    spark: SparkSession, path: str, constraints: list[dict]
) -> int:
    """Declare table constraints, enforced on every later append/upsert
    (the Delta `ADD CONSTRAINT` surface). Shapes:
      {"name": ..., "kind": "check",    "expr": "<sql over columns>"}
      {"name": ..., "kind": "not_null", "columns": [...]}
      {"name": ..., "kind": "unique",   "columns": [...]}
    The EXISTING snapshot must already satisfy them (validated here, one
    scan) — a constraint the data doesn't meet is a lie that would make
    every later commit's rejection message misleading. Metadata-only
    commit; replaces the whole constraint list (compose with
    `constraints_of` to add incrementally). Returns the new version."""
    for c in constraints:
        if not c.get("name") or c.get("kind") not in _CONSTRAINT_KINDS:
            raise ValueError(
                f"bad constraint {c!r}: need a name and kind in "
                f"{sorted(_CONSTRAINT_KINDS)}"
            )
        if c["kind"] == "check" and not c.get("expr"):
            raise ValueError(f"check constraint {c['name']!r} needs expr")
        if c["kind"] in ("not_null", "unique") and not c.get("columns"):
            raise ValueError(f"constraint {c['name']!r} needs columns")
    prev_v = _resolve_version(spark, path, None)
    prev = _read_commit(spark, path, prev_v)
    bad = _violations(read_version(spark, path, prev_v), constraints)
    if bad:
        raise ConstraintViolationError(
            f"existing data violates new constraints {bad}; clean the "
            "table first (delete_where / upsert) or fix the constraint"
        )
    _commit(
        spark,
        path,
        prev_v + 1,
        prev["files"],
        prev["partition_cols"],
        "set_constraints",
        prev.get("partition_types"),
        {**_carry(prev), "constraints": constraints},
    )
    return prev_v + 1


def drop_constraints(
    spark: SparkSession, path: str, names: list[str]
) -> int:
    """Remove constraints by name (metadata-only commit)."""
    prev_v = _resolve_version(spark, path, None)
    prev = _read_commit(spark, path, prev_v)
    keep = [
        c for c in (prev.get("constraints") or []) if c["name"] not in set(names)
    ]
    _commit(
        spark,
        path,
        prev_v + 1,
        prev["files"],
        prev["partition_cols"],
        "drop_constraints",
        prev.get("partition_types"),
        {**_carry(prev), "constraints": keep},
    )
    return prev_v + 1


def constraints_of(spark: SparkSession, path: str) -> list[dict]:
    """The current constraint list (empty for an unconstrained table)."""
    v = _resolve_version(spark, path, None)
    return _read_commit(spark, path, v).get("constraints") or []


def history(spark: SparkSession, path: str) -> list[dict]:
    """Commit metadata for every version (file lists elided to counts)."""
    out = []
    for v in _list_versions(spark, path):
        c = _read_commit(spark, path, v)
        out.append(
            {"version": v, "op": c["op"], "n_files": len(c["files"])}
        )
    return out


def diff_versions(
    spark: SparkSession,
    path: str,
    v_old: int,
    v_new: int,
    keys: list[str],
) -> DataFrame:
    """Keyed change classification between two pinned versions — time
    travel composed with `snapshot_diff` (added/removed/changed)."""
    from vptstools_spark.operators.scd import snapshot_diff

    return snapshot_diff(
        read_version(spark, path, v_old),
        read_version(spark, path, v_new),
        keys=keys,
    )


def _distinct_dv_targets(dv: DataFrame, dv_paths: list[str]) -> set[str]:
    """Distinct `file` targets of position-delete vectors. Driver-side
    pyarrow read of the (delta-sized) vector files when they are plain
    local paths; a distributed distinct+collect otherwise."""
    try:
        import pyarrow.parquet as pq

        out: set[str] = set()
        for p in dv_paths:
            local = p[7:] if p.startswith("file://") else p
            if "://" in local:
                raise OSError("non-local path")
            if os.path.isdir(local):
                parts = [
                    os.path.join(local, f)
                    for f in os.listdir(local)
                    if f.endswith(".parquet")
                ]
            else:
                parts = [local]
            for part in parts:
                out |= set(
                    pq.read_table(part, columns=["file"])
                    .column("file")
                    .unique()
                    .to_pylist()
                )
        return out
    except Exception:
        return {r["file"] for r in dv.select("file").distinct().collect()}


def table_changes(
    spark: SparkSession, path: str, from_version: int, to_version: int | None = None
) -> DataFrame:
    """Change data feed: every row-level change committed AFTER
    `from_version` up to `to_version` (default: latest), as the table's
    columns plus `_change_type` ('insert' | 'delete') and
    `_commit_version`. An update appears as its delete + insert pair
    (the Delta CDF convention without update coalescing).

    Cost model — the reason this exists next to `diff_versions`: for
    append / merge-on-read commits the feed is derived from the commit's
    OWN artifacts, never a snapshot join — files added by the commit are
    scanned as inserts, its new delete vectors are joined (vector side
    broadcast) back to the files they hit to materialize the deleted
    rows. So consuming a CDC stream's history costs O(changed data), not
    O(table). Copy-on-write commits (upsert/restore/overwrite, and any
    branch merge whose staged history rewrote files) rewrite whole
    partitions without recording which rows changed, so they fall back
    to a keyless full-row `exceptAll` diff of the two snapshots scoped
    to... the whole table — precise, but O(snapshot); prefer MOR commits
    when the feed matters. `set_constraints`/`drop_constraints`/
    `evolve_partitioning`/`purge_deletes`/`compact` commits change no
    rows and emit nothing.

    Classification is by ARTIFACT DIFF, not op-name allowlist: a commit
    that only ADDED files/vectors (whatever wrote it — append, MOR
    delete/upsert/update, an append-only branch merge) takes the
    O(changed data) path; a commit that removed or replaced any file or
    dropped any vector (rows may have been rewritten or resurrected)
    takes the exceptAll fallback — unknown future ops degrade to
    correct-but-slower, never to silent omission. The explicitly
    row-preserving rewrites (purge_deletes, compact) are the only
    removal-shaped ops allowed to emit nothing."""
    to_v = _resolve_version(spark, path, to_version)
    # from_version is an EXCLUSIVE low bound and need not exist: -1 (or
    # anything below the first version) means "from the beginning,
    # including the initial commit"
    surviving = _list_versions(spark, path)
    versions = [v for v in surviving if from_version < v <= to_v]
    # expire_versions can leave gaps (tagged survivors below expired
    # neighbors): the first version after a gap needs commit v-1 to
    # classify its artifact diff, and that history is GONE — fail with
    # the contract error, not a raw sidecar-read miss (Delta CDF raises
    # the same way when requested history has been vacuumed)
    surviving_set = set(surviving)
    for v in versions:
        if v > 0 and (v - 1) not in surviving_set:
            raise ValueError(
                f"change feed unavailable: commit {v - 1} (needed to "
                f"derive changes of commit {v}) was expired — history "
                f"between from_version={from_version} and {v} is gone; "
                "re-baseline the consumer from a snapshot read "
                "(read_version) instead"
            )
    data_root = os.path.join(path, _DATA_DIR)
    snap_cols: list[str] | None = None
    out: DataFrame | None = None
    # the feed presents every change under the TO-version's column names
    # (Delta CDF semantics): pieces read at earlier versions carry those
    # versions' pre-rename names and fold forward here
    to_hist = _read_commit(spark, path, to_v).get("rename_history") or []

    def tag(df: DataFrame, change: str, v: int) -> DataFrame:
        return df.select(
            *[F.col(c) for c in df.columns if not c.startswith("__dv_")],
            F.lit(change).alias("_change_type"),
            F.lit(v).alias("_commit_version"),
        )

    for v in versions:
        commit = _read_commit(spark, path, v)
        prev = (
            _read_commit(spark, path, v - 1)
            if v > 0
            else {"files": [], "delete_files": []}
        )
        op = commit["op"]
        removed_files = set(prev["files"]) - set(commit["files"])
        removed_dvs = set(prev.get("delete_files") or []) - set(
            commit.get("delete_files") or []
        )
        pieces: list[DataFrame] = []
        # equality-delete entries NEW to this commit (delete_where_eq and
        # the entry half of commit_upsert_eq): no artifact on the data
        # files — derive the deleted rows by semi-joining the PRIOR
        # snapshot (deletes applied, so already-gone rows don't re-emit;
        # the strict seq rule exempts this commit's own files, and every
        # v-1 file is eligible by construction) with the key tuples
        prev_entries = prev.get("eq_deletes") or []
        new_eqs = [
            e
            for e in commit.get("eq_deletes") or []
            if e not in prev_entries
        ]
        if new_eqs:
            old = read_version(spark, path, v - 1)
            for e in new_eqs:
                keys_df = (
                    spark.read.parquet(
                        *[os.path.join(data_root, f) for f in e["files"]]
                    )
                    .select(*e.get("stored_keys", e["keys"]))
                    .toDF(*e["keys"])
                    .distinct()
                )
                cond = None
                for k in e["keys"]:
                    c = old[k].eqNullSafe(keys_df[k])
                    cond = c if cond is None else (cond & c)
                pieces.append(
                    tag(old.join(F.broadcast(keys_df), cond, "left_semi"),
                        "delete", v)
                )
        if op in (
            "set_constraints",
            "drop_constraints",
            "evolve_partitioning",
            "purge_deletes",
            "compact",
            "cluster",
            "widen_types",
            "delete_eq",
        ):
            pass  # metadata-only / row-preserving / eq-entry-only commits
        elif op != "initial" and not removed_files and not removed_dvs:
            # additive-only artifacts (append / MOR delete/upsert/update /
            # append-only branch merge / any future additive op): the feed
            # IS the commit's own artifacts
            new_files = sorted(set(commit["files"]) - set(prev["files"]))
            new_dvs = sorted(
                set(commit.get("delete_files") or [])
                - set(prev.get("delete_files") or [])
            )
            hit_files: set[str] = set()
            dv = None
            if new_dvs:
                dv_paths = [os.path.join(data_root, f) for f in new_dvs]
                dv = spark.read.schema(_DV_READ_SCHEMA).parquet(*dv_paths)
                # vector sidecars are delta-sized; their distinct target
                # list is metadata — read it on the driver via pyarrow
                # (memoized per immutable dv path) instead of paying a
                # full Spark job (+ scheduling) per MOR commit in the
                # gap. Non-local filesystems fall back to the
                # distributed read.
                hit_files = _dv_targets_cached(
                    spark, data_root, new_dvs
                ) & set(prev["files"])
            if (
                new_files
                and hit_files
                and len(new_files) <= 64
                # eq-delete entries are applied inside the snapshot read
                # the two-piece shape uses; the merged raw scan skips
                # them, so tables carrying eq entries keep the safe path
                and not prev.get("eq_deletes")
                and not commit.get("eq_deletes")
            ):
                # MERGED piece for the steady MOR-upsert shape (new files
                # + vectors hitting old files): ONE raw scan of both file
                # groups replaces the two separate snapshot assemblies —
                # half the scan plan, one broadcast. Rows from the NEW
                # files are inserts (a commit's vectors never target its
                # own files); rows from the HIT old files are deletes iff
                # a new vector names their position AND they were still
                # visible at v-1 (anti-join against the carried vectors
                # that target the hit files — usually none, checked via
                # the memoized target sets). The new-file test is an
                # isin over ≤64 relative paths; larger commits keep the
                # two-piece shape below.
                raw = _read_snapshot(
                    spark,
                    path,
                    v,
                    with_position=True,
                    file_subset=set(new_files) | hit_files,
                    apply_deletes=False,
                )
                carried = [
                    f
                    for f in (prev.get("delete_files") or [])
                    if _dv_targets_cached(spark, data_root, [f]) & hit_files
                ]
                if carried:
                    cdv = spark.read.schema(_DV_READ_SCHEMA).parquet(
                        *[os.path.join(data_root, f) for f in carried]
                    )
                    raw = raw.join(
                        F.broadcast(cdv),
                        (raw[_DV_FILE] == cdv["file"])
                        & (raw[_DV_POS] == cdv["pos"]),
                        "left_anti",
                    )
                is_new = F.col(_DV_FILE).isin(new_files)
                # one commit derives its vectors from ONE positioned read,
                # so (file, pos) is unique within the commit — no dedupe
                # pass needed before the classifying left join
                dvu = dv.withColumn("__dv_hit", F.lit(True))
                merged = (
                    raw.join(
                        F.broadcast(dvu),
                        (raw[_DV_FILE] == dvu["file"])
                        & (raw[_DV_POS] == dvu["pos"]),
                        "left",
                    )
                    .filter(is_new | F.col("__dv_hit"))
                    .select(
                        *[
                            raw[c]
                            for c in raw.columns
                            if not c.startswith("__dv_")
                        ],
                        F.when(is_new, F.lit("insert"))
                        .otherwise(F.lit("delete"))
                        .alias("_change_type"),
                        F.lit(v).alias("_commit_version"),
                    )
                )
                pieces.append(merged)
            else:
                if new_files:
                    pieces.append(
                        tag(
                            _read_snapshot(
                                spark, path, v, file_subset=set(new_files)
                            ),
                            "insert",
                            v,
                        )
                    )
                if hit_files:
                    # the deleted rows, AS OF the prior version, restricted
                    # to the files the new vectors hit (semi-join keeps
                    # only vector-matched positions; vector side broadcast)
                    old = _read_snapshot(
                        spark,
                        path,
                        v - 1,
                        with_position=True,
                        file_subset=hit_files,
                    )
                    deleted = old.join(
                        F.broadcast(dv),
                        (old[_DV_FILE] == dv["file"])
                        & (old[_DV_POS] == dv["pos"]),
                        "left_semi",
                    )
                    pieces.append(tag(deleted, "delete", v))
        else:
            if op == "initial":
                pieces.append(tag(_read_snapshot(spark, path, v), "insert", v))
            else:
                # COW rewrite: no per-row record — keyless multiset diff
                new_s = _read_snapshot(spark, path, v)
                old_s = _read_snapshot(spark, path, v - 1)
                # an evolving upsert adds columns the old snapshot lacks:
                # align with typed NULLs (old rows read NULL for them, so
                # unchanged rows still cancel in the diff)
                new_types = {f.name: f.dataType for f in new_s.schema.fields}
                for c in new_s.columns:
                    if c not in old_s.columns:
                        old_s = old_s.withColumn(c, F.lit(None).cast(new_types[c]))
                old_s = old_s.select(*new_s.columns)
                pieces.append(tag(new_s.exceptAll(old_s), "insert", v))
                pieces.append(tag(old_s.exceptAll(new_s), "delete", v))
        for p in pieces:
            for m in to_hist[len(commit.get("rename_history") or []) :]:
                for old, new in m.items():
                    p = p.withColumnRenamed(old, new)
            if snap_cols is None:
                snap_cols = p.columns
            p = p.select(*snap_cols) if set(p.columns) == set(snap_cols) else p
            out = p if out is None else out.unionByName(
                p, allowMissingColumns=True
            )
    if out is None:
        # no row-changing commits in range: empty frame with the table's
        # schema + feed columns
        base = read_version(spark, path, to_v)
        return (
            base.select(
                "*",
                F.lit("insert").alias("_change_type"),
                F.lit(0).alias("_commit_version"),
            )
            .limit(0)
        )
    return out


def changed_partitions(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int | None = None,
    partition_cols: list[str] | None = None,
) -> list[tuple]:
    """Distinct partition tuples touched by any change in
    (`from_version`, `to_version`] — the worklist an incremental
    consumer (e.g. `plans/matview.py:refresh_matview`) needs. Derived
    from the change data feed, so for MOR commit histories the cost is
    O(changed data), where the `diff_versions`-based derivation pays a
    full-snapshot key join. Returns driver-side tuples (|partitions|
    scale, same as the MV worklist contract)."""
    pcols = partition_cols or _read_commit(
        spark, path, _resolve_version(spark, path, to_version)
    )["partition_cols"]
    if not pcols:
        raise ValueError(f"table {path} is unpartitioned")
    ch = table_changes(spark, path, from_version, to_version)
    rows = ch.select(*pcols).distinct().collect()
    return [tuple(r[c] for c in pcols) for r in rows]


def _list_fs_children(spark: SparkSession, dir_path: str) -> list[str]:
    """Child names of a directory via the Hadoop FS API ([] if absent) —
    works on any configured filesystem, not just local."""
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(dir_path)
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return []
    return sorted(st.getPath().getName() for st in fs.listStatus(p))


def _list_branch_names(spark: SparkSession, path: str) -> list[str]:
    return _list_fs_children(spark, os.path.join(path, _BRANCH_LOG_ROOT))


def _tagged_versions(spark: SparkSession, path: str) -> set[int]:
    refs_dir = os.path.join(path, _REFS_DIR)
    out: set[int] = set()
    for name in _list_fs_children(spark, refs_dir):
        if name.endswith(".json"):
            ref = json.loads(
                read_text_sidecar(spark, os.path.join(refs_dir, name))
            )
            out.add(int(ref["version"]))
    return out


def restore_version(spark: SparkSession, path: str, version: int) -> int:
    """Delta-style RESTORE: make `version`'s snapshot the new LATEST by
    writing a new commit that references the OLD version's files — a
    metadata-only rollback (no data rewrite, KB-scale commit) that keeps
    the bad intermediate versions readable for forensics instead of
    deleting history. Returns the new version number.

    Publishes through the same atomic create-exclusive as every commit,
    so a restore racing an upsert has exactly one winner."""
    versions = _list_versions(spark, path)
    if not versions:
        raise ValueError(f"no table at {path}")
    if version not in versions:
        raise ValueError(
            f"cannot restore to version {version}; available: "
            f"{versions[0]}..{versions[-1]}"
        )
    src = _read_commit(spark, path, version)
    new_v = versions[-1] + 1
    _commit(
        spark,
        path,
        new_v,
        src["files"],
        src["partition_cols"],
        f"restore({version})",
        src.get("partition_types"),
        # the restored snapshot's column order, delete vectors, and
        # constraints are part of its identity — dropping them here would
        # re-order evolved schemas and resurrect deleted rows
        _carry(src),
    )
    return new_v


def expire_versions(
    spark: SparkSession,
    path: str,
    keep_last: int,
    min_age_seconds: float | None = None,
) -> list[int]:
    """Explicitly drop the commit entries (NOT the data files) of all but
    the last `keep_last` versions; returns the expired version numbers.
    Physical file deletion is left to a separate vacuum that checks no
    surviving commit references a file — never a write-path side effect,
    so a session that already pinned an expired version keeps reading its
    files; only NEW `read_version` calls get the expired-version error.

    Retention guard: `keep_last` must be >= 1 — expiring the latest
    version would leave the table unreadable; a table-drop must be an
    explicit filesystem operation, never an expiry edge case. TAGGED
    versions (plans/branches.py:create_tag) are skipped: a tag is an
    explicit promise that a named snapshot stays readable, so retention
    sweeps walk around it until the tag is deleted."""
    if keep_last < 1:
        raise ValueError(
            f"keep_last must be >= 1 (got {keep_last}); refusing to expire "
            "the current version — drop the table explicitly instead"
        )
    versions = _list_versions(spark, path)
    tagged = _tagged_versions(spark, path)
    expired = [v for v in versions[:-keep_last] if v not in tagged]
    if min_age_seconds is not None:
        # age-based grace: never expire a commit younger than the window,
        # however many newer versions exist — the operator's guarantee to
        # sessions still holding recent pinned reads (commit times are
        # epoch seconds; pre-timestamp commits count as infinitely old)
        import time

        cutoff = time.time() - min_age_seconds
        expired = [
            v
            for v in expired
            if float(_read_commit(spark, path, v).get("ts") or 0.0) <= cutoff
        ]
    if expired:
        # the O(1)-open hint's safety invariant: expiry may create gaps
        # BELOW the head, so the hint must name the head (or newer)
        # before any commit entry disappears — otherwise a stale hint's
        # forward probe could stop at a pre-gap survivor. Refuse to
        # expire if the hint cannot be pinned.
        from vptstools_spark.io import write_text_overwrite

        if not write_text_overwrite(
            spark,
            _latest_hint_path(path),
            json.dumps({"version": versions[-1]}),
        ):
            raise RuntimeError(
                f"could not update the _latest hint of {path}; refusing "
                "to expire history (a stale hint over an expiry gap "
                "would misresolve the head)"
            )
    # format-2 safety: a surviving DELTA commit whose parent is about to
    # be expired would lose its resolution chain — pin a full checkpoint
    # for every survivor that sits directly above an expiry gap BEFORE
    # any log file disappears (resolution prefers ckpt files, so the
    # chain walk stops there forever after). Pin writes must be DURABLE:
    # the parent logs are deleted next, so a silently-dropped pin would
    # leave the survivor's chain walking into deleted files forever —
    # use the raising writer and abort the whole expiry on any failure
    # (nothing has been deleted yet; the expiry is safely retryable).
    if expired:
        expired_set = set(expired)
        for s in versions:
            if s in expired_set or (s - 1) not in expired_set:
                continue
            raw = _read_commit_raw(spark, path, s)
            if int(raw.get("format") or 1) >= _COMMIT_FORMAT_V2:
                try:
                    write_text_sidecar(
                        spark,
                        _ckpt_path(path, s),
                        json.dumps(_read_commit(spark, path, s)),
                    )
                except Exception as exc:
                    raise RuntimeError(
                        f"could not pin survivor checkpoint v{s} of "
                        f"{path}; aborting expiry before any log "
                        "deletion (an unpinned survivor above an expiry "
                        "gap would become permanently unresolvable)"
                    ) from exc
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for v in expired:
        p = jvm.org.apache.hadoop.fs.Path(_log_path(path, v))
        p.getFileSystem(hconf).delete(p, False)
        # an expired version's checkpoint can never be consulted again
        # (no surviving chain walks THROUGH an expired version — each
        # survivor above a gap carries its own pin) — reclaim it
        cp = jvm.org.apache.hadoop.fs.Path(_ckpt_path(path, v))
        cp.getFileSystem(hconf).delete(cp, False)
    return expired


#: write-intent sidecars: a transaction that prepares data files long
#: before publishing (the OCC protocols in plans/occ.py — a rebase loop
#: can hold prepared files across arbitrary wall-clock time) registers
#: its collision-free dir label here BEFORE writing any file; vacuum
#: treats every intent-registered label as referenced regardless of file
#: age, closing the race the age gate only narrows. Intents are cleared
#: in a finally block by the writer (success OR failure — an aborted
#: transaction's files become reclaimable the moment the intent drops).
#: A crashed writer leaves a stale intent: `clean_stale_intents` removes
#: those after an operator-chosen age, as an explicit maintenance step —
#: vacuum itself NEVER expires an intent (guessing a writer is dead is
#: exactly the bug this mechanism exists to prevent).
_INTENT_DIR = "_intents"


def register_write_intent(spark: SparkSession, path: str, label: str) -> None:
    """Declare that a transaction is about to write files under
    `<data_dir>/<label>/`. Must be called BEFORE the first file is
    written; pair with `clear_write_intent` in a finally block."""
    import time

    write_text_sidecar(
        spark,
        os.path.join(path, _INTENT_DIR, f"{label}.json"),
        json.dumps({"label": label, "ts": time.time()}),
    )


def clear_write_intent(spark: SparkSession, path: str, label: str) -> None:
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(
        os.path.join(path, _INTENT_DIR, f"{label}.json")
    )
    p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration()).delete(
        p, False
    )


def _active_intent_labels(spark: SparkSession, path: str) -> set[str]:
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(os.path.join(path, _INTENT_DIR))
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return set()
    out = set()
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.endswith(".json"):
            out.add(name[:-5])
    return out


def clean_stale_intents(
    spark: SparkSession, path: str, min_age_seconds: float = 86400.0
) -> list[str]:
    """Drop intent sidecars older than `min_age_seconds` (default 24 h) —
    the EXPLICIT operator decision that a registered writer is dead.
    Returns the removed labels. Run this before vacuum on tables where
    crashed transactions are suspected; never automatic."""
    import time

    cutoff = time.time() - min_age_seconds
    removed = []
    for label in sorted(_active_intent_labels(spark, path)):
        try:
            doc = json.loads(
                read_text_sidecar(
                    spark, os.path.join(path, _INTENT_DIR, f"{label}.json")
                )
            )
        except Exception:
            continue
        if float(doc.get("ts") or 0.0) <= cutoff:
            clear_write_intent(spark, path, label)
            removed.append(label)
    return removed


def vacuum_table(
    spark: SparkSession,
    path: str,
    dry_run: bool = False,
    min_age_seconds: float = 3600.0,
) -> list[str]:
    """Physically delete data files referenced by NO surviving commit —
    the second half of the expiry story (`expire_versions` drops commit
    entries; this reclaims the storage) plus orphan cleanup for lost
    commit races. Returns the deleted files' table-relative paths.

    Safety: the reference set is the union of every SURVIVING commit's
    file list, so a file shared across versions lives until its last
    referencing commit expires; a session holding a pinned plan to an
    expired version loses it only here — vacuum is the explicitly
    destructive step, separated from expiry exactly so operators can
    sequence grace periods between the two; `dry_run=True` returns the
    same list WITHOUT deleting — audit what a vacuum would reclaim before
    committing to it (the Delta `VACUUM ... DRY RUN` shape). BRANCH commits
    (plans/branches.py) reference files in the shared data dir too, so
    every surviving branch-log commit joins the reachability set — a
    file is reclaimable only when no main version AND no branch version
    lists it.

    In-flight-writer guard: every commit protocol here writes its data
    (and delete-vector) files BEFORE publishing the commit JSON, so a
    concurrent writer's files look unreferenced during that window; a
    vacuum running then would delete them and the writer would publish a
    commit pointing at vanished files — an unreadable version. Delta's
    VACUUM gates on file age for exactly this reason, so unreferenced
    files younger than `min_age_seconds` (default 1 h, mirroring
    `expire_versions`' grace window) are SKIPPED — pass 0 only when no
    concurrent writer can exist (single-writer tests/maintenance).
    The age gate alone cannot protect an OCC transaction whose rebase
    loop outlives the window, so the atomic ops ALSO register write
    INTENTS (`register_write_intent`): any file under an
    intent-registered dir label is skipped regardless of age, and the
    intent drops (writer's finally) the moment the transaction publishes
    or aborts. Stale intents from crashed writers are an explicit
    operator cleanup (`clean_stale_intents`), never vacuum's guess."""
    intent_labels = _active_intent_labels(spark, path)
    referenced: set[str] = set()
    logs = [_LOG_DIR] + [
        os.path.join(_BRANCH_LOG_ROOT, b)
        for b in _list_branch_names(spark, path)
    ]
    for log_dir in logs:
        for v in _list_versions(spark, path, log_dir):
            c = _read_commit(spark, path, v, log_dir)
            referenced |= set(c["files"])
            # position-delete sidecars are live data too: deleting one
            # would silently RESURRECT rows in every surviving commit
            # that lists it
            referenced |= set(c.get("delete_files") or [])
            for e in c.get("eq_deletes") or []:
                referenced |= set(e["files"])
    import time

    data_root = os.path.join(path, _DATA_DIR)
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    marker = f"/{_DATA_DIR}/"
    cutoff_ms = (time.time() - min_age_seconds) * 1000.0
    removed = []
    for f in sorted(list_data_files(spark, data_root)):
        idx = f.rindex(marker)
        rel = f[idx + len(marker) :]
        if rel.split("/", 1)[0] in intent_labels:
            continue  # an in-flight transaction registered this dir
        if rel not in referenced:
            p = jvm.org.apache.hadoop.fs.Path(f)
            fs = p.getFileSystem(hconf)
            if min_age_seconds > 0:
                mtime = fs.getFileStatus(p).getModificationTime()
                if mtime > cutoff_ms:
                    continue  # possibly an in-flight writer's file
            if not dry_run:
                fs.delete(p, False)
            removed.append(rel)
    return removed


# -------------------------------------------------------- metadata tables


def files_metadata(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Iceberg-`files`-style metadata TABLE for one snapshot: one row per
    data file with its partition values, byte size, and the version dir
    it was written under — assembled from the commit's file list plus one
    filesystem stat per file (a metadata operation; no data scan). The
    `introduced_in` column is the version-dir label, so "which commit
    wrote this file" is answerable without walking history."""
    from urllib.parse import unquote

    v = _resolve_version(spark, path, version)
    commit = _read_commit(spark, path, v)
    pcols = commit["partition_cols"]
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    rows = []
    for rel in commit["files"]:
        p = jvm.org.apache.hadoop.fs.Path(
            os.path.join(path, _DATA_DIR, rel)
        )
        size = int(p.getFileSystem(hconf).getFileStatus(p).getLen())
        # surface LOGICAL partition values, not raw hive dir renderings:
        # unescape percent-escapes and map the null sentinel to None —
        # the same inverse of merge.escape_partition_segment the
        # streaming source's _partition_values applies, so the two
        # metadata faces agree
        vals = tuple(
            None
            if x is None or x == "__HIVE_DEFAULT_PARTITION__"
            else unquote(x)
            for x in _partition_of(rel, pcols)
        )
        rows.append((rel, rel.split("/", 1)[0], size) + vals)
    schema = "file string, introduced_in string, size_bytes long"
    for c in pcols:
        schema += f", `{c}` string"
    out = spark.createDataFrame(rows, schema)
    for c, dt in (commit.get("partition_types") or {}).items():
        # retired spec columns (after evolve_partitioning) keep a type
        # entry for carried files' reads but are absent here
        if c in out.columns:
            out = out.withColumn(c, F.col(c).cast(dt))
    return out


def snapshot_rowcount(
    spark: SparkSession, path: str, version: int | None = None
) -> int:
    """COUNT(*) of a snapshot from COMMIT METADATA — no data scan (the
    Iceberg manifests-answer-count trick): every commit records per-file
    footer row counts (`file_rows`, maintained by `_commit`), so the
    count is Σ file rows − the position-delete rows that still reference
    a live file. Vector contents are read driver-side (they are
    broadcast-small by table contract) and deduplicated on (file, pos),
    and positions pointing at files no longer in the snapshot (e.g. a
    compaction rewrote the victim but carried the vector) are ignored —
    over-subtraction is structurally impossible. Un-purged EQUALITY
    delete entries make the count data-dependent (their matches live in
    row values, not metadata); that one case falls back to the real
    scan, and `purge_deletes` restores the metadata path."""
    import pyarrow.fs as pafs
    import pyarrow.parquet as pq

    v = _resolve_version(spark, path, version)
    commit = _read_commit(spark, path, v)
    if commit.get("eq_deletes"):
        return read_version(spark, path, v).count()
    file_rows = commit.get("file_rows") or {}
    total = 0
    for f in commit["files"]:
        total += (
            file_rows[f]
            if f in file_rows
            else _footer_rowcount(os.path.join(path, _DATA_DIR, f))
        )
    live = set(commit["files"])
    seen: set[tuple[str, int]] = set()
    fs = pafs.LocalFileSystem()
    for vf in commit.get("delete_files") or []:
        abs_vf = os.path.join(path, _DATA_DIR, vf)
        t = pq.read_table(abs_vf, filesystem=fs)
        for file_, pos in zip(
            t.column("file").to_pylist(), t.column("pos").to_pylist()
        ):
            if file_ in live:
                seen.add((file_, int(pos)))
    return total - len(seen)


def partitions_metadata(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Iceberg-`partitions`-style rollup of `files_metadata`: per
    partition tuple, file count and total bytes — the table an operator
    reads before deciding what to compact, and a small-files report for
    free (files-per-partition vs bytes-per-partition)."""
    f = files_metadata(spark, path, version)
    pcols = [
        c for c in f.columns
        if c not in ("file", "introduced_in", "size_bytes")
    ]
    return f.groupBy(*pcols).agg(
        F.count("*").alias("n_files"),
        F.sum("size_bytes").alias("total_bytes"),
    )


def history_metadata(spark: SparkSession, path: str) -> DataFrame:
    """`history` as a DataFrame (version, op, n_files, n_delete_files,
    n_constraints) — the SQL-joinable face of the commit log."""
    rows = []
    for v in _list_versions(spark, path):
        c = _read_commit(spark, path, v)
        rows.append(
            (
                v,
                c["op"],
                float(c.get("ts") or 0.0),
                len(c["files"]),
                len(c.get("delete_files") or []),
                len(c.get("constraints") or []),
            )
        )
    return spark.createDataFrame(
        rows,
        "version int, op string, commit_ts double, n_files int, "
        "n_delete_files int, n_constraints int",
    )
