"""Streaming CHANGE-DATA-FEED source over versioned tables
(`plans/timetravel.py`) — the read-side complement of the commit sinks:
`spark.readStream.format("table_changes").load(table_path)` yields every
row-level change as (table columns…, _change_type, _commit_version),
exactly once, resuming from the checkpoint across restarts. This is the
Delta `readStream` + `readChangeFeed` shape re-expressed with Spark 4's
Python DataSource API (public: pyspark.sql.datasource).

Design — why this scales:

- The OFFSET is a commit version number ({"version": N}) — O(1)
  checkpoint state regardless of history length, like the ODIM source's
  filename watermark (odim_datasource.py).
- Micro-batch planning reads ONLY the commit JSONs in the version range
  (KB-scale driver work). Each merge-on-read commit decomposes into
  per-file tasks: files the commit ADDED become insert tasks; delete
  vectors it added become delete tasks (data file + the vector files
  that hit it). Executors read just those parquet files with pyarrow —
  O(changed data) per trigger, the fact table is never rescanned.
- COPY-ON-WRITE commits (upsert/restore/overwrite) rewrite partitions
  without recording which rows changed; deriving their feed needs a
  distributed snapshot diff, which a source task cannot do. Exactly like
  Delta's streaming source, the stream FAILS on such a commit unless
  `.option("skipChangeCommits", "true")` opts into skipping them —
  an explicit, documented gap rather than a silent wrong answer. Prefer
  MOR commits (`commit_append`/`delete_where`/`commit_upsert_mor`/
  `update_where`) on tables that feed streams.
- `startingVersion` (default 0 = full history incl. the initial
  snapshot, or "latest" = only future commits) mirrors Delta's option.

Schema is pinned at stream start from the latest commit (recorded column
order + a data-file footer + the commit's partition types); files written
before additive schema evolution read NULL for later columns. Mid-stream
evolution keeps the pinned schema — restart the stream to pick up new
columns (Delta semantics).

IO goes through pyarrow.fs URIs, so the same source reads local, HDFS or
s3 paths without the JVM; batch-side consumers keep using
`plans/timetravel.py:table_changes` (whose reads are JVM parquet scans).
"""

from __future__ import annotations

import json
import os
import posixpath

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_LOG_DIR = "_log"
_DATA_DIR = "data"
#: ops that change no rows: metadata-only commits plus the explicitly
#: row-preserving rewrites (purge folds vectors in, compact bin-packs)
_NOOP_OPS = {
    "set_constraints",
    "drop_constraints",
    "evolve_partitioning",
    "purge_deletes",
    "compact",
    # full-snapshot z-order re-cluster: row-preserving rewrite
    "cluster",
}


def _fs_for(path: str):
    """(pyarrow FileSystem, fs-local path) for a local path or URI."""
    import pyarrow.fs as pafs

    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def _read_json(path: str) -> dict:
    fs, p = _fs_for(path)
    with fs.open_input_stream(p) as fh:
        return json.loads(fh.read().decode("utf-8"))


def _list_versions(table_path: str) -> list[int]:
    import pyarrow.fs as pafs

    fs, p = _fs_for(posixpath.join(table_path, _LOG_DIR))
    try:
        infos = fs.get_file_info(pafs.FileSelector(p))
    except FileNotFoundError:
        return []
    out = []
    for fi in infos:
        name = os.path.basename(fi.path)
        if name.endswith(".json"):
            out.append(int(name[:-5]))
    return sorted(out)


#: resolved-commit memo — the offset planner re-reads the same commits
#: every trigger; entries are immutable once published. Keyed per
#: (table, creation-epoch, version), bounded FIFO. The epoch (mtime of the
#: table's version-0 commit file) makes the key recreation-proof: a table
#: dropped and recreated at the same path rewrites 00000000.json, so a
#: long-lived DataSource worker can never serve the OLD table's commit
#: docs (wrong files/schema) for the new one — driver-side invalidation
#: (`timetravel._invalidate_resolved`) cannot reach worker processes.
_RESOLVED_MEMO: dict = {}
_RESOLVED_MEMO_MAX = 512


def _table_epoch(table_path: str):
    """Creation identity of the table at `table_path`: mtime of its first
    commit file. One stat per `_read_commit` call — trivial next to the
    chain of JSON reads the memo exists to avoid."""
    fs, p = _fs_for(posixpath.join(table_path, _LOG_DIR, "00000000.json"))
    try:
        info = fs.get_file_info(p)
        return getattr(info, "mtime_ns", None) or str(info.mtime)
    except Exception:
        return None


def _read_commit(table_path: str, version: int) -> dict:
    """Fully-RESOLVED commit doc, both log formats (format 2 stores
    O(changed files) deltas — resolution mirrors
    plans/timetravel.py:_read_commit but stays pyarrow-only: this module
    runs inside Python DataSource workers with no SparkSession/JVM)."""
    epoch = _table_epoch(table_path)
    key = (table_path, epoch, version)
    hit = _RESOLVED_MEMO.get(key)
    if hit is not None:
        return hit
    from vptstools_spark.plans.timetravel import _apply_commit_delta

    chain: list[dict] = []
    v = version
    base: dict | None = None
    while True:
        hit = _RESOLVED_MEMO.get((table_path, epoch, v))
        if hit is not None:
            base = hit
            break
        try:
            base = _read_json(
                posixpath.join(
                    table_path, _LOG_DIR, "_ckpt", f"{v:08d}.json"
                )
            )
            break
        except Exception:
            pass
        raw = _read_json(
            posixpath.join(table_path, _LOG_DIR, f"{v:08d}.json")
        )
        if int(raw.get("format") or 1) < 2:
            base = raw
            break
        chain.append(raw)
        v = int(raw["base"])
    for raw in reversed(chain):
        base = _apply_commit_delta(base, raw)
    while len(_RESOLVED_MEMO) > _RESOLVED_MEMO_MAX:
        _RESOLVED_MEMO.pop(next(iter(_RESOLVED_MEMO)))
    _RESOLVED_MEMO[key] = base
    return base


def _partition_values(rel_file: str, pcols: list[str]) -> dict[str, str | None]:
    """Hive `col=value` path segments of a commit-relative file, unescaped
    (inverse of merge.escape_partition_segment); missing segment → absent
    key (pre-evolution file), __HIVE_DEFAULT_PARTITION__ → None."""
    from urllib.parse import unquote

    vals: dict[str, str | None] = {}
    for seg in rel_file.split("/"):
        if "=" in seg:
            k, _, v = seg.partition("=")
            if k in pcols:
                vals[k] = None if v == "__HIVE_DEFAULT_PARTITION__" else unquote(v)
    return vals


def _rename_fold(pin_hist: list[dict], epoch: int) -> dict[str, str]:
    """Flattened write-time-name → PINNED-name map for a file written at
    schema `epoch`, under the pinned commit's full rename history
    (plans/timetravel.py rename_columns) — folded so chained renames
    resolve in one hop. The pinned history (not the processing version's)
    is the right frame: the stream presents every change under the names
    its schema was pinned with."""
    fold: dict[str, str] = {}  # original file column -> pinned name
    for m in pin_hist[epoch:]:
        # advance existing chains, then start chains for names the file
        # may carry directly (a file at this epoch cannot contain a name
        # an earlier rename freed, so plain setdefault is safe)
        fold = {orig: m.get(cur, cur) for orig, cur in fold.items()}
        for old, new in m.items():
            fold.setdefault(old, new)
    return {o: n for o, n in fold.items() if o != n}


def _file_epoch(commit: dict, rel_file: str) -> int:
    """A file's schema epoch per the commit that references it: recorded
    in the commit's complete epoch map once renames exist; files of a
    commit with no recorded history predate every rename (epoch 0), and
    files absent from an existing map are new to that commit (= current
    epoch)."""
    hist = commit.get("rename_history") or []
    return (commit.get("file_epochs") or {}).get(rel_file, len(hist))


class _ChangeTask(InputPartition):
    """One executor task: either the INSERT rows of some added data files
    or the DELETE rows one data file lost to new vectors."""

    def __init__(
        self,
        kind: str,  # "insert" | "delete"
        version: int,
        data_files: list[str],  # commit-relative
        positions: list[int] | None,  # delete tasks: row indices in the file
        renames: dict[str, str] | None = None,  # old->final column names
        dv_files: list[str] | None = None,  # spilled-positions sidecar refs
    ):
        self.kind = kind
        self.version = version
        self.data_files = data_files
        # positions=None => the list was too large to inline in a task
        # descriptor; the executor re-derives it from dv_files (the
        # commit's vector parquets, filtered to this data file)
        self.positions = positions
        self.renames = renames or {}
        self.dv_files = dv_files or []


class TableChangesStreamReader(DataSourceStreamReader):
    #: added data files packed per insert task (delete tasks are per file)
    FILES_PER_TASK = 8
    #: delete-position lists above this length are NOT inlined into the
    #: task descriptor (task bytes ship through the driver); the executor
    #: re-derives them from the commit's vector sidecars instead
    MAX_INLINE_POSITIONS = 50_000

    def __init__(self, options: dict, schema_json: str):
        self.path = options.get("path")
        if not self.path:
            raise ValueError(
                "table_changes stream requires the table path, "
                "e.g. .load('/warehouse/orders')"
            )
        self.skip_change_commits = (
            str(options.get("skipChangeCommits", "false")).lower() == "true"
        )
        # admission control (Delta's maxFilesPerTrigger shape, keyed on
        # versions — the unit our offset advances by): without it a
        # stream cold-starting against a long backlog plans ONE
        # micro-batch spanning every pending commit
        mvpt = options.get("maxVersionsPerTrigger")
        self.max_versions_per_trigger = int(mvpt) if mvpt is not None else None
        if self.max_versions_per_trigger is not None and (
            self.max_versions_per_trigger < 1
        ):
            raise ValueError("maxVersionsPerTrigger must be >= 1")
        # byte-shaped admission: stop admitting versions once their
        # cumulative NEW data files exceed this (the first pending
        # version always admits, however large — progress guarantee)
        mfpt = options.get("maxFilesPerTrigger")
        self.max_files_per_trigger = int(mfpt) if mfpt is not None else None
        if self.max_files_per_trigger is not None and (
            self.max_files_per_trigger < 1
        ):
            raise ValueError("maxFilesPerTrigger must be >= 1")
        # highest version known to be at-or-below the NEXT batch's start
        # (learned from initialOffset on a fresh start, then kept current
        # by partitions()/commit()); None after a restart until the first
        # engine callback reveals the checkpointed position — that one
        # batch is unclamped rather than risking an offset regression
        self._known_base: int | None = None
        self.starting = str(options.get("startingVersion", "0"))
        self._schema_json = schema_json  # pinned; executors rebuild from it
        # the version whose commit the pinned schema reflects: renames at
        # or before it are already folded into the pinned names
        vs = _list_versions(self.path)
        self._pinned_at = vs[-1] if vs else -1

    # -------------------------------------------------------------- offsets

    def initialOffset(self) -> dict:
        if self.starting == "latest":
            vs = _list_versions(self.path)
            v = vs[-1] if vs else -1
        else:
            v = int(self.starting) - 1
        self._known_base = v
        return {"version": v}

    def latestOffset(self) -> dict:
        vs = _list_versions(self.path)
        head = vs[-1] if vs else -1
        n = self.max_versions_per_trigger
        nf = self.max_files_per_trigger
        if n is not None or nf is not None:
            if self._known_base is None:
                # the engine asks for availability BEFORE initialOffset
                # on a fresh start — self-initialize the base from the
                # starting option; on a RESTART the engine has already
                # replayed partitions() of the last offset-log batch
                # (MicroBatchExecution populateStartOffsets), which
                # taught us the checkpointed position
                self.initialOffset()
            # admit at most n SURVIVING versions past the known base —
            # count commits, not version numbers, so expiry gaps don't
            # shrink the admitted work; never return below the base
            # (an offset regression would replay committed versions)
            pending = [v for v in vs if v > self._known_base]
            if n is not None and len(pending) > n:
                pending = pending[:n]
            if nf is not None and len(pending) > 1:
                # file-count shaping: commit JSONs are KB-scale driver
                # reads; admit versions until their cumulative NEW files
                # pass the budget (first version always admits)
                admitted, total = [], 0
                prev_files: set[str] | None = None
                for v in pending:
                    c = _read_commit(self.path, v)
                    if prev_files is None:
                        pc = (
                            _read_commit(self.path, v - 1)
                            if v > 0
                            else {"files": []}
                        )
                        prev_files = set(pc["files"])
                    new_files = len(set(c["files"]) - prev_files)
                    if admitted and total + new_files > nf:
                        break
                    admitted.append(v)
                    total += new_files
                    prev_files = set(c["files"])
                pending = admitted
            if pending:
                head = pending[-1]
        return {"version": head}

    def commit(self, end: dict) -> None:
        # the version offset in the checkpoint is the only durable state;
        # remember it here so admission control knows the next start
        v = int(end["version"])
        if self._known_base is None or v > self._known_base:
            self._known_base = v

    # ------------------------------------------------------------- planning

    def partitions(self, start: dict, end: dict) -> list[_ChangeTask]:
        tasks: list[_ChangeTask] = []
        # rename folds target the PINNED schema's names
        pin_hist = (
            _read_commit(self.path, self._pinned_at).get("rename_history")
            or []
        ) if self._pinned_at >= 0 else []
        surviving = _list_versions(self.path)
        surviving_set = set(surviving)
        versions = [
            v for v in surviving if start["version"] < v <= end["version"]
        ]
        # this batch ends at end["version"]; the next batch starts there —
        # feed admission control even before commit() fires (also how a
        # RESTART replanning its last logged batch re-teaches the base)
        if self._known_base is None or end["version"] > self._known_base:
            self._known_base = end["version"]
        for v in versions:
            if v > 0 and (v - 1) not in surviving_set:
                raise ValueError(
                    f"change feed unavailable: commit {v - 1} (needed to "
                    f"derive changes of commit {v} of {self.path}) was "
                    "expired — restart the consumer from a snapshot read"
                )
            commit = _read_commit(self.path, v)
            op = commit["op"]
            if op in _NOOP_OPS:
                continue
            if op in ("rename_columns", "widen_types"):
                if v <= self._pinned_at:
                    continue  # pinned schema already reflects this change
                # a rename AFTER the schema was pinned: silently
                # NULL-filling renamed columns would corrupt the feed —
                # fail like Delta does on a mid-stream schema change (NOT
                # skippable: this changes interpretation, not content).
                # On restart the schema re-pins with the new names, this
                # commit is at or before the new pin, and the stream
                # resumes from the checkpointed offset.
                raise ValueError(
                    f"version {v} of {self.path} changed the schema "
                    f"({op}); restart the stream to adopt it (the "
                    "checkpointed offset is preserved)"
                )
            prev = (
                _read_commit(self.path, v - 1)
                if v > 0
                else {"files": [], "delete_files": []}
            )
            if (commit.get("eq_deletes") or []) != (
                prev.get("eq_deletes") or []
            ):
                # EQUALITY-delete commit: deriving its row-level feed
                # needs a distributed semi-join of the prior snapshot
                # with the key tuples, which a source task cannot plan —
                # same contract as COW commits (batch consumers get the
                # feed from plans/timetravel.py:table_changes)
                if self.skip_change_commits:
                    continue
                raise ValueError(
                    f"version {v} of {self.path} is an equality-delete "
                    "commit; its row-level changes require a snapshot "
                    "semi-join. Use the batch table_changes feed, or "
                    ".option('skipChangeCommits', 'true') to skip it."
                )
            # artifact-diff classification (same rule as the batch
            # table_changes): a commit that removed/replaced any file or
            # dropped any vector rewrote or resurrected rows without
            # recording them — a source task cannot derive that feed
            if op != "initial" and (
                set(prev["files"]) - set(commit["files"])
                or set(prev.get("delete_files") or [])
                - set(commit.get("delete_files") or [])
            ):
                if self.skip_change_commits:
                    continue
                raise ValueError(
                    f"version {v} of {self.path} is a copy-on-write "
                    f"'{op}' commit: its row-level changes are not "
                    "recorded in commit artifacts. Use merge-on-read "
                    "commits on streamed tables, or opt into "
                    ".option('skipChangeCommits', 'true') (Delta "
                    "semantics: those commits' changes are then NOT "
                    "emitted)."
                )
            new_files = sorted(set(commit["files"]) - set(prev["files"]))
            n = self.FILES_PER_TASK
            for i in range(0, len(new_files), n):
                tasks.append(
                    _ChangeTask(
                        "insert",
                        v,
                        new_files[i : i + n],
                        [],
                        # one commit writes one version dir: its new files
                        # share a schema epoch, so one fold map per chunk
                        renames=_rename_fold(
                            pin_hist, _file_epoch(commit, new_files[i])
                        ),
                    )
                )
            new_dvs = sorted(
                set(commit.get("delete_files") or [])
                - set(prev.get("delete_files") or [])
            )
            if new_dvs:
                # the commit's new vectors are broadcast-small by the
                # table contract (timetravel.py delete_where), so the
                # driver reads them ONCE and plans one delete task per
                # HIT file with its positions inline — never a task per
                # prior file, never a per-task vector re-read
                import pyarrow.parquet as pq

                by_file: dict[str, list[int]] = {}
                data_root = posixpath.join(self.path, _DATA_DIR)
                for dv_rel in new_dvs:
                    fs, p = _fs_for(posixpath.join(data_root, dv_rel))
                    dv = pq.read_table(p, filesystem=fs)
                    for f, pos in zip(
                        dv.column("file").to_pylist(),
                        dv.column("pos").to_pylist(),
                    ):
                        by_file.setdefault(f, []).append(pos)
                live = set(prev["files"])
                for f in sorted(by_file):
                    if f not in live:
                        continue
                    pos = sorted(by_file[f])
                    if len(pos) > self.MAX_INLINE_POSITIONS:
                        # spill: ship the vector-file REFS, not the
                        # positions — the executor re-reads the sidecars
                        # and filters to its file (task descriptor stays
                        # KB-scale however large the delete)
                        tasks.append(
                            _ChangeTask(
                                "delete",
                                v,
                                [f],
                                None,
                                renames=_rename_fold(
                                    pin_hist, _file_epoch(commit, f)
                                ),
                                dv_files=new_dvs,
                            )
                        )
                    else:
                        tasks.append(
                            _ChangeTask(
                                "delete",
                                v,
                                [f],
                                pos,
                                renames=_rename_fold(
                                    pin_hist, _file_epoch(commit, f)
                                ),
                            )
                        )
        return tasks

    # ------------------------------------------------------------ execution

    def _target_arrow_schema(self):
        from pyspark.sql.pandas.types import to_arrow_schema

        return to_arrow_schema(StructType.fromJson(json.loads(self._schema_json)))

    def _align(self, table, pvals: dict, version: int, change: str):
        """Project a raw file table onto the pinned stream schema: hive
        partition values re-attached as columns, pre-evolution files read
        NULL for later columns, every column cast to the pinned type."""
        import pyarrow as pa

        target = self._target_arrow_schema()
        n = table.num_rows
        cols = []
        for f in target:
            if f.name == "_change_type":
                cols.append(pa.array([change] * n, type=f.type))
            elif f.name == "_commit_version":
                cols.append(pa.array([version] * n, type=f.type))
            elif f.name in table.column_names:
                cols.append(table.column(f.name).cast(f.type))
            elif f.name in pvals:
                v = pvals[f.name]
                cols.append(
                    pa.array([v] * n, type=pa.string()).cast(f.type)
                )
            else:
                cols.append(pa.nulls(n, type=f.type))
        return pa.table(cols, schema=target)

    def read(self, partition: _ChangeTask):
        import pyarrow.parquet as pq

        data_root = posixpath.join(self.path, _DATA_DIR)
        # partition columns = pinned schema names that data files may
        # encode in their paths (supersets are harmless: _partition_values
        # only picks up names actually present as segments)
        pinned = [
            f["name"] for f in json.loads(self._schema_json)["fields"]
        ]
        ren = partition.renames

        def _apply_renames(t):
            if not ren:
                return t
            return t.rename_columns([ren.get(c, c) for c in t.column_names])

        if partition.kind == "insert":
            for rel in partition.data_files:
                fs, p = _fs_for(posixpath.join(data_root, rel))
                t = _apply_renames(pq.read_table(p, filesystem=fs))
                out = self._align(
                    t,
                    _partition_values(rel, pinned),
                    partition.version,
                    "insert",
                )
                yield from out.to_batches()
            return
        # delete: take the planned positions from the one hit file
        rel = partition.data_files[0]
        fs, p = _fs_for(posixpath.join(data_root, rel))
        t = _apply_renames(pq.read_table(p, filesystem=fs))
        positions = partition.positions
        if positions is None:
            # spilled (oversized) position list: re-derive from the
            # commit's vector sidecars, filtered to this data file
            import pyarrow.compute as pc

            pos: list[int] = []
            for dv_rel in partition.dv_files:
                dfs, dp = _fs_for(posixpath.join(data_root, dv_rel))
                dv = pq.read_table(
                    dp, filesystem=dfs, columns=["file", "pos"]
                )
                dv = dv.filter(pc.equal(dv.column("file"), rel))
                pos.extend(dv.column("pos").to_pylist())
            positions = sorted(set(pos))
        taken = t.take(positions)
        out = self._align(
            taken, _partition_values(rel, pinned), partition.version, "delete"
        )
        yield from out.to_batches()

class TableChangesDataSource(DataSource):
    """`spark.dataSource.register(TableChangesDataSource)` then
    `spark.readStream.format("table_changes").load(table_path)`."""

    @classmethod
    def name(cls) -> str:
        return "table_changes"

    @staticmethod
    def _type_from_ddl(ddl: str):
        """Partition columns are scalar by construction; parse their
        recorded simpleString without a SparkSession (the data-source
        worker that calls schema() has none)."""
        import re

        from pyspark.sql import types as T

        atoms = {
            "boolean": T.BooleanType(),
            "tinyint": T.ByteType(),
            "smallint": T.ShortType(),
            "int": T.IntegerType(),
            "bigint": T.LongType(),
            "float": T.FloatType(),
            "double": T.DoubleType(),
            "string": T.StringType(),
            "date": T.DateType(),
            "timestamp": T.TimestampType(),
            "timestamp_ntz": T.TimestampNTZType(),
        }
        if ddl in atoms:
            return atoms[ddl]
        m = re.fullmatch(r"decimal\((\d+),\s*(\d+)\)", ddl)
        if m:
            return T.DecimalType(int(m.group(1)), int(m.group(2)))
        raise ValueError(f"unsupported partition column type {ddl!r}")

    def schema(self) -> StructType:
        from pyspark.sql.pandas.types import from_arrow_type
        from pyspark.sql.types import LongType, StringType, StructField

        path = self.options.get("path")
        if not path:
            raise ValueError("table_changes requires .load(table_path)")
        versions = _list_versions(path)
        if not versions:
            raise ValueError(f"no versioned table at {path}")
        commit = _read_commit(path, versions[-1])
        ptypes = commit.get("partition_types") or {}
        # a data-file footer gives the non-partition column types; the
        # commit's recorded types give the partition columns (their path
        # rendering would otherwise read back as strings)
        import pyarrow.parquet as pq

        fields: dict[str, StructField] = {}
        for rel in commit["files"]:
            fs, p = _fs_for(posixpath.join(path, _DATA_DIR, rel))
            sch = pq.read_schema(p, filesystem=fs)
            fold = _rename_fold(
                commit.get("rename_history") or [], _file_epoch(commit, rel)
            )
            for f in sch:
                name = fold.get(f.name, f.name)  # footer holds write-time names
                if name not in fields:
                    fields[name] = StructField(
                        name, from_arrow_type(f.type), True
                    )
            if set(commit.get("columns") or []) <= (
                set(fields) | set(ptypes)
            ):
                break  # footers cover the schema; stop stat-ing files
        for c, ddl in ptypes.items():
            fields[c] = StructField(c, self._type_from_ddl(ddl), True)
        order = commit.get("columns") or sorted(fields)
        out = [fields[c] for c in order if c in fields]
        out.append(StructField("_change_type", StringType(), False))
        out.append(StructField("_commit_version", LongType(), False))
        return StructType(out)

    def streamReader(self, schema: StructType) -> TableChangesStreamReader:
        return TableChangesStreamReader(
            self.options, json.dumps(schema.jsonValue())
        )
