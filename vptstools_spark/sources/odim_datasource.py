"""ODIM HDF5 as a registrable Spark 4 Python Data Source:

    spark.dataSource.register(OdimDataSource)
    df = spark.read.format("odim").load("/data/vp/*.h5")

This is the DataSource-API face of the same byte path `read_vp_files`
drives through binaryFile+mapInPandas (`sources/odim.py:216`): file
listing and partition *planning* happen on the driver, parsing happens on
executors, and Spark sees a first-class source with the long-format
profile schema — usable from SQL (`CREATE TABLE ... USING odim`) and
composable with every downstream operator.

Scale notes (100 TB of ~25 KB VP files):
- `partitions()` packs the file list into `ceil(n_files / files_per_task)`
  input partitions — the DataSource-API equivalent of binaryFile's
  `files.maxPartitionBytes` packing; only file PATHS travel in the plan.
- each task reads its files independently (no driver I/O after planning);
  per-file failures follow the reference's warn-and-continue policy
  (`on_error` option: warn | fail).
- the parser is the h5py-or-pure-Python byte reader (`sources/hdf5.py`),
  so the source works in containers without native HDF5 libraries.
"""

from __future__ import annotations

import glob as _glob
import os
import warnings
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    InputPartition,
)

from vptstools_spark.schemas import profile_long_schema

#: memory ceiling on files per input partition — ~25 KB VP files ⇒
#: ~50 MB per task at the cap
MAX_FILES_PER_TASK = 2000

#: floor: below this many files per task, the per-task DataSource
#: overhead (Python worker handshake + reader unpickle, measured
#: ~11 ms/task) outweighs the decode parallelism gained
MIN_FILES_PER_TASK = 8


def auto_files_per_task(n_files: int) -> int:
    """Partition-count heuristic for the ODIM DataSource planner.

    The planner runs in a Python worker WITHOUT a SparkSession, so it
    cannot ask for defaultParallelism; it reads the same SPARK_GRAFT_CPUS
    env the session builder uses (falling back to os.cpu_count()) and
    targets one task per core, clamped to [MIN, MAX]_FILES_PER_TASK.

    This replaces a fixed files_per_task=2000 default that packed every
    fleet of <=2000 files into ONE task — the r8 bench's 1.8x
    streaming-vs-batch ingest "gap" was entirely this serial decode
    (VERDICT r8 #4); the micro-batch machinery itself costs ~1.7 s per
    availableNow run. On a real cluster the driver-host core count is
    only a proxy for executor parallelism — set .option("files_per_task")
    explicitly there."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
    cores = int(cpus) if cpus.isdigit() else (os.cpu_count() or 8)
    per_core = -(-n_files // max(cores, 1))  # ceil
    return max(MIN_FILES_PER_TASK, min(per_core, MAX_FILES_PER_TASK))


def _arrow_batches(paths: list[str], on_error: str, batch_files: int):
    """Parse ODIM files into Arrow record batches (one per `batch_files`
    files, ~25 rows/file): executor-side body shared by the batch and
    streaming DataSource readers. Per-file failures warn-and-continue
    (reference policy) unless on_error='fail'."""
    # executor-side imports: keep the planning path light
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    from vptstools_spark.sources.odim import _rows_to_pdf, parse_odim_bytes

    schema = profile_long_schema()
    arrow_schema = to_arrow_schema(schema)
    rows: list[dict] = []
    n_files = 0
    for p in paths:
        try:
            with open(p, "rb") as fh:
                rows.extend(parse_odim_bytes(p, fh.read()))
        except Exception as exc:  # per-file isolation, like read_vp_files
            if on_error == "fail":
                raise
            warnings.warn(f"skipping unreadable ODIM file {p}: {exc}")
            continue
        n_files += 1
        if n_files % batch_files == 0 and rows:
            # Arrow-batch yield (Spark 4 DataSource API): one columnar batch
            # per file chunk instead of per-row Python tuples — same batching
            # as the binaryFile+mapInPandas perf path
            yield pa.RecordBatch.from_pandas(
                _rows_to_pdf(rows, schema), schema=arrow_schema, preserve_index=False
            )
            rows = []
    if rows:
        yield pa.RecordBatch.from_pandas(
            _rows_to_pdf(rows, schema), schema=arrow_schema, preserve_index=False
        )


def pruned_files_after(
    base: str, watermark: str, until: str | None = None
) -> list[str]:
    """All `*.h5` paths p under `base` with watermark < p (and p ≤ until,
    when given), visiting ONLY directories whose subtree can contain such a
    path.

    Purely lexicographic, so it exploits ANY sorted nesting
    (radar/year/month/day in the reference archive grammar,
    functions/paths.py) without knowing it: a subtree rooted at prefix
    P = dir + "/" can hold a path > watermark iff P > watermark (every
    descendant extends P, hence sorts after it) or watermark starts with P
    (the watermark lies inside the subtree); otherwise every descendant
    sorts BEFORE the watermark and the whole subtree is skipped. The upper
    bound prunes symmetrically (P > until ⇒ every descendant > until).
    Per-trigger driver work is O(tail directories), not O(archive) —
    at the 100 TB design point (millions of files across years of
    radar/day directories) a micro-batch touches only the day dirs at and
    after the watermark. Flat layouts degrade gracefully: every file sits
    directly under `base`, which is always visited.
    """
    out: list[str] = []

    def walk(d: str) -> None:
        try:
            entries = sorted(os.scandir(d), key=lambda e: e.name)
        except OSError:
            return
        for e in entries:
            full = os.path.join(d, e.name)
            if e.is_dir(follow_symlinks=True):
                prefix = full + "/"
                if until is not None and prefix > until:
                    continue
                if prefix > watermark or watermark.startswith(prefix):
                    walk(full)
            elif e.name.endswith(".h5") and full > watermark:
                if until is None or full <= until:
                    out.append(full)

    walk(base.rstrip("/"))
    return sorted(out)


def max_file(base: str) -> str:
    """Lexicographically greatest `*.h5` path under `base`, found by
    descending only the greatest-sorting subtree chain (with backtracking
    past empty branches) — O(depth × fan-out) driver work instead of a
    full archive walk. Entries are ordered by their PATH-order key
    (dirs compare as name + "/": a dir "z" can outsort a file "z.h5"
    because "/" > "." in ASCII)."""

    def walk(d: str) -> str:
        try:
            entries = sorted(
                os.scandir(d),
                key=lambda e: e.name + "/" if e.is_dir(follow_symlinks=True) else e.name,
                reverse=True,
            )
        except OSError:
            return ""
        for e in entries:
            full = os.path.join(d, e.name)
            if e.is_dir(follow_symlinks=True):
                found = walk(full)
                if found:
                    return found
            elif e.name.endswith(".h5"):
                return full
        return ""

    return walk(base.rstrip("/"))


class OdimFilesPartition(InputPartition):
    def __init__(self, paths: list[str]):
        self.paths = paths


class OdimReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("odim source requires a path, e.g. .load('/dir/*.h5')")
        fpt = options.get("files_per_task")
        self.files_per_task = int(fpt) if fpt is not None else None
        self.on_error = options.get("on_error", "warn")
        self._radar_eq: str | None = None

    def partitions(self) -> list[OdimFilesPartition]:
        pattern = self.path
        if not _glob.has_magic(pattern):
            # bare directory → recursive scan (radar archives nest by
            # radar/year/month/day, reference bin/vph5_to_vpts.py listing)
            pattern = pattern.rstrip("/") + "/**/*.h5"
        files = sorted(_glob.glob(pattern, recursive=True))
        if self._radar_eq is not None:
            # ODIM names: <radar>_vp_<ts>...h5 — prune on the basename prefix
            files = [
                p
                for p in files
                if p.rsplit("/", 1)[-1].split("_", 1)[0] == self._radar_eq
            ]
        n = self.files_per_task or auto_files_per_task(len(files))
        return [
            OdimFilesPartition(files[i : i + n]) for i in range(0, len(files), n)
        ] or [OdimFilesPartition([])]

    #: files per Arrow record batch (~25 rows/file ⇒ ~6.4k rows/batch):
    #: bounds executor memory while amortizing the Arrow conversion
    ARROW_BATCH_FILES = 256

    def read(self, partition: OdimFilesPartition) -> Iterator["pa.RecordBatch"]:
        return _arrow_batches(partition.paths, self.on_error, self.ARROW_BATCH_FILES)


class OdimPushdownReader(OdimReader):
    """OdimReader + planning-time file pruning via DataSource-API filter
    pushdown. Split into a subclass because merely IMPLEMENTING
    pushFilters() makes Spark error when
    `spark.sql.python.filterPushdown.enabled` is false (default) — the base
    reader must stay usable on any session; opt in with
    `.option("pushdown", "true")` on a session that enables the conf
    (session.get_spark does)."""

    def pushFilters(self, filters: list[Filter]) -> list[Filter]:
        """`radar = 'x'` prunes every non-matching file from the listing
        before a single byte is read — the ODIM filename grammar starts
        with the radar code (functions/paths.py:parse_odim_filename). All
        filters are returned for Spark-side re-evaluation (partial-pushdown
        semantics: pruning is an optimization, not the contract)."""
        for f in filters:
            if isinstance(f, EqualTo) and tuple(f.attribute) == ("radar",):
                self._radar_eq = str(f.value)
        return filters


class OdimStreamReader(DataSourceStreamReader):
    """Streaming ODIM ingest: `spark.readStream.format("odim").load(dir)`.

    The offset is a lexicographic FILENAME WATERMARK ({"last": path}) —
    radar archives name files by timestamp (<radar>_vp_<yyyymmddThhmm>…),
    so lexicographic order IS arrival order within a directory tree, and
    the offset stays O(1) regardless of history (unlike a processed-file
    set). Each micro-batch covers the files that sorted after the previous
    watermark; `partitions()` packs them per task exactly like the batch
    reader, and `read()` reuses the shared Arrow-batch parser. Listing is
    watermark-pruned (round 4): each trigger walks only the directory
    subtrees that can sort after the current offset (`pruned_files_after`)
    and finds the new offset by descending the greatest-sorting chain
    (`max_file`) — O(tail) driver work per trigger on a nested archive,
    instead of re-globbing the whole tree. This is the
    DataSource-API form of the reference's cron-batch change detection
    (SURVEY §2.8): checkpointed offsets replace the S3-inventory
    `modified` lookback.
    """

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("odim stream requires a path, e.g. .load('/dir')")
        fpt = options.get("files_per_task")
        self.files_per_task = int(fpt) if fpt is not None else None
        self.on_error = options.get("on_error", "warn")

    def _list_after(self, watermark: str, until: str | None = None) -> list[str]:
        """Files strictly after `watermark` (≤ `until`), pruning whole
        directory subtrees that cannot sort into the window (round-4 fix:
        the previous full re-glob was O(archive) driver work per trigger,
        forever). Explicit glob patterns fall back to a full walk — their
        matching isn't prefix-monotone, so subtree pruning can't apply."""
        if _glob.has_magic(self.path):
            files = sorted(_glob.glob(self.path, recursive=True))
            return [
                p
                for p in files
                if watermark < p and (until is None or p <= until)
            ]
        return pruned_files_after(self.path, watermark, until)

    def initialOffset(self) -> dict:
        return {"last": ""}

    def latestOffset(self) -> dict:
        if _glob.has_magic(self.path):
            files = sorted(_glob.glob(self.path, recursive=True))
            return {"last": files[-1]} if files else {"last": ""}
        return {"last": max_file(self.path)}

    def partitions(self, start: dict, end: dict) -> list[OdimFilesPartition]:
        files = self._list_after(start["last"], end["last"])
        n = self.files_per_task or auto_files_per_task(len(files))
        return [
            OdimFilesPartition(files[i : i + n]) for i in range(0, len(files), n)
        ]

    def read(self, partition: OdimFilesPartition):
        return _arrow_batches(
            partition.paths, self.on_error, OdimReader.ARROW_BATCH_FILES
        )

    def commit(self, end: dict) -> None:
        # nothing to clean up: the watermark in the checkpoint is the state
        pass


class OdimDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "odim"

    def schema(self):
        return profile_long_schema()

    def reader(self, schema) -> OdimReader:
        if str(self.options.get("pushdown", "false")).lower() == "true":
            return OdimPushdownReader(self.options)
        return OdimReader(self.options)

    def streamReader(self, schema) -> OdimStreamReader:
        return OdimStreamReader(self.options)
