"""ODIM HDF5 VP source connector — Spark-first design.

Reference behavior (src/vptstools/odimh5.py:16-152, src/vptstools/vpts.py:27-177):
one ~25 KB HDF5 file = one radar × one timestamp × N altitude levels; root
groups what/where/how hold scalar metadata; `dataset1/data<K>` holds one 1-D
array per quantity with per-array gain/offset/nodata/undetect attributes.

Spark shape: ``spark.read.format("binaryFile")`` over ``*.h5`` (binary scan —
HDF5 is not splittable, but binaryFile packs MANY small files into one task
via files.maxPartitionBytes, which solves the small-file problem at 100 TB
scale) → Arrow-batched ``mapInPandas`` parse, one input file-row → N typed
long-format rows (the engine's one real UDTF, SURVEY §2.9).

The HDF5 byte layer prefers h5py when installed and otherwise uses the
bundled pure-Python reader (sources/hdf5.py — public HDF5 format spec, no
native deps), so the real ``.h5`` → VPTS path runs in any container; the
decode semantics (gain/offset → dtype cast → sentinel compare, reference
vpts.py:48-66) are pure functions tested independently of either backend.
"""

from __future__ import annotations

import io
from collections.abc import Iterable, Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from vptstools_spark.schemas import (
    STATE_NODATA,
    STATE_UNDETECT,
    STATE_VALUE,
    V1_QUANTITIES,
    profile_long_schema,
)


class InvalidSourceODIM(ValueError):
    """Non-ODIM or non-VP source file (reference: src/vptstools/odimh5.py:141-152)."""


def decode_quantity(
    raw: np.ndarray,
    gain: float,
    offset: float,
    nodata: float,
    undetect: float,
    dtype: np.dtype,
) -> tuple[list[Any], list[int]]:
    """Decode one ODIM quantity array into (values, states).

    Operation order is normative (reference: src/vptstools/vpts.py:53-66):
    1. decoded = (raw * gain + offset) cast back to the ORIGINAL dtype —
       float32 quantities therefore round-trip through float32 before being
       widened to double, which is what produces full-precision reprs like
       2.6825144290924072 in the golden CSVs (SURVEY §7.4.1);
    2. sentinel comparison happens on the DECODED value, nodata first, then
       undetect (a value matching both is nodata).

    Returns values (python floats/ints, None where sentinel) and per-cell
    states (STATE_VALUE/STATE_NODATA/STATE_UNDETECT).
    """
    decoded = (np.asarray(raw) * gain + offset).astype(dtype).flatten().tolist()
    values: list[Any] = []
    states: list[int] = []
    for v in decoded:
        if v == nodata:
            values.append(None)
            states.append(STATE_NODATA)
        elif v == undetect:
            values.append(None)
            states.append(STATE_UNDETECT)
        else:
            values.append(v)
            states.append(STATE_VALUE)
    return values, states


def _parse_source_identifiers(source: str) -> dict[str, str]:
    """`WMO:06477,RAD:BX41,NOD:bewid` → dict (reference: odimh5.py:104-116)."""
    return dict(item.split(":", 1) for item in source.split(",") if ":" in item)


class _H5Handle:
    """Context-manager wrapper so h5py.File and the pure reader share a
    ``with`` shape (the pure reader holds no OS resources to release)."""

    def __init__(self, h5):
        self._h5 = h5

    def __enter__(self):
        return self._h5

    def __exit__(self, *exc):
        return False


def _open_h5(content: bytes):
    """Open ODIM bytes with h5py when present, else the bundled pure-Python
    reader. Both expose the subset used here: ``[path]``, ``.attrs``,
    ``.keys()``, ``in``, ``dataset[()]``, ``dataset.dtype``."""
    try:
        import h5py  # noqa: PLC0415 — executor-side optional dependency

        return h5py.File(io.BytesIO(content), "r")
    except ImportError:
        from vptstools_spark.sources.hdf5 import H5File  # noqa: PLC0415

        return _H5Handle(H5File(content))


def parse_odim_bytes(name: str, content: bytes, source_file: str | None = None) -> list[dict]:
    """Parse one ODIM HDF5 VP file (as bytes) into long-format row dicts.

    Mirrors reference BirdProfile.from_odim + to_vp explode
    (src/vptstools/vpts.py:138-177) but emits typed cells + state flags
    instead of an all-string frame. Uses h5py when installed; otherwise the
    bundled pure-Python HDF5 reader (sources/hdf5.py) — same subset API, so
    the byte path runs everywhere.
    """
    with _open_h5(content) as hdf5:
        for group in ("what", "where", "how"):
            if group not in hdf5:
                raise InvalidSourceODIM(f"No {group} group in ODIM file {name}")
        what = {k: _attr(v) for k, v in hdf5["what"].attrs.items()}
        if str(what.get("object")) != "VP":
            raise InvalidSourceODIM(
                f"Incorrect object value in ODIM file {name}: expected VP"
            )
        where = {k: _attr(v) for k, v in hdf5["where"].attrs.items()}
        how = {k: _attr(v) for k, v in hdf5["how"].attrs.items()}

        ts = pd.Timestamp(
            f"{what['date']} {what['time']}", tz="UTC"
        ).to_pydatetime() if "date" in what else None
        identifiers = _parse_source_identifiers(str(what.get("source", "")))

        dataset1 = hdf5["dataset1"]
        quantity_to_group = {
            _attr(dataset1[key]["what"].attrs["quantity"]): key
            for key in dataset1.keys()
            if key != "what"
        }

        def decode(q: str) -> tuple[list[Any], list[int]]:
            grp = dataset1[quantity_to_group[q]]
            a = grp["what"].attrs
            return decode_quantity(
                grp["data"][()],
                float(a["gain"]),
                float(a["offset"]),
                float(a["nodata"]),
                float(a["undetect"]),
                grp["data"].dtype,
            )

        levels, _ = decode("HGHT")
        n_levels = len(levels)

        base = {
            "source_file": source_file or name.rsplit("/", 1)[-1],
            "radar": identifiers.get("NOD", ""),
            "ts": ts,
            "rcs": _as_float(how.get("rcs_bird")),
            "sd_vvp_threshold": _as_float(how.get("sd_vvp_thresh")),
            "vcp": None if how.get("vcp") is None else str(how.get("vcp")),
            "radar_latitude": _as_float(where.get("lat")),
            "radar_longitude": _as_float(where.get("lon")),
            "radar_height": None if where.get("height") is None else int(where["height"]),
            "radar_wavelength": _as_float(how.get("wavelength")),
        }

        columns: dict[str, tuple[list[Any], list[int]]] = {}
        for odim_name, (col, _dtype) in V1_QUANTITIES.items():
            if odim_name in quantity_to_group:
                columns[col] = decode(odim_name)
            else:
                columns[col] = ([None] * n_levels, [STATE_NODATA] * n_levels)

        rows = []
        for i in range(n_levels):
            row = dict(base)
            row["height"] = int(levels[i])
            for odim_name, (col, dtype) in V1_QUANTITIES.items():
                vals, states = columns[col]
                v = vals[i]
                if col == "gap":
                    row[col] = None if v is None else bool(v)
                elif v is not None and dtype.typeName() in ("long", "integer"):
                    row[col] = int(v)
                else:
                    row[col] = None if v is None else float(v)
                if col != "gap":
                    row[f"{col}__state"] = states[i]
            rows.append(row)
        return rows


def _attr(v: Any) -> Any:
    if isinstance(v, bytes):
        return v.decode("utf8")
    if isinstance(v, np.generic):
        return v.item()
    return v


def _as_float(v: Any) -> float | None:
    try:
        return None if v is None else float(v)
    except (TypeError, ValueError):
        return None


def read_vp_files(
    spark: SparkSession,
    path: str | list[str],
    source_file: str | None = None,
    on_error: str = "warn",
) -> DataFrame:
    """Scan ODIM HDF5 VP files into the typed long-format profile DataFrame.

    ``binaryFile`` scan → ``mapInPandas`` h5py parse. Per-file failure policy
    mirrors the reference's warn-and-continue
    (src/vptstools/bin/vph5_to_vpts.py:198-200): ``on_error='warn'`` drops the
    bad file, ``'fail'`` aborts the job.
    """
    schema = profile_long_schema()
    binary = spark.read.format("binaryFile").option("pathGlobFilter", "*.h5").load(path)

    def parse(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for _, file_row in pdf.iterrows():
                try:
                    out.extend(
                        parse_odim_bytes(file_row["path"], file_row["content"], source_file)
                    )
                except InvalidSourceODIM:
                    if on_error == "fail":
                        raise
            yield _rows_to_pdf(out, schema)

    return binary.select("path", "content").mapInPandas(parse, schema=schema)


def profiles_from_records(spark: SparkSession, records: list[dict]) -> DataFrame:
    """Build the long-format profile DataFrame from pre-decoded row dicts —
    the h5py-free entry used by tests and by any upstream that already
    landed decoded profiles (e.g. parquet)."""
    schema = profile_long_schema()
    return spark.createDataFrame(_rows_to_pdf(records, schema), schema=schema)


def _rows_to_pdf(rows: list[dict], schema) -> pd.DataFrame:
    cols = [f.name for f in schema.fields]
    if not rows:
        return pd.DataFrame({c: pd.Series(dtype="object") for c in cols})
    pdf = pd.DataFrame(rows)
    for c in cols:
        if c not in pdf.columns:
            pdf[c] = None
    return pdf[cols]
