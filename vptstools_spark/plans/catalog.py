"""Cross-table transactional catalog — multi-table atomic publish over
the versioned-table layer (public design family: Project Nessie's
multi-table commits / Iceberg REST catalog atomic swaps, re-expressed on
this repo's sidecar commit log).

The problem it solves: a pipeline that refreshes `orders` AND the
`orders_by_month` rollup must never expose one without the other — with
per-table commit logs alone, a reader can observe table A at its new
version and table B at its old one. The catalog adds ONE more atomic
create-exclusive commit level: a catalog commit is a JSON file pinning
(table name → table path, table version) for every registered table, and
readers resolve versions through a single catalog commit — so every
multi-table read is a CONSISTENT CROSS-TABLE SNAPSHOT, and publishing N
table updates is one catalog commit that either lands entirely or not at
all.

The write protocol is write-then-swap, same shape as WAP:

    1. commit each table's new version through the normal table log
       (those versions exist but are NOT visible through the catalog);
    2. `catalog_commit(spark, cat, {"orders": 3, "orders_by_month": 7})`
       — one atomic create-exclusive publish of the new pin set; a
       racing committer loses with `CommitConflictError` and retries on
       top of the winner's pins.

Reads: `read_catalog_table(spark, cat, "orders")` resolves the pin and
returns the pinned snapshot plan; `catalog_pins` exposes the pin set.
Time travel composes: every catalog commit is itself versioned, so
"the whole warehouse as of catalog commit 5" is one argument away.

Scale shape: a catalog commit is KB-scale JSON regardless of data size
(it stores versions, not file lists — the per-table commit logs keep
those); resolution is two sidecar reads per table. Expiring table
versions must respect catalog pins: `pinned_table_versions` reports
every (path, version) any surviving catalog commit references, and
`expire_versions` in timetravel stays tag-aware only — operators expire
catalog commits FIRST (same two-step discipline as table expiry).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from vptstools_spark.io import create_text_exclusive, read_text_sidecar
from vptstools_spark.plans.timetravel import (
    CommitConflictError,
    _list_versions,
    read_version,
)

_CAT_LOG = "_catalog_log"


def _cat_path(cat: str, version: int) -> str:
    return os.path.join(cat, _CAT_LOG, f"{version:08d}.json")


def _cat_versions(spark: SparkSession, cat: str) -> list[int]:
    return _list_versions(spark, cat, _CAT_LOG)


def _read_cat_commit(spark: SparkSession, cat: str, version: int) -> dict:
    return json.loads(read_text_sidecar(spark, _cat_path(cat, version)))


def catalog_init(
    spark: SparkSession, cat: str, tables: dict[str, tuple[str, int]]
) -> int:
    """Catalog commit 0: pin `{name: (table_path, version)}`. Every
    pinned version must already exist in its table's commit log."""
    if _cat_versions(spark, cat):
        raise ValueError(f"catalog already exists at {cat}")
    return _publish(spark, cat, 0, tables, "init")


def _publish(
    spark: SparkSession,
    cat: str,
    version: int,
    tables: dict[str, tuple[str, int]],
    op: str,
) -> int:
    for name, (path, v) in tables.items():
        if v not in _list_versions(spark, path):
            raise ValueError(
                f"cannot pin {name!r} at version {v}: no such version in "
                f"{path}"
            )
    ok = create_text_exclusive(
        spark,
        _cat_path(cat, version),
        json.dumps(
            {
                "version": version,
                "op": op,
                "tables": {
                    name: {"path": path, "version": v}
                    for name, (path, v) in tables.items()
                },
            }
        ),
    )
    if not ok:
        raise CommitConflictError(
            f"catalog version {version} of {cat} was committed by another "
            "writer; re-read the pins and retry"
        )
    return version


def catalog_pins(
    spark: SparkSession, cat: str, version: int | None = None
) -> dict[str, tuple[str, int]]:
    """The pin set of a catalog commit (default: latest) as
    {name: (table_path, table_version)}."""
    versions = _cat_versions(spark, cat)
    if not versions:
        raise ValueError(f"no catalog at {cat}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(
            f"catalog version {v} does not exist; available: "
            f"{versions[0]}..{versions[-1]}"
        )
    c = _read_cat_commit(spark, cat, v)
    return {
        name: (t["path"], t["version"]) for name, t in c["tables"].items()
    }


def catalog_commit(
    spark: SparkSession,
    cat: str,
    updates: dict[str, int],
    expected_version: int | None = None,
) -> int:
    """Atomically move the named tables to new versions (all-or-nothing):
    the new catalog commit re-states every unchanged pin and replaces the
    updated ones. The table versions must already be committed in their
    own logs — this is the SWAP step of write-then-swap. Optimistic
    concurrency: pass `expected_version` (the catalog version the updates
    were computed against) to fail fast when another committer won; with
    the default None, the publish still races safely on the next version
    number (exactly one winner per version)."""
    versions = _cat_versions(spark, cat)
    if not versions:
        raise ValueError(f"no catalog at {cat}")
    cur = versions[-1]
    if expected_version is not None and cur != expected_version:
        raise CommitConflictError(
            f"catalog {cat} is at version {cur}, not the expected "
            f"{expected_version}; re-read the pins and retry"
        )
    pins = catalog_pins(spark, cat, cur)
    unknown = set(updates) - set(pins)
    if unknown:
        raise ValueError(
            f"unknown table(s) {sorted(unknown)}; register new tables "
            "with catalog_add_table"
        )
    new_pins = {
        name: (path, updates.get(name, v)) for name, (path, v) in pins.items()
    }
    return _publish(spark, cat, cur + 1, new_pins, "commit")


def catalog_add_table(
    spark: SparkSession, cat: str, name: str, path: str, version: int
) -> int:
    """Register one more table into the pin set (its own commit history
    may predate the catalog)."""
    versions = _cat_versions(spark, cat)
    if not versions:
        raise ValueError(f"no catalog at {cat}")
    pins = catalog_pins(spark, cat, versions[-1])
    if name in pins:
        raise ValueError(f"table {name!r} already registered in {cat}")
    pins[name] = (path, version)
    return _publish(spark, cat, versions[-1] + 1, pins, f"add({name})")


def read_catalog_table(
    spark: SparkSession,
    cat: str,
    name: str,
    catalog_version: int | None = None,
) -> DataFrame:
    """The named table at the catalog's pinned version — reads through
    one catalog commit, so two `read_catalog_table` calls against the
    same `catalog_version` are a consistent cross-table snapshot (pass
    an explicit version for repeated reads; `None` re-resolves latest
    per call)."""
    pins = catalog_pins(spark, cat, catalog_version)
    if name not in pins:
        raise ValueError(f"no table {name!r} in {cat}; tables: {sorted(pins)}")
    path, v = pins[name]
    return read_version(spark, path, v)


def pinned_table_versions(
    spark: SparkSession, cat: str
) -> dict[str, set[int]]:
    """Every (table path → versions) any SURVIVING catalog commit pins —
    the retention contract for table-level expiry: expire catalog commits
    first, then only table versions outside this set are safe to expire
    (mirror of how tags protect single-table versions)."""
    out: dict[str, set[int]] = {}
    for cv in _cat_versions(spark, cat):
        for _name, (path, v) in catalog_pins(spark, cat, cv).items():
            out.setdefault(path, set()).add(v)
    return out


def register_catalog(
    spark: SparkSession, cat: str, catalog_version: int | None = None
) -> list[str]:
    """SQL face: every table in the catalog as a temp view at its pinned
    version — one call gives a SQL session a consistent warehouse
    snapshot."""
    pins = catalog_pins(spark, cat, catalog_version)
    cv = (
        _cat_versions(spark, cat)[-1]
        if catalog_version is None
        else catalog_version
    )
    names = []
    for name in sorted(pins):
        read_catalog_table(spark, cat, name, cv).createOrReplaceTempView(name)
        names.append(name)
    return names
