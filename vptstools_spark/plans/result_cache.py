"""Query result cache with version-based invalidation — the lakehouse
result-reuse pattern (public designs: Snowflake query-result reuse,
Databricks/Delta result caching): a query over VERSIONED tables is a pure
function of (query key, the versions of the tables it reads), so its
result can be stored once and served until any dependency commits a new
version — correctness by construction, no TTL guessing.

    deps = [(orders_path, None), (customer_path, 4)]   # None = latest
    df = cached_result(spark, cache_dir, "daily_rollup", deps, build_fn)

`build_fn(spark) -> DataFrame` runs ONLY on a miss; the result is written
to parquet under the cache dir next to a meta JSON recording the resolved
dependency versions. A later call re-resolves each `None` pin to the
dependency's CURRENT latest version: if the fingerprint matches, the call
returns a scan of the stored parquet (no recompute, no dependency scan);
if any table moved, the entry is stale — the new result is written under
a NEW fingerprint dir (create-exclusive meta publish, racing builders
produce one winner and the loser serves the winner's entry), and stale
entries stay until `evict_stale` reclaims them (two-step, like
expire/vacuum).

Scale shape: a cache HIT costs two sidecar reads + a parquet scan of the
RESULT (usually orders of magnitude smaller than its inputs); a miss
costs the query itself plus one result write. The cache never caches
against mutable plain-parquet dirs — deps must be versioned tables,
because an unversioned directory has no commit point to fingerprint.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession

from vptstools_spark.io import create_text_exclusive, read_text_sidecar
from vptstools_spark.plans.timetravel import _list_versions


def _resolve_deps(
    spark: SparkSession, deps: list[tuple[str, int | None]]
) -> list[tuple[str, int]]:
    out = []
    for path, v in deps:
        versions = _list_versions(spark, path)
        if not versions:
            raise ValueError(
                f"result-cache dependency {path} is not a versioned table "
                "(no commit log) — an unversioned input has no commit "
                "point to fingerprint"
            )
        rv = versions[-1] if v is None else v
        if rv not in versions:
            raise ValueError(
                f"dependency {path} has no version {rv}; available: "
                f"{versions[0]}..{versions[-1]}"
            )
        out.append((path, rv))
    return out


def _fingerprint(key: str, resolved: list[tuple[str, int]]) -> str:
    payload = json.dumps([key, sorted(resolved)]).encode()
    return hashlib.md5(payload).hexdigest()[:16]


def _entry_dir(cache_dir: str, key: str, fp: str) -> str:
    return os.path.join(cache_dir, key, fp)


def cached_result(
    spark: SparkSession,
    cache_dir: str,
    key: str,
    deps: list[tuple[str, int | None]],
    build_fn,
) -> DataFrame:
    """Serve `key`'s result for the current dependency versions, building
    it with `build_fn(spark)` only on a miss. Returns a DataFrame either
    way (a stored-result scan on hit)."""
    import uuid

    resolved = _resolve_deps(spark, deps)
    fp = _fingerprint(key, resolved)
    entry = _entry_dir(cache_dir, key, fp)
    meta_path = os.path.join(entry, "meta.json")

    def _serve() -> DataFrame:
        meta = json.loads(read_text_sidecar(spark, meta_path))
        return spark.read.parquet(os.path.join(entry, meta["data"]))

    try:
        return _serve()
    except Exception:
        pass
    out = build_fn(spark)
    # write data under a builder-unique dir FIRST, then publish meta
    # (create-exclusive) NAMING that dir: the meta file IS the entry and
    # already points at fully-written data, so there is no window where a
    # reader sees the entry before its result exists; racing builders
    # produce one winner, the loser deletes its own dir and serves the
    # winner's
    data_name = f"result-{uuid.uuid4().hex[:12]}"
    out.write.mode("error").parquet(os.path.join(entry, data_name))
    won = create_text_exclusive(
        spark,
        meta_path,
        json.dumps(
            {
                "key": key,
                "deps": sorted(resolved),
                # which deps FLOATED (None pin) at build time: an entry
                # built from explicit pins stays valid however far its
                # deps advance, so eviction must not touch it while the
                # pinned versions remain readable
                "floating": sorted(p for p, v in deps if v is None),
                "data": data_name,
            }
        ),
    )
    if not won:
        jvm = spark.sparkContext._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(os.path.join(entry, data_name))
        p.getFileSystem(hconf).delete(p, True)
    return _serve()


def cache_entries(spark: SparkSession, cache_dir: str) -> list[dict]:
    """Every cached entry's (key, fingerprint, deps) — the inspection
    face eviction decisions read."""
    from vptstools_spark.plans.timetravel import _list_fs_children

    out = []
    for key in _list_fs_children(spark, cache_dir):
        for fp in _list_fs_children(spark, os.path.join(cache_dir, key)):
            meta_path = os.path.join(cache_dir, key, fp, "meta.json")
            try:
                meta = json.loads(read_text_sidecar(spark, meta_path))
            except Exception:
                continue  # half-built loser entry, no meta published
            out.append(
                {
                    "key": key,
                    "fingerprint": fp,
                    "deps": meta["deps"],
                    # entries written before the floating field existed
                    # are treated as all-floating (their pre-field
                    # eviction behavior)
                    "floating": meta.get(
                        "floating", [p for p, _v in meta["deps"]]
                    ),
                }
            )
    return out


def evict_stale(spark: SparkSession, cache_dir: str) -> list[str]:
    """Delete every entry that can no longer be SERVED: a FLOATING
    dependency moved past the version the entry was built from (the next
    `cached_result` call would rebuild under a new fingerprint anyway),
    or a PINNED version was expired out of its table's history. An entry
    built purely from still-readable explicit pins is valid and servable
    however far its deps' heads advance — evicting it would only force a
    pointless rebuild on the next pinned call. The explicit reclaim step;
    serving correctness never depends on running it. Returns evicted
    `key/fingerprint` ids."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    evicted = []
    for e in cache_entries(spark, cache_dir):
        floating = set(e["floating"])
        fresh = True
        for path, v in e["deps"]:
            versions = _list_versions(spark, path)
            if path in floating:
                if not versions or versions[-1] != v:
                    fresh = False
                    break
            elif v not in versions:  # pinned version expired
                fresh = False
                break
        if not fresh:
            p = jvm.org.apache.hadoop.fs.Path(
                _entry_dir(cache_dir, e["key"], e["fingerprint"])
            )
            p.getFileSystem(hconf).delete(p, True)
            evicted.append(f"{e['key']}/{e['fingerprint']}")
    return evicted
