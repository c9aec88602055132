"""Sidecar IO contract (vptstools_spark/io.py): the local fast path for
scheme-less reads must agree with where the WRITE helpers put the bytes
(Hadoop fs.defaultFS), and expiry must never delete logs whose survivor
pins failed to land (ADVICE r8, both medium findings)."""

import json

import pytest

from vptstools_spark import io as vio


def test_scheme_less_roundtrip_local_defaultfs(spark, tmp_path):
    """Baseline: on a local-defaultFS host (this container) the fast path
    reads back exactly what the Hadoop-route writer wrote."""
    p = str(tmp_path / "sidecar.json")
    vio.write_text_sidecar(spark, p, '{"v": 1}')
    assert vio._default_fs_is_local(spark) is True
    assert json.loads(vio.read_text_sidecar(spark, p)) == {"v": 1}


def test_scheme_less_read_routes_hadoop_when_defaultfs_not_local(
    spark, tmp_path, monkeypatch
):
    """When fs.defaultFS is NOT the local FS (e.g. HDFS), a scheme-less
    read must go through the Hadoop FS route — a plain open() would look
    in the wrong filesystem and miss every sidecar the writers created
    (read/write helpers must resolve paths identically)."""
    p = str(tmp_path / "sidecar2.json")
    vio.write_text_sidecar(spark, p, "hadoop-visible")
    monkeypatch.setattr(vio, "_default_fs_is_local", lambda _s: False)
    # the Hadoop route resolves this scheme-less path against defaultFS
    # (local here), so it still finds the file — the point is the branch
    # taken, which we pin by breaking the local fast path outright
    import builtins

    real_open = builtins.open

    def deny_plain_open(path, *a, **k):
        if str(path) == p:
            raise AssertionError("plain open() used for non-local defaultFS")
        return real_open(path, *a, **k)

    monkeypatch.setattr(builtins, "open", deny_plain_open)
    assert vio.read_text_sidecar(spark, p) == "hadoop-visible"


def test_scheme_less_local_miss_falls_through_to_hadoop(spark, tmp_path):
    """A local miss on a scheme-less path falls through to the Hadoop
    route, whose miss is authoritative — the caller still sees an
    exception, never a silent empty read."""
    with pytest.raises(Exception):
        vio.read_text_sidecar(spark, str(tmp_path / "never-written.json"))


def test_explicit_file_scheme_miss_raises_filenotfound(spark, tmp_path):
    """file:// pins the filesystem unambiguously — a miss surfaces as the
    Python FileNotFoundError callers catch, with no Hadoop round trip."""
    with pytest.raises(FileNotFoundError):
        vio.read_text_sidecar(spark, f"file://{tmp_path}/nope.json")


def test_expiry_aborts_before_deletion_when_pin_write_fails(
    spark, tmp_path, monkeypatch
):
    """expire_versions must pin survivor checkpoints DURABLY before any
    log deletion: a dropped pin would leave surviving format-2 delta
    commits resolving through deleted parents forever. On pin failure the
    expiry aborts with every log file intact (safely retryable)."""
    from vptstools_spark.plans import timetravel as tt

    path = str(tmp_path / "ttpin")
    df = spark.createDataFrame([(1, 0, 1.0)], "k long, day int, v double")
    tt.commit_initial(df, path, ["day"], format_version=2)
    for v in (2.0, 3.0, 4.0):
        tt.commit_upsert(
            spark, path,
            spark.createDataFrame([(1, 0, v)], "k long, day int, v double"),
            keys=["k"],
        )
    before = tt._list_versions(spark, path)
    assert before == [0, 1, 2, 3]

    real_write = tt.write_text_sidecar

    def fail_ckpt_writes(s, p, text):
        if "/_ckpt/" in p:
            raise IOError("simulated pin-write failure")
        return real_write(s, p, text)

    monkeypatch.setattr(tt, "write_text_sidecar", fail_ckpt_writes)
    with pytest.raises(RuntimeError, match="pin"):
        tt.expire_versions(spark, path, keep_last=1)
    # nothing was deleted: every version still listed and readable
    assert tt._list_versions(spark, path) == before
    for v in before:
        assert tt.read_version(spark, path, v).count() == 1

    # and the retry succeeds once writes work again
    monkeypatch.setattr(tt, "write_text_sidecar", real_write)
    assert tt.expire_versions(spark, path, keep_last=1) == [0, 1, 2]
    assert [r["v"] for r in tt.read_version(spark, path).collect()] == [4.0]
