"""Real ``.h5`` → golden VPTS CSV end-to-end (SURVEY §7.2 minimum slice).

Drives the reference's actual HDF5 fixtures through the pure-Python HDF5
reader (sources/hdf5.py) and the full Spark pipeline, byte-comparing
against the goldens the reference's own e2e produces
(reference: tests/test_vph5_to_vpts.py:20-68).
"""

import glob
import gzip
import os

import pytest

from vptstools_spark.operators.pipeline import daily_vpts_job, monthly_vpts_job
from vptstools_spark.operators.vpts import to_vpts_table, vpts_to_csv
from vptstools_spark.sources.hdf5 import H5File
from vptstools_spark.sources.odim import (
    InvalidSourceODIM,
    parse_odim_bytes,
    read_vp_files,
)

REF_DATA = "/root/reference/tests/data"
VP_DIR = f"{REF_DATA}/inventory/vp"
GOLDEN_DAILY = f"{REF_DATA}/inventory/nosta_vpts_20230311.csv"
GOLDEN_MONTHLY = f"{REF_DATA}/inventory/nosta_vpts_202303.csv.gz"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(VP_DIR), reason="reference HDF5 fixtures not present"
)


def test_h5file_reads_odim_structure():
    path = sorted(glob.glob(f"{VP_DIR}/*.h5"))[0]
    h5 = H5File(open(path, "rb").read())
    assert set(h5.keys()) >= {"dataset1", "what", "where", "how"}
    assert h5["what"].attrs["object"] == b"VP"
    what = h5["dataset1/data1/what"].attrs
    assert {"gain", "offset", "nodata", "undetect", "quantity"} <= set(what)
    data = h5["dataset1/data1/data"]
    assert data.shape == (25, 1)
    assert data[()].shape == (25, 1)


def test_parse_every_reference_vp_file():
    paths = sorted(glob.glob(f"{REF_DATA}/vp/**/*.h5", recursive=True)) + sorted(
        glob.glob(f"{VP_DIR}/*.h5")
    )
    assert len(paths) == 11
    for p in paths:
        rows = parse_odim_bytes(p, open(p, "rb").read())
        assert len(rows) == 25  # 25 altitude levels per profile
        assert rows[0]["radar"] in {"bejab", "bewid", "nosta"}


def test_rejects_non_vp_files():
    pvol = f"{REF_DATA}/odimh5/bewid_pvol_20170214T0000Z_0x1.h5"
    with pytest.raises(InvalidSourceODIM, match="Incorrect object value"):
        parse_odim_bytes(pvol, open(pvol, "rb").read())
    dummy = f"{REF_DATA}/vp_no_odim_h5/dummy.h5"
    with pytest.raises(InvalidSourceODIM, match="No what group"):
        parse_odim_bytes(dummy, open(dummy, "rb").read())


def test_daily_csv_byte_equals_reference_golden(spark, tmp_path):
    vpts = to_vpts_table(read_vp_files(spark, f"{VP_DIR}/*.h5"))
    out = tmp_path / "daily.csv"
    vpts_to_csv(vpts, str(out))
    assert out.read_bytes() == open(GOLDEN_DAILY, "rb").read()


def test_monthly_gz_content_equals_reference_golden(spark, tmp_path):
    profiles = read_vp_files(spark, f"{VP_DIR}/*.h5")
    days = spark.createDataFrame(
        [("nosta", "20230311")], "radar_code string, date string"
    )
    daily, monthly = str(tmp_path / "daily"), str(tmp_path / "monthly")
    daily_vpts_job(spark, profiles, days, daily)
    monthly_vpts_job(spark, daily, monthly)
    parts = glob.glob(f"{monthly}/p_radar=nosta/p_month=202303/*.csv.gz")
    assert len(parts) == 1
    # gzip container bytes differ (mtime/os); the decompressed CSV must not
    assert gzip.open(parts[0], "rb").read() == gzip.open(GOLDEN_MONTHLY, "rb").read()


@pytest.mark.skipif(
    __import__("importlib.util", fromlist=["util"]).find_spec("h5py") is None,
    reason="h5py not installed in this container — this parity test is the "
    "first CI gate on a real cluster image (reference odimh5.py:16-138 "
    "relies on h5py for chunked/compressed datasets the pure reader may "
    "not have seen)",
)
def test_h5py_path_row_identical_to_pure_reader(monkeypatch):
    """When h5py IS importable, every reference fixture must parse to
    row-identical output (or raise the same error class) through both the
    h5py branch and the pure-Python byte reader of `_open_h5`."""
    import sys

    files = sorted(glob.glob(f"{REF_DATA}/**/*.h5", recursive=True))
    assert files, "no reference .h5 fixtures found"
    for p in files:
        with open(p, "rb") as fh:
            content = fh.read()
        try:
            h5py_rows, h5py_err = parse_odim_bytes(p, content), None
        except Exception as exc:
            h5py_rows, h5py_err = None, type(exc).__name__
        # hide h5py so _open_h5 falls back to the pure reader
        with monkeypatch.context() as m:
            m.setitem(sys.modules, "h5py", None)
            try:
                pure_rows, pure_err = parse_odim_bytes(p, content), None
            except Exception as exc:
                pure_rows, pure_err = None, type(exc).__name__
        assert h5py_err == pure_err, p
        assert h5py_rows == pure_rows, f"row mismatch for {p}"


def test_streaming_sink_matches_batch_daily_artifacts(spark, tmp_path):
    """Cron-batch (daily_vpts_job) and Structured Streaming AvailableNow
    (stream_profiles → incremental_vpts_sink) must produce BYTE-IDENTICAL
    daily artifacts from the same profiles — the reference's repeated CLI
    runs (bin/vph5_to_vpts.py:121-144) expressed both ways. Also proves the
    golden file itself and that a second AvailableNow run with the same
    checkpoint is a no-op (exactly-once by idempotence + no new files)."""
    import filecmp

    from vptstools_spark.operators.pipeline import daily_vpts_job
    from vptstools_spark.streaming.incremental import (
        incremental_vpts_sink,
        stream_profiles,
    )

    profiles = read_vp_files(spark, f"{VP_DIR}/*.h5")

    batch_store = str(tmp_path / "batch")
    days = spark.createDataFrame(
        [("nosta", "20230311")], "radar_code string, date string"
    )
    daily_vpts_job(spark, profiles, days, batch_store)

    landing = str(tmp_path / "landing")
    profiles.write.parquet(landing)
    stream_store = str(tmp_path / "stream")
    ckpt = str(tmp_path / "ckpt")
    q = incremental_vpts_sink(stream_profiles(spark, landing), stream_store, ckpt)
    q.awaitTermination()

    rel = "p_radar=nosta/p_date=20230311"
    b = sorted(glob.glob(f"{batch_store}/{rel}/*.csv"))
    s = sorted(glob.glob(f"{stream_store}/{rel}/*.csv"))
    assert len(b) == 1 and len(s) == 1
    assert filecmp.cmp(b[0], s[0], shallow=False), "batch vs streaming bytes differ"
    assert filecmp.cmp(s[0], GOLDEN_DAILY, shallow=False), "streaming vs golden"

    before = {
        f: os.stat(f).st_mtime_ns
        for f in glob.glob(f"{stream_store}/**/*.csv", recursive=True)
    }
    q2 = incremental_vpts_sink(stream_profiles(spark, landing), stream_store, ckpt)
    q2.awaitTermination()
    after = {
        f: os.stat(f).st_mtime_ns
        for f in glob.glob(f"{stream_store}/**/*.csv", recursive=True)
    }
    assert after == before, "second AvailableNow run must not rewrite artifacts"
