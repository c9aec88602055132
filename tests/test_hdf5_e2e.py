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
