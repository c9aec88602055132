"""Incremental daily/monthly pipeline e2e (reference: tests/test_vph5_to_vpts.py)."""

import datetime
import glob
import gzip
import json
import os

import pytest

from tests.conftest import make_profile_record
from vptstools_spark.operators.pipeline import (
    incremental_run,
    read_daily_csv_string_preserving,
    resolve_source_file,
    write_descriptor,
)
from vptstools_spark.schemas import STATE_UNDETECT, STATE_VALUE
from vptstools_spark.sources.odim import profiles_from_records


def _named_transform(path):
    return "renamed_" + os.path.basename(path)


def test_resolve_source_file_default_and_callable():
    # reference: src/vptstools/vpts.py:189-220 (P16)
    assert resolve_source_file("/a/b/file.h5", None) == "file.h5"
    assert resolve_source_file("/a/b/file.h5", "fixed.h5") == "fixed.h5"
    assert resolve_source_file("/a/b/file.h5", _named_transform) == "renamed_file.h5"


def test_resolve_source_file_rejects_lambda():
    # reference: src/vptstools/vpts.py:237-239 (pickling constraint)
    with pytest.raises(ValueError, match="lambda"):
        resolve_source_file("x.h5", lambda p: p)


def test_write_descriptor(tmp_path):
    out = write_descriptor(str(tmp_path))
    desc = json.load(open(out))
    assert desc["format"] == "csv"
    assert "v1.0" in desc["schema"]


@pytest.fixture(scope="module")
def pipeline_output(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("vpts_out"))
    # two radar-days for 'nosta', one of which is recent; one old 'bejab' day
    recs = []
    for day, minute in [(11, 15), (11, 25), (12, 0)]:
        recs.append(
            make_profile_record(
                ts=datetime.datetime(2023, 3, day, 23, minute),
                source_file=f"nosta_vp_202303{day:02d}T{23:02d}{minute:02d}00Z_0xb.h5",
                height=0,
                u=1.25,
                u_state=STATE_VALUE,
            )
        )
    recs.append(
        make_profile_record(
            radar="bejab",
            ts=datetime.datetime(2022, 11, 11, 23, 30),
            source_file="bejab_vp_20221111T233000Z_0x9.h5",
            height=200,
            u=None,
            u_state=STATE_UNDETECT,
        )
    )
    profiles = profiles_from_records(spark, recs)

    inv_rows = [
        ("repo", "baltrad/hdf5/nosta/2023/03/11/nosta_vp_20230311T231500Z_0xb.h5", 1, datetime.datetime(2023, 3, 12, 1, 0)),
        ("repo", "baltrad/hdf5/nosta/2023/03/11/nosta_vp_20230311T232500Z_0xb.h5", 1, datetime.datetime(2023, 3, 12, 1, 0)),
        ("repo", "baltrad/hdf5/nosta/2023/03/12/nosta_vp_20230312T000000Z_0xb.h5", 1, datetime.datetime(2023, 3, 12, 1, 0)),
        ("repo", "baltrad/hdf5/bejab/2022/11/11/bejab_vp_20221111T233000Z_0x9.h5", 1, datetime.datetime(2022, 11, 12, 1, 0)),
    ]
    inventory = spark.createDataFrame(
        inv_rows, "repo string, file string, size long, modified timestamp"
    )
    days = incremental_run(
        spark,
        inventory,
        profiles,
        root,
        modified_days_ago=2,
        now=datetime.datetime(2023, 3, 13, 0, 0),
    )
    return root, days


def test_incremental_selects_recent_days(pipeline_output):
    _, days = pipeline_output
    dirs = {r["directory"] for r in days.collect()}
    assert dirs == {
        "baltrad/hdf5/nosta/2023/03/11",
        "baltrad/hdf5/nosta/2023/03/12",
    }  # bejab 2022 is outside the window


def test_daily_partitions_written(pipeline_output):
    root, _ = pipeline_output
    parts = sorted(
        os.path.relpath(p, os.path.join(root, "daily"))
        for p in glob.glob(os.path.join(root, "daily", "p_radar=*", "p_date=*"))
    )
    assert parts == ["p_radar=nosta/p_date=20230311", "p_radar=nosta/p_date=20230312"]


def test_daily_csv_content_sorted(pipeline_output, spark):
    root, _ = pipeline_output
    files = glob.glob(os.path.join(root, "daily", "p_radar=nosta", "p_date=20230311", "*.csv"))
    lines = [ln for f in files for ln in open(f).read().splitlines()[1:]]
    assert len(lines) == 2
    assert lines[0].split(",")[1] < lines[1].split(",")[1]  # datetime ascending
    assert lines[0].split(",")[3] == "1.25"  # u value rendered


def test_monthly_gzip_written(pipeline_output):
    root, _ = pipeline_output
    gz = glob.glob(os.path.join(root, "monthly", "p_radar=nosta", "p_month=202303", "*.csv.gz"))
    assert gz
    text = gzip.open(gz[0], "rt").read()
    assert text.count("\n") == 4  # header + 3 rows (both days of the month)


def test_string_preserving_reread(pipeline_output, spark):
    # tri-state text must survive write→read (SURVEY §7.4.2)
    root, _ = pipeline_output
    df = read_daily_csv_string_preserving(spark, os.path.join(root, "daily"))
    rows = df.collect()
    assert all(r["v"] == "" for r in rows)  # nodata stays empty string, not NULL
    assert {r["u"] for r in rows} == {"1.25"}


def test_descriptor_written(pipeline_output):
    root, _ = pipeline_output
    assert os.path.exists(os.path.join(root, "vpts.resource.json"))


def test_odim_fleet_small_file_packing_and_e2e(spark, tmp_path):
    """The S1 100 TB design claim, measured mechanically (VERDICT r7 #1):
    binaryFile + files.maxPartitionBytes packs MANY small .h5 files per
    task (tasks << files), and the synthesized fleet flows end-to-end
    through read_vp_files → daily_vpts_job with the expected row and
    partition counts."""
    import glob as _glob

    from pyspark.sql import functions as F

    from tools.gen_odim import main as gen_odim
    from vptstools_spark.operators.pipeline import daily_vpts_job
    from vptstools_spark.sources.odim import read_vp_files

    fleet = str(tmp_path / "fleet")
    n_files = gen_odim(fleet, n_radars=2, n_days=1, per_day=24)
    assert n_files == 48
    pat = os.path.join(fleet, "*", "*", "*", "*")
    profiles = read_vp_files(spark, pat)
    tasks = profiles.rdd.getNumPartitions()
    assert 0 < tasks < n_files, f"no packing: {tasks} tasks for {n_files} files"
    assert profiles.count() == 48 * 25  # 25 altitude levels per VP file

    # distinct patched identities survived the byte patch
    radars = {r["radar"] for r in profiles.select("radar").distinct().collect()}
    assert radars == {"syaaa", "sybbb"}

    days = profiles.select(
        F.col("radar").alias("radar_code"),
        F.date_format("ts", "yyyyMMdd").alias("date"),
    ).distinct()
    out = str(tmp_path / "daily")
    daily_vpts_job(spark, read_vp_files(spark, pat), days, out)
    parts = _glob.glob(os.path.join(out, "p_radar=*", "p_date=*"))
    assert len(parts) == 2  # 2 radars × 1 day
    csvs = _glob.glob(os.path.join(out, "p_radar=syaaa", "p_date=*", "*.csv"))
    n_lines = sum(open(c).read().count("\n") for c in csvs)
    assert n_lines == 24 * 25 + len(csvs)  # rows + one header per file
