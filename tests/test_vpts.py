"""Core VPTS pipeline invariants (reference: tests/test_vpts.py layers 2-3)."""

import datetime

import pytest

from tests.conftest import make_profile_record
from vptstools_spark.operators.vpts import sort_vpts, to_vpts_table, validate_vpts, vpts_to_csv
from vptstools_spark.schemas import (
    STATE_NODATA,
    STATE_UNDETECT,
    STATE_VALUE,
    VPTS_CSV_V1,
)
from vptstools_spark.sources.odim import profiles_from_records


@pytest.fixture(scope="module")
def vpts_df(spark):
    recs = [
        make_profile_record(height=0, gap=True),
        make_profile_record(height=600, u=None, u_state=STATE_UNDETECT),
        make_profile_record(
            height=800,
            u=2.498448133468628,
            u_state=STATE_VALUE,
            source_file="nosta_vp_20230311T232500Z_0xb.h5",
            ts=datetime.datetime(2023, 3, 11, 23, 25),
        ),
        # duplicate key (radar, datetime, height), distinct source_file
        make_profile_record(
            height=800,
            u=1.5,
            u_state=STATE_VALUE,
            source_file="nosta_vp_20230311T232500Z_0xa.h5",
            ts=datetime.datetime(2023, 3, 11, 23, 25),
        ),
    ]
    return to_vpts_table(profiles_from_records(spark, recs))


def test_column_order(vpts_df):
    # reference: tests/test_vpts.py:75-82
    assert tuple(vpts_df.columns) == VPTS_CSV_V1.columns


def test_all_string_rendering(vpts_df):
    # serialized form is all-string (reference: tests/test_vpts.py:66-73);
    # internal typing is Spark's business, the sink schema is the contract
    assert all(f.dataType.typeName() == "string" for f in vpts_df.schema.fields)


def test_tristate_rendering(vpts_df):
    # reference: tests/test_vpts.py:109-139 — "" = nodata, "NaN" = undetect
    rows = {(r["height"], r["source_file"]): r for r in vpts_df.collect()}
    assert rows[("0", "nosta_vp_20230311T231500Z_0xb.h5")]["u"] == ""
    assert rows[("600", "nosta_vp_20230311T231500Z_0xb.h5")]["u"] == "NaN"
    assert rows[("800", "nosta_vp_20230311T232500Z_0xb.h5")]["u"] == "2.498448133468628"


def test_duplicates_preserved(vpts_df):
    # reference: tests/test_vpts.py:84-91 — no implicit dedup
    dups = [r for r in vpts_df.collect() if r["height"] == "800"]
    assert len(dups) == 2
    assert {r["source_file"] for r in dups} == {
        "nosta_vp_20230311T232500Z_0xa.h5",
        "nosta_vp_20230311T232500Z_0xb.h5",
    }


def test_sort_order_and_idempotence(vpts_df):
    # reference: tests/test_vpts.py:93-107 — height compared as int;
    # re-sorting is a no-op
    rows = vpts_df.collect()
    keys = [(r["radar"], r["datetime"], int(r["height"]), r["source_file"]) for r in rows]
    assert keys == sorted(keys)
    rows2 = sort_vpts(vpts_df, VPTS_CSV_V1).collect()
    assert rows == rows2


def test_gap_and_vcp_rendering(vpts_df):
    rows = {(r["height"], r["source_file"]): r for r in vpts_df.collect()}
    assert rows[("0", "nosta_vp_20230311T231500Z_0xb.h5")]["gap"] == "TRUE"
    assert rows[("600", "nosta_vp_20230311T231500Z_0xb.h5")]["gap"] == "FALSE"
    # vcp 'NULL' → nodata ""
    assert rows[("0", "nosta_vp_20230311T231500Z_0xb.h5")]["vcp"] == ""


def test_metadata_rendering(vpts_df):
    r = vpts_df.collect()[0]
    assert r["radar_latitude"] == "62.187076"
    assert r["radar_longitude"] == "5.127454"
    assert r["radar_height"] == "506"
    assert r["radar_wavelength"] == "5.3"
    assert r["datetime"].endswith("Z") and "T" in r["datetime"]


def test_validate_clean(vpts_df):
    assert validate_vpts(vpts_df).collect() == []


def test_validate_flags_bad_source_file(spark):
    recs = [make_profile_record(source_file="../evil.h5")]
    df = to_vpts_table(profiles_from_records(spark, recs))
    rules = {r["rule"] for r in validate_vpts(df).collect()}
    assert "source_file_safe" in rules


def test_csv_sink_golden_format(tmp_path, vpts_df):
    # golden-row format parity with FIXTURES.md §2 example rows
    out = str(tmp_path / "daily.csv")
    vpts_to_csv(vpts_df, out)
    lines = open(out).read().splitlines()
    assert lines[0].startswith("radar,datetime,height,u,v,w,ff,dd,sd_vvp,gap,")
    assert lines[1] == (
        "nosta,2023-03-11T23:15:00Z,0,,,,,,,TRUE,,,,,0,0,0,0,"
        "11.0,2.0,,62.187076,5.127454,506,5.3,nosta_vp_20230311T231500Z_0xb.h5"
    )
    assert len(lines) == 5


def test_empty_input(spark):
    df = to_vpts_table(profiles_from_records(spark, []))
    assert df.count() == 0
    assert tuple(df.columns) == VPTS_CSV_V1.columns


def test_validate_order_guard_and_per_file(spark, tmp_path):
    """validate_vpts_order refuses table-scale inputs for the global
    one-task check and offers a parallel per-file mode (VERDICT r5
    watch-point)."""
    import pytest

    from vptstools_spark.operators.vpts import validate_vpts_order

    rows = [("r1", f"2024-01-01T{h:02d}:00:00Z", str(h * 100), "a.h5")
            for h in range(10)]
    df = spark.createDataFrame(
        rows, "radar string, datetime string, height string, source_file string"
    )
    assert validate_vpts_order(df) == 0
    with pytest.raises(ValueError, match="one-task"):
        validate_vpts_order(df, max_rows=5)
    # per-file mode: write two files, one sorted, one inverted
    p = str(tmp_path / "files")
    df.coalesce(1).write.mode("overwrite").csv(p + "/f1", header=True)
    spark.createDataFrame(
        list(reversed(rows)),
        "radar string, datetime string, height string, source_file string",
    ).coalesce(1).write.mode("overwrite").csv(p + "/f2", header=True)
    back = spark.read.option("header", True).csv(p + "/f*")
    n_bad = validate_vpts_order(back, per_file=True)
    assert n_bad == 9  # every adjacent pair in the reversed file inverts
