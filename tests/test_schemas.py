import pytest

from vptstools_spark.schemas import (
    VPTS_CSV_V1,
    VptsCsvVersionError,
    get_vpts_version,
    profile_long_schema,
)


def test_version_registry():
    assert get_vpts_version("v1.0") is VPTS_CSV_V1
    assert get_vpts_version("v1") is VPTS_CSV_V1


def test_unknown_version_raises():
    # reference: src/vptstools/vpts_csv.py:132-139
    with pytest.raises(VptsCsvVersionError):
        get_vpts_version("v999")


def test_v1_column_order_normative():
    # reference: src/vptstools/vpts_csv.py:266-295; tests/test_vpts.py:75-82
    assert VPTS_CSV_V1.columns == (
        "radar", "datetime", "height",
        "u", "v", "w", "ff", "dd", "sd_vvp", "gap", "eta", "dens", "dbz",
        "dbz_all", "n", "n_dbz", "n_all", "n_dbz_all",
        "rcs", "sd_vvp_threshold", "vcp",
        "radar_latitude", "radar_longitude", "radar_height",
        "radar_wavelength", "source_file",
    )
    assert len(VPTS_CSV_V1.columns) == 26


def test_v1_sentinels_and_sort():
    assert VPTS_CSV_V1.nodata == ""
    assert VPTS_CSV_V1.undetect == "NaN"
    assert VPTS_CSV_V1.sort == (
        ("radar", "string"), ("datetime", "string"),
        ("height", "int"), ("source_file", "string"),
    )


def test_profile_schema_has_state_flags():
    schema = profile_long_schema()
    names = {f.name for f in schema.fields}
    assert {"u", "u__state", "n_dbz_all", "n_dbz_all__state", "gap"} <= names
    assert "gap__state" not in names  # gap is plain boolean
