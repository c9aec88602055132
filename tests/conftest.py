import datetime

import pytest

from vptstools_spark.schemas import STATE_NODATA, STATE_UNDETECT, STATE_VALUE

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from vptstools_spark.session import get_spark

    spark = get_spark("vptstools_spark_tests", shuffle_partitions=8)
    yield spark


def make_profile_record(
    source_file="nosta_vp_20230311T231500Z_0xb.h5",
    radar="nosta",
    ts=None,
    height=0,
    u=None,
    u_state=STATE_NODATA,
    gap=False,
    vcp="NULL",
    **overrides,
):
    """One long-format profile row with sane metadata defaults
    (values mirror the reference conftest fixture, FIXTURES.md §1)."""
    r = {
        "source_file": source_file,
        "radar": radar,
        "ts": ts or datetime.datetime(2023, 3, 11, 23, 15),
        "height": height,
        "gap": gap,
        "rcs": 11.0,
        "sd_vvp_threshold": 2.0,
        "vcp": vcp,
        "radar_latitude": 62.187076,
        "radar_longitude": 5.127454,
        "radar_height": 506,
        "radar_wavelength": 5.3,
        "u": u,
        "u__state": u_state,
    }
    for c in ["v", "w", "ff", "dd", "sd_vvp", "eta", "dens", "dbz", "dbz_all"]:
        r[c] = None
        r[f"{c}__state"] = STATE_NODATA
    for c in ["n", "n_dbz", "n_all", "n_dbz_all"]:
        r[c] = 0
        r[f"{c}__state"] = STATE_VALUE
    r.update(overrides)
    return r
