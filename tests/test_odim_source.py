"""ODIM decode semantics — pure-function layer (no h5py required).

reference: src/vptstools/vpts.py:27-67 (gain/offset + sentinel order).
"""

import numpy as np
import pytest

from vptstools_spark.schemas import STATE_NODATA, STATE_UNDETECT, STATE_VALUE
from vptstools_spark.sources.odim import (
    _parse_source_identifiers,
    decode_quantity,
)


def test_gain_offset_decode():
    raw = np.array([0, 1, 2], dtype=np.uint8)
    values, states = decode_quantity(raw, gain=2.0, offset=1.0, nodata=255, undetect=254, dtype=np.dtype("float32"))
    assert values == [1.0, 3.0, 5.0]
    assert states == [STATE_VALUE] * 3


def test_sentinel_compare_on_decoded_value():
    # sentinel match happens AFTER gain/offset (reference vpts.py:58-66)
    raw = np.array([5.0, 1.0], dtype=np.float32)
    # decoded = raw*2 → [10, 2]; nodata attr = 10 → first cell is nodata
    values, states = decode_quantity(raw, gain=2.0, offset=0.0, nodata=10.0, undetect=-1.0, dtype=np.dtype("float32"))
    assert values == [None, 2.0]
    assert states == [STATE_NODATA, STATE_VALUE]


def test_nodata_wins_over_undetect():
    raw = np.array([7.0], dtype=np.float32)
    values, states = decode_quantity(raw, gain=1.0, offset=0.0, nodata=7.0, undetect=7.0, dtype=np.dtype("float32"))
    assert states == [STATE_NODATA]


def test_float32_roundtrip_precision():
    # float32 cast then python-float widening → full double repr
    # (SURVEY §7.4.1: golden values like 2.6825144290924072)
    raw = np.array([123], dtype=np.uint16)
    gain, offset = 0.021808572593828525, 0.0
    values, _ = decode_quantity(raw, gain, offset, 65535, 0xFFFE, np.dtype("float32"))
    expected = float(np.float32(123 * gain))
    assert values == [expected]


def test_int_dtype_preserved():
    raw = np.array([10, 255], dtype=np.uint8)
    values, states = decode_quantity(raw, gain=1.0, offset=0.0, nodata=255, undetect=254, dtype=raw.dtype)
    assert values == [10, None]
    assert states == [STATE_VALUE, STATE_NODATA]


def test_parse_source_identifiers():
    got = _parse_source_identifiers("WMO:06477,RAD:BX41,NOD:bewid,PLC:Wideumont")
    assert got["NOD"] == "bewid"
    assert got["WMO"] == "06477"


def test_parse_odim_bytes_runs_without_h5py():
    # the pure-Python HDF5 fallback (sources/hdf5.py) makes the byte path
    # available even where h5py is absent — real-file coverage lives in
    # tests/test_hdf5_e2e.py
    import vptstools_spark.sources.hdf5 as h5mod

    assert hasattr(h5mod, "H5File")
