"""Synthesize a fleet of small ODIM HDF5 VP files for the ingest bench.

The reference's headline job is MANY ~25 KB HDF5 files → daily/monthly
VPTS CSV (reference: src/vptstools/bin/vph5_to_vpts.py:153-250). The
engine's byte-exact goldens prove correctness on the handful of real
fixtures; this generator produces the SCALE shape — thousands of small
files across radars × days × timestamps — so the bench can measure what
the 100 TB design claim for S1 actually asserts: `binaryFile` packs many
small files per task (VERDICT r7 #1: "asserted, never measured").

Construction: byte-patch a real reference VP fixture (same-length ASCII
attribute replacements only — HDF5 offsets never move), varying
`what/date`, `what/time`, and the NOD radar code in `what/source`, and
name/place each file in the reference's `{radar}/{yyyy}/{mm}/{dd}/`
layout. Every generated file is a VALID ODIM HDF5 file (the bundled
pure-Python reader parses it; generation self-checks one file per
radar). Files are generated on demand into an untracked fixtures dir —
reference-derived bytes are never committed.
"""

from __future__ import annotations

import datetime as dt
import os

#: the smallest real VP fixture acts as the byte template
TEMPLATE = (
    "/root/reference/tests/data/vp/bejab/2022/11/11/"
    "bejab_vp_20221111T234000Z_0x9.h5"
)
#: same-length replacement targets inside the template's METADATA region
#: (attribute values + two embedded filename strings; verified to not
#: occur inside compressed data chunks)
_T_DATE = b"20221111"
_T_TIME_NOMINAL = b"234000"  # filename / task strings
_T_TIME_ACTUAL = b"233000"   # what/time attribute value
_T_RADAR = b"bejab"

#: deterministic 5-char synthetic radar codes (same length as "bejab")
RADARS = ["syaaa", "sybbb", "syccc", "syddd", "syeee", "syfff"]


def _patched(template: bytes, radar: str, date: str, hhmm: str) -> bytes:
    t = hhmm + "00"
    out = template.replace(_T_DATE, date.encode())
    out = out.replace(_T_TIME_NOMINAL, t.encode())
    out = out.replace(_T_TIME_ACTUAL, t.encode())
    out = out.replace(_T_RADAR, radar.encode())
    assert len(out) == len(template)  # same-length: offsets intact
    return out


def main(
    out_dir: str,
    n_radars: int = 4,
    n_days: int = 3,
    per_day: int = 96,
    start: str = "2023-03-01",
) -> int:
    """Generate n_radars × n_days × per_day VP files under `out_dir`
    (reference directory layout). Returns the file count. Idempotent:
    an existing populated out_dir is left untouched."""
    marker = os.path.join(out_dir, "_complete")
    if os.path.exists(marker):
        with open(marker) as fh:
            return int(fh.read().strip())
    if n_radars > len(RADARS):
        raise ValueError(f"at most {len(RADARS)} radars supported")
    with open(TEMPLATE, "rb") as fh:
        template = fh.read()
    day0 = dt.date.fromisoformat(start)
    n = 0
    for radar in RADARS[:n_radars]:
        checked = False
        for d in range(n_days):
            day = day0 + dt.timedelta(days=d)
            date = day.strftime("%Y%m%d")
            ddir = os.path.join(
                out_dir, radar, day.strftime("%Y/%m/%d")
            )
            os.makedirs(ddir, exist_ok=True)
            for k in range(per_day):
                hhmm = f"{(k * 1440 // per_day) // 60:02d}{(k * 1440 // per_day) % 60:02d}"
                content = _patched(template, radar, date, hhmm)
                if not checked:
                    _self_check(content, radar, date, hhmm)
                    checked = True
                fname = f"{radar}_vp_{date}T{hhmm}00Z_0x9.h5"
                with open(os.path.join(ddir, fname), "wb") as fh:
                    fh.write(content)
                n += 1
    with open(marker, "w") as fh:
        fh.write(str(n))
    return n


def _self_check(content: bytes, radar: str, date: str, hhmm: str) -> None:
    """One generated file per radar must parse as a valid ODIM VP with
    the patched identity — catches any template drift loudly."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from vptstools_spark.sources.odim import parse_odim_bytes

    rows = parse_odim_bytes("gen.h5", content)
    assert rows and rows[0]["radar"] == radar
    ts = rows[0]["ts"]
    assert ts.strftime("%Y%m%d") == date and ts.strftime("%H%M") == hhmm


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "fixtures/odim_ingest"
    print(main(out))
