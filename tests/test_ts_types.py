"""Timestamp-annotation robustness: the driver's testdata has been written
with both parquet timestamp flavors across rounds — isAdjustedToUTC=true
(Spark reads TIMESTAMP) and =false (Spark reads TIMESTAMP_NTZ). Every
ts-touching query must analyze AND produce identical values under either
annotation (with the session zone fixed to UTC, the instants coincide).

Round-2 regression this guards: `unix_micros(ts)` / `unix_millis(ts)` raise
DATATYPE_MISMATCH on NTZ inputs — caught only when the driver regenerated
the data. See functions/scalars.py:epoch_expr for the portable form.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from vptstools_spark.analytics import all_queries

#: queries whose plan touches the events `ts` column
TS_QUERIES = [
    "events_hourly",
    "events_sessionize",
    "events_session_window",
    "events_running",
    "events_lag_delta",
    "events_asof_join",
    "events_asof_nearest",
    "events_funnel",
    "events_resample_locf",
    "events_pivot",
    "moving_avg_range",
    "scd2_event_types",
    "events_interval_join",
    "retention_cohorts",
    "events_hop_window",
    "kaplan_meier",
    "attribution_linear",
    "attribution_time_decay",
    "events_trigrams",
    "markov_next_event_eval",
    "rolling_distinct_users",
    "user_value_ewma",
    "did_estimate",
    "event_burstiness",
    "funnel_time_percentiles",
    "repeat_purchase_interval",
    # round 8
    "mcnemar_paired",
    "retention_curve_fit",
    # round 9
    "nelson_aalen",
    "cuped_adjusted",
    "seq_rule_mining",
]


def _normalized(df):
    """Stringified, column-sorted, row-sorted frame; strips the +00:00 tz
    suffix so LTZ and NTZ renderings of the same UTC instant compare equal."""
    out = df.toPandas().astype(str)
    for c in out.columns:
        out[c] = out[c].str.replace("+00:00", "", regex=False)
    out = out[sorted(out.columns)]
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def ts_variant_dirs(tmp_path_factory):
    """Two copies of sf0.001 events: naive (NTZ) and UTC-annotated (LTZ)."""
    t = pq.read_table("/root/testdata/sf0.001/events.parquet")
    i = t.schema.get_field_index("ts")
    out = {}
    for name, typ in (
        ("ntz", pa.timestamp("us")),
        ("ltz", pa.timestamp("us", tz="UTC")),
    ):
        d = tmp_path_factory.mktemp(f"events_{name}")
        t2 = t.set_column(i, pa.field("ts", typ), t.column("ts").cast(typ))
        pq.write_table(t2, str(d / "events.parquet"))
        out[name] = str(d)
    return out


@pytest.mark.parametrize("name", TS_QUERIES)
def test_ts_query_agnostic_to_parquet_annotation(spark, ts_variant_dirs, name):
    fn = all_queries()[name]
    ntz = _normalized(fn(spark, ts_variant_dirs["ntz"]))
    ltz = _normalized(fn(spark, ts_variant_dirs["ltz"]))
    assert list(ntz.columns) == list(ltz.columns)
    assert ntz.equals(ltz), f"{name}: NTZ vs LTZ results differ"
