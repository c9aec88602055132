"""Time-series subsequence search / anomaly / PAA operators
(operators/tsmatch.py) and the hashed-linear text classifier
(operators/text.py:hashed_linear_score).
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from vptstools_spark.operators.text import hashed_linear_score
from vptstools_spark.operators.tsmatch import (
    paa_symbols,
    rolling_zscore_anomalies,
    subsequence_search,
    znorm,
)
from vptstools_spark.plans.asserts import python_eval_nodes, unbounded_global_windows


def _series(spark, rows):
    """rows: (user_id, second_offset, value) triples → events-shaped df."""
    base = datetime.datetime(2024, 1, 1)
    data = [
        (i + 1, base + datetime.timedelta(seconds=s), u, float(v))
        for i, (u, s, v) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, value double"
    )


def test_znorm_basics():
    z = znorm([1.0, 2.0, 3.0, 4.0])
    assert abs(sum(z)) < 1e-12
    assert abs(sum(x * x for x in z) / 4 - 1.0) < 1e-12
    with pytest.raises(ValueError):
        znorm([5.0, 5.0, 5.0])


def test_subsequence_search_finds_planted_ramp(spark):
    # user 1 carries an exact affine image of the pattern (2*ramp + 10):
    # z-normalized distance must be 0. User 2 is noise-ish.
    ramp = [float(i) for i in range(1, 6)]
    rows = [(1, s, 2.0 * v + 10.0) for s, v in enumerate(ramp)]
    rows += [(1, 10 + s, v) for s, v in enumerate([9.0, 1.0, 8.0, 2.0, 7.0])]
    rows += [(2, s, v) for s, v in enumerate([3.0, 3.0, 4.0, 1.0, 2.0, 9.0])]
    df = _series(spark, rows)
    hits = subsequence_search(df, ramp, top_k=3).collect()
    assert hits[0]["user_id"] == 1
    assert hits[0]["event_id"] == 1  # window starting at the planted ramp
    assert hits[0]["dist"] == 0.0
    # every candidate window has exactly L points; later hits have dist > 0
    assert all(h["dist"] >= 0.0 for h in hits)
    assert hits[1]["dist"] > 0.0


def test_subsequence_search_skips_constant_windows(spark):
    rows = [(1, s, 7.0) for s in range(6)]  # constant series: sd == 0
    df = _series(spark, rows)
    assert subsequence_search(df, [1.0, 2.0, 3.0], top_k=5).count() == 0


def test_subsequence_tail_windows_dropped(spark):
    rows = [(1, s, float(s % 3)) for s in range(7)]
    df = _series(spark, rows)
    hits = subsequence_search(df, [1.0, 2.0, 3.0, 4.0], top_k=100)
    # 7 rows, L=4 → only 4 full windows (starts 1..4), minus any sd==0 ones
    assert hits.count() <= 4
    assert hits.filter(F.col("event_id") > 4).count() == 0


def test_rolling_zscore_fires_on_spike_only_after_history(spark):
    # 30 flat-ish points then a huge spike; early rows lack history
    vals = [10.0 + (i % 3) for i in range(30)] + [500.0] + [10.0]
    rows = [(1, s, v) for s, v in enumerate(vals)]
    df = _series(spark, rows)
    hits = rolling_zscore_anomalies(
        df, lookback=20, min_history=10, threshold=2.5
    ).collect()
    assert [h["event_id"] for h in hits] == [31]  # the spike row only
    assert hits[0]["zscore"] > 2.5


def test_rolling_zscore_min_history_guard(spark):
    # spike at row 5: only 4 prior points < min_history → must not fire
    vals = [10.0, 11.0, 10.0, 11.0, 500.0]
    df = _series(spark, [(1, s, v) for s, v in enumerate(vals)])
    assert (
        rolling_zscore_anomalies(df, lookback=20, min_history=10, threshold=2.5).count()
        == 0
    )


def test_paa_symbols_segments_and_breakpoints(spark):
    # 20 points: first 10 avg 10 → 'a', next 10 avg 100 → 'd'
    vals = [10.0] * 10 + [100.0] * 10
    df = _series(spark, [(1, s, v) for s, v in enumerate(vals)])
    out = {
        r["segment"]: (r["paa_mean"], r["sax_symbol"], r["n_points"])
        for r in paa_symbols(df, segment_len=10).collect()
    }
    assert out[0] == (10.0, "a", 10)
    assert out[1] == (100.0, "d", 10)


def test_hashed_linear_score_contract(spark):
    df = spark.createDataFrame(
        [("a b c",), ("",), ("zzz",)], "text string"
    ).select(hashed_linear_score(F.col("text")).alias("s"))
    rows = df.collect()
    assert 0.0 < rows[0]["s"] < 1.0
    assert rows[1]["s"] is None or 0.0 < rows[1]["s"] < 1.0  # empty-ish doc
    # deterministic: same input, same score
    again = df.collect()
    assert [r["s"] for r in rows] == [r["s"] for r in again]


def test_new_queries_plan_discipline(spark):
    """The new TS/classifier/URL queries stay JVM-side with no unbounded
    global windows (registry-wide asserts also cover them; this is the
    fast, targeted check)."""
    from tests.conftest import SF_SMALL as sf_dir
    from vptstools_spark.analytics import ts_q, text_q, pretrain_q

    for fn in [
        ts_q.q_ts_subseq_match,
        ts_q.q_ts_anomaly_zscore,
        ts_q.q_ts_paa_sax,
        text_q.q_quality_classifier,
        pretrain_q.q_url_host_stats,
    ]:
        df = fn(spark, sf_dir)
        assert python_eval_nodes(df) == {}, fn.__name__
        assert unbounded_global_windows(df) == [], fn.__name__


def test_cusum_detects_level_shift_exactly(spark):
    from vptstools_spark.operators.tsmatch import cusum_stats

    # 10 zeros then 10 tens: mu=5, sigma_pop=5, slack=2.5, threshold=20.
    # Up stat climbs 2.5/step after the shift: 22.5 and 25.0 exceed -> 2
    # alarms, max 25; the down stat mirrors it in the first half.
    import datetime

    rows = [
        (i, datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=i),
         7, "t", 0.0 if i < 10 else 10.0)
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = cusum_stats(df, slack=0.5, threshold=4.0).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_up_alarms"], r["n_down_alarms"]) == (2, 2)
    assert (r["max_cusum_up"], r["max_cusum_down"]) == (25.0, 25.0)


def test_cusum_constant_series_never_alarms(spark):
    from vptstools_spark.operators.tsmatch import cusum_stats

    import datetime

    rows = [
        (i, datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=i),
         1, "t", 3.0)
        for i in range(15)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    r = cusum_stats(df).collect()[0]
    assert r["n_up_alarms"] == 0 and r["n_down_alarms"] == 0
    assert r["max_cusum_up"] == 0.0 and r["max_cusum_down"] == 0.0
