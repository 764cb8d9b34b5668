"""Time-series operator semantics pinned on hand-built frames (the parity
suite checks fixture-scale agreement; these pin the edge behavior)."""

from __future__ import annotations

from datetime import datetime

from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.timeseries import (
    ewma,
    gap_fill_interpolate,
    resample_ohlc,
)


def _ts(h, m=0):
    return datetime(2024, 1, 1, h, m)


def test_ohlc_open_close_by_order_col(spark):
    rows = [
        (1, _ts(0, 5), "a", 10.0),
        (2, _ts(0, 20), "a", 30.0),
        (3, _ts(0, 40), "a", 20.0),
        (4, _ts(1, 0), "a", 5.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, k string, value double")
    bars = {
        r.bucket_ts.hour: r
        for r in resample_ohlc(df, "ts", "k", "value", "event_id").collect()
    }
    b0 = bars[0]
    assert (b0.open, b0.high, b0.low, b0.close, b0.n_events) == (10.0, 30.0, 10.0, 20.0, 3)
    assert bars[1].open == bars[1].close == 5.0


def test_gap_fill_linear_and_edges(spark):
    # observed at hours 0 and 3 (10 -> 40): hours 1,2 interpolate to 20, 30
    rows = [("a", _ts(0), 10.0), ("a", _ts(3), 40.0), ("b", _ts(2), 7.0)]
    df = spark.createDataFrame(rows, "series_key string, bucket_ts timestamp, mean_value double")
    got = {
        (r.series_key, r.bucket_ts.hour): (r.filled_value, r.observed)
        for r in gap_fill_interpolate(df).collect()
    }
    assert got[("a", 1)] == (20.0, False) and got[("a", 2)] == (30.0, False)
    # series b: carry-back before its first observation, carry-forward after
    assert got[("b", 0)] == (7.0, False) and got[("b", 3)] == (7.0, False)
    assert got[("b", 2)] == (7.0, True)
    # spine covers the global range for every key
    assert len(got) == 8


def test_ewma_recursion(spark):
    rows = [("a", _ts(h), float(v)) for h, v in [(0, 10), (1, 20), (2, 10)]]
    df = spark.createDataFrame(rows, "series_key string, bucket_ts timestamp, mean_value double")
    got = {r.bucket_ts.hour: r.ewma_value for r in ewma(df, alpha=0.2).collect()}
    assert got[0] == 10.0
    assert got[1] == round(0.2 * 20 + 0.8 * 10.0, 6)  # 12.0
    assert got[2] == round(0.2 * 10 + 0.8 * 12.0, 6)  # 11.6
