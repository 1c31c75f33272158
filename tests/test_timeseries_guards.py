"""Degenerate-input guards for the session-2 time-series operators:
constant/short series must yield NULLs or exact values, never
divide-by-zero artifacts."""

from __future__ import annotations

from openedx_event_sink_clickhouse_spark.operators.timeseries import (
    autocorrelation, ewma_smooth, seasonal_profile)


def test_autocorrelation_constant_series_is_null(spark):
    # zero variance on either margin -> acf NULL (undefined), not NaN/err
    df = spark.createDataFrame([("k", i, 5) for i in range(10)],
                               ["key", "t", "x"])
    out = autocorrelation(df, "key", "t", "x", lags=(1,)).collect()
    assert len(out) == 1 and out[0].acf is None
    assert out[0].n_pairs == 9


def test_autocorrelation_series_shorter_than_lag_emits_nothing(spark):
    df = spark.createDataFrame([("k", 0, 1), ("k", 1, 2)],
                               ["key", "t", "x"])
    out = autocorrelation(df, "key", "t", "x", lags=(5,)).collect()
    assert out == []


def test_ewma_single_row_is_identity(spark):
    df = spark.createDataFrame([("k", 0, 3)], ["key", "t", "x"])
    assert ewma_smooth(df, "key", "t", "x").collect()[0].ewma == 3.0


def test_seasonal_profile_all_zero_series_null_index(spark):
    # A key whose series is entirely zeros has no overall mean to index
    # against: seasonal_index NULL, mean_events 0.0.
    import datetime
    t0 = datetime.datetime(2024, 1, 1)
    rows = [("k", t0 + datetime.timedelta(hours=h), 0) for h in range(48)]
    df = spark.createDataFrame(rows, ["key", "bucket", "n"])
    out = seasonal_profile(df, "key", "bucket", "n").collect()
    assert all(r.mean_events == 0.0 and r.seasonal_index is None
               for r in out)
