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


def test_cusum_single_bucket_key_is_null_not_crash(spark):
    # n=1 makes the variance DENOMINATOR zero (before the var>0 test
    # could run) — must flow NULL under ANSI, not DIVIDE_BY_ZERO.
    import datetime as dt
    from openedx_event_sink_clickhouse_spark.operators.timeseries import (
        cusum_changepoint)
    df = spark.createDataFrame(
        [("one", dt.datetime(2024, 1, 1), 5),
         ("two", dt.datetime(2024, 1, 1), 1),
         ("two", dt.datetime(2024, 1, 1, 1), 9)],
        ["key", "bucket", "n"])
    out = {r.key: r for r in
           cusum_changepoint(df, "key", "bucket", "n").collect()}
    assert out["one"].cusum_stat is None and out["one"].significant == 0
    assert out["two"].cusum_stat is not None


def test_forecast_backtest_calendar_lags_on_gappy_series(spark):
    # A missing day must NOT shift the baselines: day 10's naive
    # prediction needs day 9 (absent -> dropped), its seasonal needs
    # day 3 (present -> scored against day 3's value, not the 7th
    # previous OBSERVED row, which a row-lag would pick).
    import datetime
    from openedx_event_sink_clickhouse_spark.operators.timeseries import (
        forecast_backtest)
    d0 = datetime.date(2024, 1, 1)
    days = [i for i in range(11) if i != 9]  # gap at day index 9
    rows = [("k", d0 + datetime.timedelta(days=i), 100 + i) for i in days]
    df = spark.createDataFrame(rows, ["key", "day", "y"])
    out = {r.model: r for r in
           forecast_backtest(df, "key", "day", "y").collect()}
    # holdout = days 4..10 present = {4,5,6,7,8,10}; naive needs d-1:
    # valid for 4,5,6,7,8 (10 lacks day 9) -> 5 scored, |err|=1 each
    assert out["naive"].n_days == 5 and out["naive"].mae == 1.0
    # seasonal needs d-7: valid for 7,8,10 (4,5,6 predate history);
    # errors are exactly 7 each (y grows 1/day)
    assert out["seasonal_naive"].n_days == 3
    assert out["seasonal_naive"].mae == 7.0
