"""As-of join semantics on hand-built fixtures: latest right row
at-or-before each left timestamp, per key; left-outer NULLs; equal
timestamps match (right sorts before left)."""

from __future__ import annotations

import datetime as dt

from openedx_event_sink_clickhouse_spark.operators.asof import asof_join


def _t(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_basic_and_ties_and_missing(spark):
    left = spark.createDataFrame(
        [(1, "A", _t(1)), (2, "A", _t(2)), (3, "A", _t(6)), (4, "B", _t(3))],
        "id long, k string, ts timestamp")
    right = spark.createDataFrame(
        [("A", _t(2), 10.0), ("A", _t(5), 20.0)],
        "k string, rts timestamp, price double")

    out = {r.id: r for r in
           asof_join(left, right, "k", "ts", "rts", ["price"]).collect()}
    assert out[1].asof_price is None          # before any right row
    assert out[2].asof_price == 10.0          # equal ts matches
    assert out[2].asof_rts == _t(2)
    assert out[3].asof_price == 20.0          # latest of two priors
    assert out[4].asof_price is None          # key with no right rows
    assert len(out) == 4                      # left row count preserved


def test_asof_single_shuffle_plan(spark):
    left = spark.createDataFrame([(1, "A", _t(1))],
                                 "id long, k string, ts timestamp")
    right = spark.createDataFrame([("A", _t(0), 1.0)],
                                  "k string, rts timestamp, price double")
    plan = (asof_join(left, right, "k", "ts", "rts", ["price"])
            ._jdf.queryExecution().executedPlan().toString())
    # union + window: exactly one hash-partitioning exchange on the key
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_asof_tolerance_nulls_stale_matches(spark):
    # merge_asof(tolerance=...) semantics: a prior snapshot older than
    # the bound is NO match — every matched column reverts to NULL.
    from pyspark.sql import functions as F

    from openedx_event_sink_clickhouse_spark.operators.asof import asof_join
    left = spark.createDataFrame(
        [(1, "2024-01-10 00:00:00", 100),
         (1, "2024-01-02 06:00:00", 101),
         (2, "2024-01-05 00:00:00", 102)],   # no prior right row at all
        "k long, ts string, eid long").withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 7.0)],
        "k long, ts string, v double").withColumn("ts", F.to_timestamp("ts"))
    got = {r.eid: (r.asof_ts, r.asof_v) for r in
           asof_join(left, right, "k", "ts", "ts", ["v"],
                     tolerance="2 days").collect()}
    assert got[100] == (None, None)            # match exists but stale
    assert got[101][1] == 7.0                  # within 2 days
    assert got[102] == (None, None)            # never matched
    # Without the bound the stale match comes back.
    loose = {r.eid: r.asof_v for r in
             asof_join(left, right, "k", "ts", "ts", ["v"]).collect()}
    assert loose[100] == 7.0


def test_asof_nearest_picks_closer_side_and_breaks_ties_backward(spark):
    import datetime as dt
    from openedx_event_sink_clickhouse_spark.operators.asof import (
        asof_nearest)
    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(1, 1, t(10)),   # back at 8 (d=2), fwd at 13 (d=3) -> back
         (2, 1, t(12)),   # back at 8 (d=4), fwd at 13 (d=1) -> fwd
         (3, 1, t(5)),    # no back -> fwd at 8
         (4, 1, t(20)),   # no fwd -> back at 13
         (5, 2, t(9))],   # key with no right rows -> NULLs
        ["event_id", "user_id", "ts"])
    right = spark.createDataFrame(
        [(1, t(8), 80.0), (1, t(13), 130.0)],
        ["user_id", "ts", "value"])
    out = {r["event_id"]: r for r in
           asof_nearest(left, right, "user_id", "ts", "ts",
                        ["value"]).collect()}
    assert out[1]["asof_value"] == 80.0 and out[1]["asof_delta_us"] == 2_000_000
    assert out[2]["asof_value"] == 130.0 and out[2]["asof_delta_us"] == -1_000_000
    assert out[3]["asof_value"] == 80.0
    assert out[4]["asof_value"] == 130.0
    assert out[5]["asof_value"] is None and out[5]["asof_delta_us"] is None
    # exact tie: left at 10.5 between 8 and 13. Use integer-second grid:
    # left at 9 -> back d=1 vs fwd d=4 -> back; craft a true tie at 10.5us
    tie_left = spark.createDataFrame(
        [(9, 1, dt.datetime(2024, 1, 1, 0, 0, 10, 500000))],
        ["event_id", "user_id", "ts"])
    tie = asof_nearest(tie_left, right, "user_id", "ts", "ts",
                       ["value"]).collect()[0]
    assert tie["asof_value"] == 80.0      # equidistant -> earlier row


def test_asof_nearest_tolerance_reverts_to_null(spark):
    import datetime as dt
    from openedx_event_sink_clickhouse_spark.operators.asof import (
        asof_nearest)
    left = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 1, 5))], ["event_id", "user_id", "ts"])
    right = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1.0)], ["user_id", "ts", "value"])
    hit = asof_nearest(left, right, "user_id", "ts", "ts", ["value"],
                       tolerance_us=5 * 86_400_000_000).collect()[0]
    assert hit["asof_value"] == 1.0
    miss = asof_nearest(left, right, "user_id", "ts", "ts", ["value"],
                        tolerance_us=86_400_000_000).collect()[0]
    assert miss["asof_value"] is None and miss["asof_delta_us"] is None


def test_asof_match_is_atomic_when_value_is_null(spark):
    import datetime as dt
    from openedx_event_sink_clickhouse_spark.operators.asof import (
        asof_join, asof_nearest)
    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame([(1, 1, t(11))],
                                 ["event_id", "user_id", "ts"])
    # nearest/latest right row (t=10) carries a NULL value: the match
    # must return THAT row's NULL, never backfill the value from t=5
    right = spark.createDataFrame([(1, t(5), 7.0), (1, t(10), None)],
                                  ["user_id", "ts", "value"])
    j = asof_join(left, right, "user_id", "ts", "ts", ["value"]).collect()[0]
    assert j["asof_ts"] == t(10) and j["asof_value"] is None
    n = asof_nearest(left, right, "user_id", "ts", "ts",
                     ["value"]).collect()[0]
    assert n["asof_ts"] == t(10) and n["asof_value"] is None
    assert n["asof_delta_us"] == 1_000_000
