"""Bucketed range join: interval containment semantics on fixtures,
boundary inclusivity, cross-bucket intervals, and — the point of the
operator — a hash join plan instead of BroadcastNestedLoopJoin."""

from __future__ import annotations

import datetime as dt

from openedx_event_sink_clickhouse_spark.operators.rangejoin import range_join


def _t(m, s=0):
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(minutes=m, seconds=s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "A", _t(5)), (2, "A", _t(10)), (3, "A", _t(75)),
         (4, "B", _t(5))],
        "id long, k string, ts timestamp")
    right = spark.createDataFrame(
        # interval [5, 70] spans two 1h buckets; B has no intervals
        [("A", _t(5), _t(70), 1.0)],
        "k string, start timestamp, end timestamp, tag double")
    return left, right


def test_range_join_containment_and_bounds(spark):
    left, right = _frames(spark)
    out = range_join(left, right, "k", "ts", "start", "end",
                     bucket_secs=3600)
    got = sorted(r.id for r in out.collect())
    # id1 at start bound (inclusive), id2 inside, id3 after end, id4 no key
    assert got == [1, 2]


def test_range_join_row_not_duplicated_across_buckets(spark):
    # an interval exploded into 2 buckets must not double-match a row
    left, right = _frames(spark)
    out = range_join(left, right, "k", "ts", "start", "end",
                     bucket_secs=1800)  # forces 3 buckets for the interval
    ids = [r.id for r in out.collect()]
    assert sorted(ids) == [1, 2]  # still exactly once each


def test_range_join_plans_hash_join(spark):
    left, right = _frames(spark)
    plan = (range_join(left, right, "k", "ts", "start", "end")
            ._jdf.queryExecution().executedPlan().toString())
    assert "NestedLoop" not in plan
    # any equi-join strategy qualifies (hash or sort-merge); the bucket
    # key is what rescues us from the nested-loop fallback
    assert "HashJoin" in plan or "SortMergeJoin" in plan
