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
