"""Incremental-load operators A1/A2 (reference ``base_sink.py:314-335``,
``course_published.py:154-198``): watermark read + change-detection truth
table, mirroring the reference's tests at
``tests/test_course_published.py:138-262``."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from openedx_event_sink_clickhouse_spark.operators.incremental import (
    detect_changes,
    watermark_for,
    watermarks,
)
from openedx_event_sink_clickhouse_spark.plans.pipelines import (
    flagship_events_incremental,
)

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 1, 2)
T2 = dt.datetime(2024, 1, 3)


def _sink(spark):
    return spark.createDataFrame([
        Row(key="a", time_last_dumped=T0),
        Row(key="a", time_last_dumped=T1),   # two historical dumps: max wins
        Row(key="b", time_last_dumped=T1),
    ])


def test_watermarks_is_max_per_key(spark):
    got = {r["key"]: r["last_dump"]
           for r in watermarks(_sink(spark), "key", "time_last_dumped").collect()}
    assert got == {"a": T1, "b": T1}


def test_watermark_point_form(spark):
    row = watermark_for(_sink(spark), "key", "a", "time_last_dumped").collect()[0]
    assert row["last_dump"] == T1
    row = watermark_for(_sink(spark), "key", "zzz", "time_last_dumped").collect()[0]
    assert row["last_dump"] is None


def test_change_detection_truth_table(spark):
    # Mirrors should_dump_item's tri-state (course_published.py:154-198):
    # never dumped -> dump (even with NULL modified); modified after
    # watermark -> dump; at/before -> skip; dumped + NULL modified -> skip
    # ("No last modified date in CourseOverview", lines 174-177).
    candidates = spark.createDataFrame([
        Row(key="new", modified=T0),     # no watermark -> dump
        Row(key="new2", modified=None),  # no watermark, no mtime -> dump
        Row(key="a", modified=T2),       # newer -> dump
        Row(key="a", modified=T1),       # equal -> skip
        Row(key="b", modified=T0),       # older -> skip
        Row(key="b", modified=None),     # dumped + unknown mtime -> skip
    ])
    out = detect_changes(candidates, _sink(spark), "key", "modified",
                         "time_last_dumped", with_reason=True)
    got = {(r["key"], r["modified"]) for r in out.collect()}
    assert got == {("new", T0), ("new2", None), ("a", T2)}
    reasons = {r["key"]: r["dump_reason"] for r in out.collect()}
    assert reasons["new"] == "Item is not present in ClickHouse"
    assert reasons["a"].startswith("Item was modified after last dump at")


def test_flagship_runs_and_is_incremental(spark, sf_dir):
    from openedx_event_sink_clickhouse_spark.sources.tables import load_table
    events = load_table(spark, "events", sf_dir)
    out = flagship_events_incremental(events, "2024-01-05 00:00:00")
    n_total = events.count()
    n_out = out.count()
    assert 0 < n_out < n_total
    cols = out.columns
    assert cols == ["event_id", "user_id", "event_type", "modified",
                    "event_data_json", "dump_id", "time_last_dumped"]
    row = out.orderBy("event_id").first()
    assert len(row["dump_id"]) == 36 and row["dump_id"].count("-") == 4


def test_incremental_join_view_matches_full_join(spark):
    # Split both sides; the maintained view must equal the full join —
    # including cross-quadrant matches (old order x delta line, delta
    # order x old line) and the true-incremental path where view_old is
    # the materialized old x old quadrant.
    from openedx_event_sink_clickhouse_spark.operators.incremental import (
        incremental_join_view)
    a = spark.createDataFrame(
        [(1, "old"), (2, "old"), (3, "new"), (4, "new")], "k long, ta string")
    b = spark.createDataFrame(
        [(1, 10, "old"), (3, 30, "old"), (2, 20, "new"), (3, 31, "new"),
         (4, 40, "new")],
        "k long, v long, tb string")
    a_old, da = a.filter("ta = 'old'"), a.filter("ta = 'new'")
    b_old, db = b.filter("tb = 'old'"), b.filter("tb = 'new'")
    full = {(r.k, r.v) for r in a.join(b, "k").collect()}

    boot = incremental_join_view(None, a_old, da, b_old, db, on="k")
    assert {(r.k, r.v) for r in boot.collect()} == full

    view_old = a_old.join(b_old, "k")
    incr = incremental_join_view(view_old, a_old, da, b_old, db, on="k")
    assert {(r.k, r.v) for r in incr.collect()} == full
    # and row multiplicity matches too (no doubled quadrant)
    assert incr.count() == a.join(b, "k").count()
