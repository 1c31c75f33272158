"""Interval-union island merge: overlap, touch, gap, and multi-key
semantics that the registry's real-data run cannot isolate."""

from __future__ import annotations

import datetime

from openedx_event_sink_clickhouse_spark.operators.intervals import (
    interval_union,
)

T = datetime.datetime


def _iv(spark, rows):
    return spark.createDataFrame(rows, ["key", "start_ts", "end_ts"])


def test_overlap_merges_and_gap_splits(spark):
    # [10:00,11:00] overlaps [10:30,12:00] -> one island of 2h;
    # [13:00,13:30] is a separate island -> coverage 2.5h, 2 islands.
    df = _iv(spark, [
        ("u", T(2024, 1, 1, 10), T(2024, 1, 1, 11)),
        ("u", T(2024, 1, 1, 10, 30), T(2024, 1, 1, 12)),
        ("u", T(2024, 1, 1, 13), T(2024, 1, 1, 13, 30)),
    ])
    r = interval_union(df, "key").collect()[0]
    assert (r.n_intervals, r.n_islands) == (3, 2)
    assert r.covered_seconds == 2.5 * 3600


def test_touching_intervals_merge(spark):
    # next.start == prev.end is a zero-length gap: must merge.
    df = _iv(spark, [
        ("u", T(2024, 1, 1, 10), T(2024, 1, 1, 11)),
        ("u", T(2024, 1, 1, 11), T(2024, 1, 1, 12)),
    ])
    r = interval_union(df, "key").collect()[0]
    assert (r.n_islands, r.covered_seconds) == (1, 7200.0)


def test_contained_interval_does_not_extend(spark):
    # An interval fully inside an earlier one must not open an island
    # even though its own end is before the running max (the classic
    # "compare against running MAX end, not previous end" bug).
    df = _iv(spark, [
        ("u", T(2024, 1, 1, 10), T(2024, 1, 1, 14)),
        ("u", T(2024, 1, 1, 11), T(2024, 1, 1, 12)),
        ("u", T(2024, 1, 1, 13), T(2024, 1, 1, 15)),
    ])
    r = interval_union(df, "key").collect()[0]
    assert (r.n_islands, r.covered_seconds) == (1, 5 * 3600.0)


def test_keys_are_independent(spark):
    df = _iv(spark, [
        ("a", T(2024, 1, 1, 10), T(2024, 1, 1, 11)),
        ("b", T(2024, 1, 1, 10, 30), T(2024, 1, 1, 12)),
    ])
    out = {r.key: r for r in interval_union(df, "key").collect()}
    assert out["a"].n_islands == 1 and out["b"].n_islands == 1
    assert out["a"].covered_seconds == 3600.0
