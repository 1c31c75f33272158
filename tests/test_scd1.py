"""SCD1 changelog apply: upsert/delete/insert/resurrection semantics on
hand-built fixtures (the registry query pins the real-table shape)."""

from __future__ import annotations

import datetime as dt

from openedx_event_sink_clickhouse_spark.operators.scd import apply_changelog

T = dt.datetime


def _base(spark):
    return spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", 20.0), (3, "carol", 30.0)],
        "k long, name string, bal double")


def test_apply_update_delete_insert(spark):
    base = _base(spark)
    changes = spark.createDataFrame(
        [(2, T(2024, 1, 1), 1, "U", 99.0),    # update bob
         (3, T(2024, 1, 1), 2, "D", None),    # delete carol
         (7, T(2024, 1, 1), 3, "U", 7.0)],    # insert new key
        "k long, ts timestamp, eid long, op string, bal double")
    out = {r.k: r for r in apply_changelog(
        base, changes, "k", seq_cols=["ts", "eid"],
        update_cols=["bal"]).collect()}
    assert set(out) == {1, 2, 7}
    assert out[1].bal == 10.0 and out[1].name == "alice"  # untouched
    assert out[2].bal == 99.0 and out[2].name == "bob"    # non-updated col kept
    assert out[7].bal == 7.0 and out[7].name is None      # insert, NULL rest


def test_apply_last_wins_and_resurrection(spark):
    base = _base(spark)
    changes = spark.createDataFrame(
        [(1, T(2024, 1, 1), 1, "U", 50.0),
         (1, T(2024, 1, 2), 2, "U", 60.0),    # later U wins
         (2, T(2024, 1, 1), 3, "D", None),
         (2, T(2024, 1, 2), 4, "U", 77.0),    # delete then upsert = alive
         (3, T(2024, 1, 2), 5, "D", None),
         (3, T(2024, 1, 1), 6, "U", 1.0)],    # D is latest -> gone
        "k long, ts timestamp, eid long, op string, bal double")
    out = {r.k: r for r in apply_changelog(
        base, changes, "k", seq_cols=["ts", "eid"],
        update_cols=["bal"]).collect()}
    assert set(out) == {1, 2}
    assert out[1].bal == 60.0
    assert out[2].bal == 77.0


def test_apply_tie_on_ts_breaks_by_sequence_id(spark):
    base = _base(spark)
    changes = spark.createDataFrame(
        [(1, T(2024, 1, 1), 1, "U", 5.0),
         (1, T(2024, 1, 1), 2, "U", 6.0)],    # same ts: higher eid wins
        "k long, ts timestamp, eid long, op string, bal double")
    out = {r.k: r.bal for r in apply_changelog(
        base, changes, "k", seq_cols=["ts", "eid"],
        update_cols=["bal"]).collect()}
    assert out[1] == 6.0
