"""Point-in-time labeling tests: the leakage contract (feature window
strictly pre-cutoff, label window strictly post), churn label truth
table, and RFM tile determinism."""
from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from openedx_event_sink_clickhouse_spark.operators.labeling import (
    churn_labels, rfm_segments)

CUT = "2024-01-20 00:00:00"


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")


def test_churn_label_truth_table(spark):
    before = dt.datetime(2024, 1, 15)
    after = dt.datetime(2024, 1, 22)
    far_before = dt.datetime(2024, 1, 1)   # outside 14d feature window
    rows = [
        (1, before, 1, "view", 2.0),       # active pre, silent post -> churned
        (2, before, 2, "purchase", 5.0),   # active pre AND post -> retained
        (3, after, 2, "view", 1.0),
        (4, after, 3, "view", 1.0),        # post-only -> NO ROW (no features)
        (5, far_before, 4, "view", 1.0),   # pre but outside window -> NO ROW
    ]
    got = {r.unit: r for r in churn_labels(_ev(spark, rows), CUT).collect()}
    assert set(got) == {1, 2}
    assert got[1].churned == 1 and got[2].churned == 0
    assert got[2].n_conversions == 1
    assert got[1].recency_days == 5
    assert got[1].total_value == 2.0


def test_churn_features_exclude_label_window(spark):
    # identical pre-cutoff behavior, wildly different post-cutoff
    # behavior -> identical FEATURES (else the label leaked)
    before = dt.datetime(2024, 1, 18)
    after = dt.datetime(2024, 1, 21)
    rows = [(1, before, 1, "view", 3.0),
            (2, before, 2, "view", 3.0),
            (3, after, 2, "purchase", 999.0)]
    got = {r.unit: r for r in churn_labels(_ev(spark, rows), CUT).collect()}
    feat = lambda r: (r.n_events, r.n_conversions, r.total_value,
                      r.days_active, r.recency_days)
    assert feat(got[1]) == feat(got[2])
    assert got[1].churned == 1 and got[2].churned == 0


def test_rfm_tiles_rank_best_as_one(spark):
    rows, eid = [], 0
    for u in range(10):
        # user u: u+1 events, latest on day 1+u, value 10*u
        for i in range(u + 1):
            rows.append((eid, dt.datetime(2024, 1, 1 + u), u,
                         "view", 10.0 * u / (u + 1)))
            eid += 1
    got = {r.unit: r for r in rfm_segments(_ev(spark, rows), CUT).collect()}
    # user 9: most recent, most frequent, highest value -> "111"
    assert got[9].segment == "111"
    assert got[0].r_tile == 5 and got[0].f_tile == 5
    # tiles are balanced: 2 users per quintile
    from collections import Counter
    assert Counter(r.r_tile for r in got.values()) == \
        {t: 2 for t in range(1, 6)}
