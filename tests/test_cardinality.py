"""HLL distinct-rollup tests: sketch additivity (weekly = union of
dailies, all-time = union of everything), at-rest round-trip (the
binary sketch column survives parquet and serves without the events),
and the certified report's bound-flag contract."""
from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from openedx_event_sink_clickhouse_spark.operators.cardinality import (
    daily_sketch_table, distinct_rollup_certified, rollup_estimate)


def _events(spark):
    # 14 days; user u active on day d iff u % (d+1) == 0 — overlapping
    # daily populations so naive summing of daily distincts would
    # OVERCOUNT badly (the non-additivity HLL union fixes)
    rows = []
    eid = 0
    for d in range(14):
        for u in range(400):
            if u % (d + 1) == 0:
                rows.append((eid, dt.datetime(2024, 1, 1 + d, 12), u, 1.0))
                eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double")


def test_sketch_union_beats_naive_sum_and_round_trips(spark, tmp_path):
    ev = _events(spark)
    daily = daily_sketch_table(ev)
    assert daily.count() == 14
    # at-rest: binary sketch column round-trips through parquet
    path = str(tmp_path / "sketches")
    daily.write.parquet(path)
    at_rest = spark.read.parquet(path)
    total = rollup_estimate(at_rest).first()
    exact = ev.select("user_id").distinct().count()  # 400 (day 1: all)
    naive_sum = (daily.select(
        F.expr("hll_sketch_estimate(sketch)").alias("e"))
        .agg(F.sum("e")).first()[0])
    assert abs(total["est_distinct"] - exact) <= 0.05 * exact
    assert naive_sum > 1.5 * exact  # non-additivity is real on this data
    assert total["n_events"] == ev.count()
    # grouped rollup: weekly unions from the same at-rest cells
    weekly = rollup_estimate(
        at_rest.withColumn("week", F.weekofyear("day")), ["week"])
    wk = {r.week: r.est_distinct for r in weekly.collect()}
    assert len(wk) == 2 or len(wk) == 3  # 14 days spans 2-3 ISO weeks
    assert all(v <= exact * 1.05 for v in wk.values())


def test_certified_rollup_flags_and_total_row(spark):
    ev = _events(spark)
    out = distinct_rollup_certified(ev).collect()
    days = [r for r in out if r.day is not None]
    total = [r for r in out if r.day is None]
    assert len(days) == 14 and len(total) == 1
    assert all(r.approx_ok == 1 for r in out)
    assert total[0].exact_users == 400
    by_day = {r.day.day: r.exact_users for r in days}
    assert by_day[1] == 400 and by_day[14] == len(
        [u for u in range(400) if u % 14 == 0])
