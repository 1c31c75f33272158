"""Histogram-sketch quantile tests: (a) hand-checkable interpolation,
(b) THE MERGEABILITY CONTRACT — cells built per-epoch and merged give
bit-identical estimates to cells built in one pass (the property that
makes the sketch an at-rest/streaming summary, not a one-shot query),
(c) the documented error bound |est - exact| <= bin width, (d) range
clamping at the under/overflow cells."""
from __future__ import annotations

from pyspark.sql import functions as F

from openedx_event_sink_clickhouse_spark.operators.quantiles import (
    histogram_quantiles, histogram_sketch)


def _vals(spark, xs, with_epoch=False):
    if with_epoch:
        rows = [(float(x), i % 3) for i, x in enumerate(xs)]
        return spark.createDataFrame(rows, "v double, epoch int")
    return spark.createDataFrame([(float(x),) for x in xs], "v double")


def test_hand_computed_interpolation(spark):
    # 10 values uniform over [0,10), 10 bins of width 1: one value per
    # bin, cum(b) = b+1, so q=0.5 lands in bucket 4 (cum 5 >= 5) with
    # est = 4 + 1*(5 - 4)/1 = 5.0
    df = _vals(spark, [0.5 + i for i in range(10)])
    cells = histogram_sketch(df, "v", 0.0, 10.0, 10)
    got = {r.q: r.estimate for r in
           histogram_quantiles(cells, [0.5, 0.9], 0.0, 10.0, 10).collect()}
    assert got[0.5] == 5.0
    assert got[0.9] == 9.0


def test_merge_equals_single_pass(spark):
    xs = [((i * 37) % 100) + 0.25 for i in range(500)]
    one = histogram_sketch(_vals(spark, xs), "v", 0.0, 100.0, 20)
    per_epoch = histogram_sketch(_vals(spark, xs, with_epoch=True), "v",
                                 0.0, 100.0, 20, epoch_col="epoch")
    qs = [0.1, 0.5, 0.95]
    a = histogram_quantiles(one, qs, 0.0, 100.0, 20).collect()
    b = histogram_quantiles(per_epoch, qs, 0.0, 100.0, 20).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # and the merged cell table really is the single-pass one
    merged = (per_epoch.groupBy("bucket").agg(F.sum("n_rows").alias("n"))
              .orderBy("bucket").collect())
    single = one.orderBy("bucket").collect()
    assert [(r.bucket, r.n) for r in merged] == \
        [(r.bucket, r.n_rows) for r in single]


def test_error_bounded_by_bin_width(spark):
    import random
    rng = random.Random(7)
    xs = [rng.uniform(0, 100) ** 1.3 % 100 for _ in range(2000)]
    df = _vals(spark, xs)
    cells = histogram_sketch(df, "v", 0.0, 100.0, 20)
    qs = [0.25, 0.5, 0.75, 0.9, 0.99]
    est = {r.q: r.estimate for r in
           histogram_quantiles(cells, qs, 0.0, 100.0, 20).collect()}
    s = sorted(xs)
    for q in qs:
        rank = q * (len(s) - 1)
        lo, hi = s[int(rank)], s[min(int(rank) + 1, len(s) - 1)]
        exact = lo + (rank - int(rank)) * (hi - lo)
        assert abs(est[q] - exact) <= 5.0 + 1e-9, (q, est[q], exact)


def test_clamps_at_range_edges(spark):
    # everything below range: all mass in the underflow cell -> every
    # quantile clamps to lo; symmetric for overflow -> hi
    low = _vals(spark, [-5.0, -4.0, -3.0])
    cells = histogram_sketch(low, "v", 0.0, 10.0, 5)
    got = histogram_quantiles(cells, [0.5], 0.0, 10.0, 5).collect()
    assert got[0][2] == 0.0
    high = _vals(spark, [50.0, 60.0])
    cells = histogram_sketch(high, "v", 0.0, 10.0, 5)
    got = histogram_quantiles(cells, [0.5], 0.0, 10.0, 5).collect()
    assert got[0][2] == 10.0


def test_nulls_excluded(spark):
    df = spark.createDataFrame([(1.0,), (None,), (9.0,)], "v double")
    cells = histogram_sketch(df, "v", 0.0, 10.0, 10)
    got = histogram_quantiles(cells, [0.5], 0.0, 10.0, 10).collect()
    assert got[0].n_rows == 2


def test_grouped_quantiles_match_ungrouped_per_group(spark):
    from openedx_event_sink_clickhouse_spark.operators.quantiles import (
        grouped_histogram_quantiles, grouped_histogram_sketch)
    rows = ([("a", float((i * 13) % 50)) for i in range(300)]
            + [("b", float((i * 7) % 90) + 5.0) for i in range(200)])
    df = spark.createDataFrame(rows, "k string, v double")
    cells = grouped_histogram_sketch(df, ["k"], "v", 0.0, 100.0, 20)
    got = {(r.k, r.q): (r.n_rows, r.estimate)
           for r in grouped_histogram_quantiles(
               cells, ["k"], [0.5, 0.95], 0.0, 100.0, 20).collect()}
    assert got[("a", 0.5)][0] == 300 and got[("b", 0.5)][0] == 200
    for k in ("a", "b"):
        one = df.filter(F.col("k") == k)
        c1 = histogram_sketch(one, "v", 0.0, 100.0, 20)
        want = {r.q: r.estimate for r in
                histogram_quantiles(c1, [0.5, 0.95],
                                    0.0, 100.0, 20).collect()}
        assert got[(k, 0.5)][1] == want[0.5]
        assert got[(k, 0.95)][1] == want[0.95]


def test_grouped_quantiles_single_group_exchange(spark):
    # plan hygiene: ONE hash exchange on the group key feeds both the
    # cumulative and total windows and the merge — no per-q re-shuffle
    from openedx_event_sink_clickhouse_spark.operators.quantiles import (
        grouped_histogram_quantiles, grouped_histogram_sketch)
    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    cells = grouped_histogram_sketch(df, ["k"], "v", 0.0, 10.0, 5)
    out = grouped_histogram_quantiles(cells, ["k"], [0.5], 0.0, 10.0, 5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_group_exchanges = sum(
        1 for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "k#" in ln)
    assert n_group_exchanges <= 2  # sketch agg + window stack share


def test_winsorized_mean_resists_outlier(spark):
    # 19 values of 10 plus one 10000: raw mean ~509.5, winsorized mean
    # must collapse near 10 (the outlier caps at p95).
    from openedx_event_sink_clickhouse_spark.operators.quantiles import (
        winsorized_stats)
    rows = [("g", 10.0)] * 19 + [("g", 10000.0)]
    df = spark.createDataFrame(rows, ["grp", "v"])
    r = winsorized_stats(df, "grp", "v").collect()[0]
    assert r.raw_mean == 509.5
    assert r.n_capped_high == 1 and r.n_capped_low == 0
    assert r.winsorized_mean < 60  # p95 interpolates near 10, far from 1e4
    assert r.p_lo == 10.0


def test_winsorized_groups_use_own_cuts(spark):
    # Each group caps at ITS OWN percentiles: a group of constants is
    # untouched even when another group has wild values.
    from openedx_event_sink_clickhouse_spark.operators.quantiles import (
        winsorized_stats)
    rows = [("flat", 5.0)] * 10 + [("wild", float(x))
                                   for x in (1, 2, 3, 1000, 5000)]
    df = spark.createDataFrame(rows, ["grp", "v"])
    out = {r.grp: r for r in winsorized_stats(df, "grp", "v").collect()}
    assert out["flat"].winsorized_mean == 5.0
    assert out["flat"].n_capped_low == 0 == out["flat"].n_capped_high
    assert out["wild"].winsorized_mean < out["wild"].raw_mean


def test_gini_extremes(spark):
    from openedx_event_sink_clickhouse_spark.operators.quantiles import (
        gini_concentration)
    even = spark.createDataFrame([(u, 10.0) for u in range(10)],
                                 ["u", "v"])
    r = gini_concentration(even, "u", "v").collect()[0]
    assert r.gini == 0.0 and r.n_units == 10
    # one whale holds everything among n=10: G = (n-1)/n = 0.9
    whale = spark.createDataFrame(
        [(0, 1000.0)] + [(u, 0.0) for u in range(1, 10)], ["u", "v"])
    r2 = gini_concentration(whale, "u", "v").collect()[0]
    assert abs(r2.gini - 0.9) < 1e-6


def test_abc_boundary_unit_takes_lower_class(spark):
    # Values 50, 30, 15, 5 (total 100): cum shares .5, .8, .95, 1.0 —
    # the unit that lands exactly ON a boundary keeps the lower class
    # (A's total share >= a_cut by convention).
    df = spark.createDataFrame(
        [(1, 50.0), (2, 30.0), (3, 15.0), (4, 5.0)], ["u", "v"])
    from openedx_event_sink_clickhouse_spark.operators.quantiles import (
        abc_classification)
    out = {r.unit: r for r in abc_classification(df, "u", "v").collect()}
    assert out[1].abc_class == "A" and out[2].abc_class == "A"
    assert out[3].abc_class == "B"
    assert out[4].abc_class == "C"
    assert out[4].cum_share == 1.0
