"""Exact heavy hitters via two-pass candidate pruning: output must be
EXACT (identical to a plain groupBy-HAVING) and partitioning-independent
— the properties the candidate-superset pigeonhole argument guarantees."""
from __future__ import annotations

import random

from pyspark.sql import functions as F

from openedx_event_sink_clickhouse_spark.operators.heavyhitters import (
    heavy_hitters)


def _brute(rows, k):
    n = len([r for r in rows if r is not None])
    counts: dict = {}
    for r in rows:
        if r is not None:
            counts[r] = counts.get(r, 0) + 1
    return {key: c for key, c in counts.items() if c > n / float(k)}


def test_heavy_hitters_exact_on_zipf_stream(spark):
    rng = random.Random(7)
    # Zipf-ish: key i appears ~ 3000/i times — a real skewed stream.
    rows = [i for i in range(1, 80) for _ in range(3000 // i)]
    rng.shuffle(rows)
    df = spark.createDataFrame([(v,) for v in rows], "key long")
    for k in (10, 40, 200):
        got = {r.key: r.exact_count
               for r in heavy_hitters(df, "key", k=k).collect()}
        assert got == _brute(rows, k), k


def test_heavy_hitters_partitioning_independent(spark):
    rows = [i for i in range(1, 40) for _ in range(1200 // i)]
    df1 = spark.createDataFrame([(v,) for v in rows], "key long") \
        .repartition(1)
    df32 = spark.createDataFrame([(v,) for v in sorted(rows)], "key long") \
        .repartition(32)
    k = 25
    a = sorted((r.key, r.exact_count)
               for r in heavy_hitters(df1, "key", k=k).collect())
    b = sorted((r.key, r.exact_count)
               for r in heavy_hitters(df32, "key", k=k).collect())
    assert a == b == sorted(_brute(rows, k).items())


def test_heavy_hitters_excludes_nulls_and_handles_empty(spark):
    df = spark.createDataFrame([("a",), ("a",), ("a",), ("b",), (None,)],
                               "key string")
    got = heavy_hitters(df, "key", k=2).collect()   # thr = 4/2 = 2
    assert [(r.key, r.exact_count) for r in got] == [("a", 3)]
    assert got[0].freq_share == 0.75                # share of NON-NULL n
    empty = df.filter(F.col("key").isNull()).filter(F.col("key").isNotNull())
    assert heavy_hitters(empty, "key", k=5).count() == 0


def test_heavy_hitters_total_shortcut_matches(spark):
    rows = ["x"] * 30 + ["y"] * 5
    df = spark.createDataFrame([(v,) for v in rows], "key string")
    a = sorted(tuple(r) for r in heavy_hitters(df, "key", k=3).collect())
    b = sorted(tuple(r) for r in
               heavy_hitters(df, "key", k=3, total=35).collect())
    assert a == b and a[0][0] == "x"
