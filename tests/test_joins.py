"""Join operators: the Bloom-prefiltered exact join must return exactly
the plain join's rows (no false negatives, by construction) while the
prefilter predicate evaluates as plan-literal Column arithmetic — no
extra join, no shuffle — ahead of the exact join."""
from __future__ import annotations

import random

from pyspark.sql import functions as F

from openedx_event_sink_clickhouse_spark.operators.joins import (
    bloom_prefilter_join)


def test_bloom_prefilter_join_equals_plain_join(spark):
    rng = random.Random(13)
    fact = spark.createDataFrame(
        [(rng.randrange(500), i * 1.5) for i in range(4000)],
        "k long, v double")
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(0, 500, 7)], "dk long, name string")
    got = (bloom_prefilter_join(fact, dim, "k", "dk", m_bits=1 << 12)
           .select("k", "v", "name"))
    want = (fact.join(dim, fact["k"] == dim["dk"])
            .select("k", "v", "name"))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))
    assert got.count() > 0


def test_bloom_prefilter_actually_prunes_and_stays_joinless(spark):
    # With a sparse dim, most fact rows must drop at the prefilter; the
    # filter stage itself contains no Join/Exchange (plan-literal probes).
    fact = spark.createDataFrame([(i,) for i in range(5000)], "k long")
    dim = spark.createDataFrame([(i,) for i in range(10)], "dk long")
    filtered = bloom_prefilter_join(fact, dim, "k", "dk",
                                    m_bits=1 << 14, how="left_semi")
    n = filtered.count()
    # 10 true matches + bloom false positives (fpr ~ (1-e^-40/16384)^4)
    assert n == 10
    # the prefilter is a Filter over the scan: exactly ONE join in the
    # whole plan (the exact join), and no exchange below the filter
    plan = filtered._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Join") == 1, plan


def test_bloom_prefilter_string_keys_and_tight_filter(spark):
    # String keys hash through the same md5 path; an undersized filter
    # only raises false positives — never false negatives.
    fact = spark.createDataFrame([(f"u{i}",) for i in range(2000)],
                                 "k string")
    dim = spark.createDataFrame([(f"u{i * 211}",) for i in range(9)],
                                "dk string")
    got = {r.k for r in bloom_prefilter_join(
        fact, dim, "k", "dk", m_bits=256, k=2).select("k").collect()}
    want = {f"u{i * 211}" for i in range(9) if i * 211 < 2000}
    assert got == want


def test_bloom_prefilter_rejects_fact_preserving_join_types(spark):
    # 'left'/'outer' would need unmatched fact rows (which the prefilter
    # drops) in the result — the operator must refuse, not silently
    # diverge from the plain join.
    import pytest

    fact = spark.createDataFrame([(1,), (2,)], "k long")
    dim = spark.createDataFrame([(1,)], "dk long")
    for how in ("left", "left_outer", "full", "outer", "right",
                "left_anti"):
        with pytest.raises(ValueError, match="unmatched fact"):
            bloom_prefilter_join(fact, dim, "k", "dk", how=how)
    # the fact-dropping types still work
    assert bloom_prefilter_join(fact, dim, "k", "dk",
                                how="left_semi").count() == 1
    assert bloom_prefilter_join(fact, dim, "k", "dk",
                                how="inner").count() == 1
