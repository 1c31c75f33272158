"""General analytic surface: rollup grouping flags, per-group top-k
plan shape (WindowGroupLimit), approx-distinct error bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from openedx_event_sink_clickhouse_spark import registry


def test_rollup_levels(spark, sf_dir):
    out = registry.queries()["agg_rollup_events"](spark, sf_dir).collect()
    grand = [r for r in out if r.g_type == 1 and r.g_day == 1]
    per_type = [r for r in out if r.g_type == 0 and r.g_day == 1]
    assert len(grand) == 1
    assert grand[0].n_events == sum(r.n_events for r in per_type)


def test_topk_group_limit_pushdown(spark, sf_dir):
    df = registry.queries()["topk_events_per_user"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # rank-filter must become a group-limit, not a full window sort
    assert "WindowGroupLimit" in plan, plan
    counts = df.groupBy("user_id").count().collect()
    assert max(r["count"] for r in counts) <= 3


def test_approx_distinct_within_rsd(spark, sf_dir):
    # The registry query carries the bound as a column (approx_ok) so the
    # driver's hash compare enforces it; here we re-derive the raw HLL++
    # estimate and pin the ±5% bound against exact count_distinct too.
    rows = registry.queries()["approx_distinct_users"](spark, sf_dir).collect()
    assert rows and all(r.approx_ok == 1 for r in rows)
    from openedx_event_sink_clickhouse_spark.sources.tables import load_table
    est = {r.event_type: (r.approx, r.exact) for r in
           load_table(spark, "events", sf_dir)
           .groupBy("event_type")
           .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
                F.countDistinct("user_id").alias("exact")).collect()}
    for k, (a, n) in est.items():
        assert abs(a - n) / n < 0.05, (k, a, n)
