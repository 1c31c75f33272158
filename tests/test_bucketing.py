"""Bucketed co-located join: same-bucketed tables must join with NO
exchange on either side (the write-time pre-shuffle pays for itself),
and results must match the plain join."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from openedx_event_sink_clickhouse_spark.sources.bucketing import (
    bucketed_join,
    write_bucketed,
)
from openedx_event_sink_clickhouse_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    orders = load_table(spark, "orders", sf_dir) \
        .select("o_orderkey", "o_orderdate", "o_totalprice")
    lineitem = load_table(spark, "lineitem", sf_dir) \
        .select(F.col("l_orderkey").alias("o_orderkey"),
                "l_linenumber", "l_quantity")
    write_bucketed(orders, "b_orders", "o_orderkey", buckets=8)
    write_bucketed(lineitem, "b_lineitem", "o_orderkey", buckets=8)
    yield orders, lineitem
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan


def test_bucketed_join_matches_plain_join(spark, bucketed):
    orders, lineitem = bucketed
    plain = orders.join(lineitem, "o_orderkey").count()
    assert bucketed_join(spark, "b_orders", "b_lineitem",
                         "o_orderkey").count() == plain


def test_bucketed_groupby_needs_no_exchange(spark, bucketed):
    agg = (spark.table("b_lineitem").groupBy("o_orderkey")
           .agg(F.sum("l_quantity").alias("q")))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
