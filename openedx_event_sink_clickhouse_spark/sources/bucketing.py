"""Bucketed-table helpers: co-located joins without a runtime exchange.

At 100 TB the dominant cost of the fact-to-fact joins (orders ⋈ lineitem,
events ⋈ events-derived state) is the shuffle. Bucketing pre-shuffles at
WRITE time: both tables hash-partitioned into the same number of buckets
on the join key, so Catalyst plans a SortMergeJoin with NO Exchange on
either side — the join cost collapses to a per-bucket merge. This is the
"pre-partitioning / co-located join" strategy from the scale checklist;
``tests/test_bucketing.py`` pins the exchange-free plan.

Buckets also serve A1-style watermark aggregates: a groupBy on the bucket
key needs no exchange either (partial = final partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int = 32,
                   sort: bool = True) -> None:
    """Persist ``df`` as a bucketed managed table (overwriting). Sorting
    within buckets lets SortMergeJoin skip its sort step too."""
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket counts Catalyst omits both exchanges (verify via .explain)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
