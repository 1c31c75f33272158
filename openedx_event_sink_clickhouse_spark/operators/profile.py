"""Table profiling — the data-quality report every ingest runs before
anything downstream trusts a new drop: per-column null counts, distinct
cardinalities, and min/max ranges in ONE pass over the table.

Greenfield (the reference has no profiling surface; its closest analog
is the serializer field lists that implicitly assert column presence).

Plan shape: a single wide aggregate row — count/sum-of-null-flags/min/
max all partial-aggregate map-side, and the distinct counts share one
Expand-based pass (Catalyst plans multi-distinct aggregates as one
Expand + two-stage agg, not one job per column). The wide row is then
unpivoted into the long (column_name, stats…) report with an array-of-
structs explode over literals — driver-friendly output whose size is
O(columns), never O(rows). At 100 TB this is the same one-scan job;
swap `countDistinct` for `approx_count_distinct` when exact NDV is not
worth the Expand (same plan otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, numeric_cols: list[str],
                  string_cols: list[str]) -> DataFrame:
    """One-pass column profile. Returns one row per profiled column:
    (column_name, n_rows, n_nulls, n_distinct, min_num, max_num,
    min_str, max_str) — the num/str min-max pair NULL where the other
    kind applies (numerics surface as double; strings lexicographic)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in numeric_cols + string_cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long"))
                    .alias(f"_nn_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"_nd_{c}"))
    for c in numeric_cols:
        aggs.append(F.min(F.col(c)).cast("double").alias(f"_min_{c}"))
        aggs.append(F.max(F.col(c)).cast("double").alias(f"_max_{c}"))
    for c in string_cols:
        aggs.append(F.min(F.col(c)).alias(f"_min_{c}"))
        aggs.append(F.max(F.col(c)).alias(f"_max_{c}"))
    wide = df.agg(*aggs)
    rows = []
    for c in numeric_cols:
        rows.append(F.struct(
            F.lit(c).alias("column_name"), F.col("n_rows"),
            F.col(f"_nn_{c}").alias("n_nulls"),
            F.col(f"_nd_{c}").alias("n_distinct"),
            F.col(f"_min_{c}").alias("min_num"),
            F.col(f"_max_{c}").alias("max_num"),
            F.lit(None).cast("string").alias("min_str"),
            F.lit(None).cast("string").alias("max_str")))
    for c in string_cols:
        rows.append(F.struct(
            F.lit(c).alias("column_name"), F.col("n_rows"),
            F.col(f"_nn_{c}").alias("n_nulls"),
            F.col(f"_nd_{c}").alias("n_distinct"),
            F.lit(None).cast("double").alias("min_num"),
            F.lit(None).cast("double").alias("max_num"),
            F.col(f"_min_{c}").alias("min_str"),
            F.col(f"_max_{c}").alias("max_str")))
    return (wide.select(F.explode(F.array(*rows)).alias("p"))
            .select("p.*"))
