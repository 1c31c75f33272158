"""Incremental-load operators: watermark aggregate (A1) and
change-detection (A2) — the semantic core of the reference's sink pipeline.

The reference issues ONE ClickHouse round-trip PER candidate item:
``SELECT max(time_last_dumped) FROM {table} WHERE {unique_key} = '{id}'``
(``sinks/base_sink.py:314-335``), then compares in Python
(``sinks/course_published.py:154-198``). That is O(items) network calls.

Spark-first design: both sides are DataFrames, so the whole decision
collapses into one set-oriented plan —

    watermarks = sink.groupBy(key).agg(max(ts))          # A1, map-side partial agg
    candidates LEFT JOIN watermarks ON key               # broadcast if small
    WHERE last_dump IS NULL OR modified > last_dump      # A2

At 100 TB the watermark side is |distinct keys| rows (tiny relative to the
fact table) — Catalyst/AQE broadcasts it, so the fact side streams through
map tasks with zero shuffle. This is the single biggest semantic win of
the rewrite (SURVEY.md §3 EP3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def watermarks(sink_df: DataFrame, key: str, ts_col: str,
               watermark_col: str = "last_dump") -> DataFrame:
    """A1 (set-oriented) — per-entity high-water mark over the sink table.

    Replaces the per-item filtered ``max()`` of ``base_sink.py:314-335``.
    A partial (map-side) max runs before the shuffle, so the shuffled data
    is one row per key per map task.
    """
    return sink_df.groupBy(key).agg(F.max(ts_col).alias(watermark_col))


def watermark_for(sink_df: DataFrame, key: str, key_value, ts_col: str) -> DataFrame:
    """A1 (point form, parity with the reference's one-entity query):
    ``SELECT max(ts) WHERE key = value``. Filter is pushed to the scan."""
    return (sink_df.filter(F.col(key) == key_value)
            .agg(F.max(ts_col).alias("last_dump")))


def detect_changes(candidates: DataFrame, sink_df: DataFrame, key: str,
                   modified_col: str, sink_ts_col: str,
                   with_reason: bool = False) -> DataFrame:
    """A2 — rows to dump: never dumped, or modified after their watermark.

    Mirrors ``should_dump_item`` (``course_published.py:154-198``) tri-state:
    never dumped → dump (even with NULL ``modified``); dumped before but
    NULL ``modified`` → SKIP ("No last modified date", lines 174-177);
    ``modified`` strictly newer → dump; equal/older → skip.

    ``with_reason=True`` adds the reference's human-readable reason string
    (consumed by the backfill CLI's ``(obj, should_dump, reason)`` tuples,
    ``management/commands/dump_data_to_clickhouse.py:29-81``).
    """
    wm = watermarks(sink_df, key, sink_ts_col)
    joined = candidates.join(wm, on=key, how="left")
    never = F.col("last_dump").isNull()
    newer = F.col(modified_col) > F.col("last_dump")  # NULL-safe: NULL → skip
    out = joined.filter(never | newer)
    if with_reason:
        out = out.withColumn(
            "dump_reason",
            F.when(never, F.lit("Item is not present in ClickHouse"))
             .otherwise(F.concat(F.lit("Item was modified after last dump at "),
                                 F.col("last_dump").cast("string"))),
        )
    return out.drop("last_dump")


def change_predicate(modified_col: Column, last_dump: Column) -> Column:
    """The bare A2 predicate, reusable inside other plans."""
    return last_dump.isNull() | (modified_col > last_dump)


def incremental_join_view(view_old: DataFrame | None,
                          a_old: DataFrame, delta_a: DataFrame,
                          b_old: DataFrame, delta_b: DataFrame,
                          on: str | list[str]) -> DataFrame:
    """Incremental MATERIALIZED-VIEW maintenance for an inner join —
    the delta-join identity every IVM engine implements:

        Δ(A ⋈ B) = (ΔA ⋈ B_old) ∪ (A_old ⋈ ΔB) ∪ (ΔA ⋈ ΔB)

    so the refreshed view is ``view_old ∪ Δ`` with NO recomputation of
    the old⋈old quadrant — the quadrant that dominates at 100 TB, where
    a day's deltas are a fraction of a percent of the base. Pass
    ``view_old=None`` on first build (it bootstraps A_old ⋈ B_old and
    the identity degenerates to the full join).

    Cost shape: every Δ-term has a delta on one side, so each join
    shuffles (or broadcasts — AQE decides from actual delta sizes) at
    most O(|Δ| + matched base rows), never the base×base volume; the
    result is append-only, so the at-rest view needs no rewrite, just
    new files (pair with `sources/layout.py` compaction). Insert-only
    deltas assumed — updates/deletes route through the SCD operators,
    the standard IVM layering."""
    delta = (delta_a.join(b_old, on)
             .unionByName(a_old.join(delta_b, on))
             .unionByName(delta_a.join(delta_b, on)))
    if view_old is None:
        view_old = a_old.join(b_old, on)
    return view_old.unionByName(delta)
