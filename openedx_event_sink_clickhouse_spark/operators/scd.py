"""Slowly-changing-dimension (type 2) history — the warehouse view over
an append-only dump/event log.

The reference's sinks re-dump whole rows on every change and keep the
latest via last-wins dedup (``operators/tree.py:t2``, mirroring
``base_sink.py``'s versioned-dump model); the natural analytics
complement is the CHANGE HISTORY: one row per (key, attribute-state
interval) with validity bounds, consecutive unchanged dumps collapsed.
That is SCD type 2 derived from the log — no mutable dimension table
needed, which is exactly how a versioned-dump model wants it.

Plan shape: everything partitions by the key and orders by (ts,
tiebreak) — the change-flag lag, the island running sum, and the
interval lead all share ONE Exchange+Sort (same single-shuffle
discipline as ``operators/tree.py``'s ordinal windows; plan-shape
test-pinned). The island groupBy reuses the same hash partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(df: DataFrame, key_col: str, ts_col: str,
                 attr_cols: list[str],
                 tiebreak_col: str | None = None) -> DataFrame:
    """Collapse an append-only log into type-2 history rows:
    (key, attrs..., valid_from, valid_to, n_versions, is_current).

    A new interval opens when ANY tracked attribute differs from the
    previous row's (null-safe ``<=>`` compare — NULL→value and
    value→NULL are changes, NULL→NULL is not); runs of unchanged rows
    collapse into one interval carrying ``n_versions`` (how many dumps
    repeated the state). ``valid_to`` is the next interval's
    ``valid_from`` (half-open, the warehouse convention) and NULL on
    the current interval. ``tiebreak_col`` makes equal-timestamp rows
    deterministic — REQUIRED for reproducible history whenever the log
    can carry ties (pass the event/dump id)."""
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    changed = F.lit(False)
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    changed = F.when(F.lag(ts_col).over(w).isNull(), F.lit(True)) \
               .otherwise(changed)
    flagged = df.withColumn("_new", changed.cast("int"))
    island = F.sum("_new").over(
        w.rowsBetween(Window.unboundedPreceding, 0))
    grouped = (flagged.withColumn("_island", island)
               .groupBy(key_col, "_island", *attr_cols)
               .agg(F.min(ts_col).alias("valid_from"),
                    F.count("*").alias("n_versions")))
    wi = Window.partitionBy(key_col).orderBy("_island")
    return (grouped
            .withColumn("valid_to", F.lead("valid_from").over(wi))
            .select(key_col, *attr_cols, "valid_from", "valid_to",
                    F.col("n_versions").cast("bigint").alias("n_versions"),
                    F.col("valid_to").isNull().alias("is_current")))


def as_of(history: DataFrame, ts) -> DataFrame:
    """Point-in-time (time-travel) lookup over SCD2 history: each key's
    state AT timestamp ``ts`` — the interval containing it under the
    half-open convention (``valid_from <= ts < valid_to``, open current
    interval matches everything ≥ its start). Keys that first appear
    after ``ts`` are absent, exactly as the warehouse expects. A
    map-only filter over the (collapsed, small) history — no window,
    no join; this query motivates keeping history AT REST instead of
    re-deriving state from the raw log per question."""
    t = F.lit(ts).cast("timestamp")
    return history.filter((F.col("valid_from") <= t)
                          & (F.col("valid_to").isNull()
                             | (F.col("valid_to") > t)))


def current_of(history: DataFrame) -> DataFrame:
    """The latest state per key from an SCD2 history frame — equivalent
    to last-wins dedup over the source log, but served from the (much
    smaller) collapsed history."""
    return history.filter(F.col("is_current"))
