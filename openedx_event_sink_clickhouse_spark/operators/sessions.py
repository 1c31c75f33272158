"""Batch sessionization over the event table — the gaps-and-islands
twin of the streaming session windows (``streaming/windows.py``): same
gap semantics, expressed as lag + running-sum windows so historical
backfills and the live stream agree on session boundaries.

Plan shape: both windows (the lag and the running sum of session
starts) share the (user, ts) partitioning and ordering, so Catalyst
plans ONE Exchange + ONE Sort for the whole pass; the per-session
rollup then reuses the user_id clustering. Nothing here is driver-side
and session state never materializes — at 100 TB the cost is one
shuffle of the event stream on user_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_s: int = 1800,
               user_col: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id") -> DataFrame:
    """Per-event session assignment: a session starts at the first event
    of a user and whenever the gap since the previous event exceeds
    ``gap_s`` seconds. Adds (is_start, session_seq); ``session_seq``
    numbers a user's sessions from 1 in time order.

    Ordering ties on ``ts`` are broken by ``id_col`` so the running
    numbering is total-ordered and reproducible across engines. Gap
    arithmetic is on floor-epoch-seconds (matches DuckDB's
    ``floor(epoch(ts))``); ``unix_timestamp()`` is used instead of
    ``cast(ts as long)`` because it accepts both TIMESTAMP and
    TIMESTAMP_NTZ inputs under Spark 4."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev = F.lag(ts_col).over(w)
    is_start = F.when(
        prev.isNull()
        | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev) > gap_s),
        1).otherwise(0)
    seq = F.sum("is_start").over(
        w.rowsBetween(Window.unboundedPreceding, 0))
    return (events
            .withColumn("is_start", is_start)
            .withColumn("session_seq", seq))


def session_stats(events: DataFrame, gap_s: int = 1800,
                  user_col: str = "user_id", ts_col: str = "ts",
                  id_col: str = "event_id",
                  value_col: str = "value") -> DataFrame:
    """Session-level rollup: one row per (user, session) with event
    count, span, and value sum. Returns (user_id, session_seq, n_events,
    session_start, session_end, duration_s, value_sum)."""
    s = sessionize(events, gap_s, user_col, ts_col, id_col)
    return (s.groupBy(user_col, "session_seq")
            .agg(F.count("*").alias("n_events"),
                 F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 (F.max(F.unix_timestamp(F.col(ts_col)))
                  - F.min(F.unix_timestamp(F.col(ts_col))))
                 .alias("duration_s"),
                 F.round(F.sum(value_col), 6).alias("value_sum")))
