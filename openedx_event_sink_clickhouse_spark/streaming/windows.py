"""Watermarked window aggregates over the event stream.

The reference has no windowed analytics (its "watermark" is a per-entity
high-water mark, A1/A2); these are the greenfield stream operators the
north star asks for. Each works UNCHANGED on a batch DataFrame (the
registry's oracle-checked form) and on a streaming DataFrame (watermark
attached only when ``df.isStreaming``), because Spark's ``window``/
``session_window`` are plan-level constructs, not stream-only.

Scale: tumbling/sliding aggs are hash aggregations keyed by
(window, event_type) — partial aggregation map-side, tiny shuffled state.
Session windows keep per-user state; state store size is bounded by the
watermark horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _maybe_watermark(events: DataFrame, ts_col: str, delay: str) -> DataFrame:
    return events.withWatermark(ts_col, delay) if events.isStreaming else events


def tumbling_event_stats(events: DataFrame, ts_col: str = "ts",
                         width: str = "1 hour",
                         watermark_delay: str = "1 hour") -> DataFrame:
    """Per (tumbling window, event_type): count + value sum."""
    ev = _maybe_watermark(events, ts_col, watermark_delay)
    win = F.window(F.col(ts_col), width)
    return (ev.groupBy(win.alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 6).alias("value_sum"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n_events", "value_sum"))


def sliding_event_stats(events: DataFrame, ts_col: str = "ts",
                        width: str = "1 hour", slide: str = "30 minutes",
                        watermark_delay: str = "1 hour") -> DataFrame:
    """Per (sliding window, event_type) event counts — each event lands in
    width/slide overlapping windows."""
    ev = _maybe_watermark(events, ts_col, watermark_delay)
    win = F.window(F.col(ts_col), width, slide)
    return (ev.groupBy(win.alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n_events"))


def session_event_stats(events: DataFrame, ts_col: str = "ts",
                        gap: str = "30 minutes",
                        watermark_delay: str = "1 hour") -> DataFrame:
    """Per-user session windows (gap-based): events / value sum / bounds.

    Streaming: ``session_window`` + watermark = Spark's stateful session
    operator. Batch: the same expression compiles to a sort-based
    aggregation — and equals the classic gaps-and-islands SQL, which is
    what the DuckDB oracle uses.
    """
    ev = _maybe_watermark(events, ts_col, watermark_delay)
    win = F.session_window(F.col(ts_col), gap)
    return (ev.groupBy(win.alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 6).alias("value_sum"),
                 F.min(ts_col).alias("first_event"),
                 F.max(ts_col).alias("last_event"))
            .select("user_id", "first_event", "last_event", "n_events",
                    "value_sum"))


def debounce_dedup(events: DataFrame, keys: list[str] | None = None,
                   ts_col: str = "ts", bucket: str = "minute",
                   watermark_delay: str = "1 hour") -> DataFrame:
    """Debounce duplicate events: one row per (keys…, ts bucket).

    Streaming: ``dropDuplicatesWithinWatermark`` — Spark's bounded-state
    streaming dedup; state for a key is dropped once the watermark passes
    it, so memory is O(keys within the watermark horizon), not O(stream).
    Batch: the same keys through ``dropDuplicates`` (equals SELECT
    DISTINCT, which is the DuckDB oracle form).

    Output is the key tuple only — which *source row* survives a
    duplicate group is execution-order-dependent in both engines, so only
    the key set is deterministic and comparable.
    """
    keys = keys or ["user_id", "event_type"]
    keyed = events.select(*keys, F.date_trunc(bucket, F.col(ts_col))
                          .alias("ts_bucket"))
    if keyed.isStreaming:
        return keyed.withWatermark("ts_bucket", watermark_delay) \
                    .dropDuplicatesWithinWatermark()
    return keyed.dropDuplicates()


def stream_range_join(left: DataFrame, right: DataFrame, key: str,
                      left_ts: str, start_ts: str,
                      duration: str = "1 hour",
                      watermark_delay: str = "1 hour") -> DataFrame:
    """Stream-stream interval join: each left row matched to right rows
    whose ``[start_ts, start_ts + duration]`` window contains ``left_ts``.

    In stream mode this is Spark's native stateful stream-stream inner
    join: BOTH sides carry a watermark and the join condition bounds
    event time on both sides, which is exactly what lets Spark age join
    state out instead of buffering both streams forever. In batch mode
    the same expression is a plain theta join — correct but nested-loop;
    the scalable batch form is ``operators.rangejoin.range_join`` (the
    bucketed decomposition), and the two agree row-for-row, which
    ``tests/test_streaming.py`` pins.
    """
    lw = left.withWatermark(left_ts, watermark_delay) \
        if left.isStreaming else left
    rw = right.withWatermark(start_ts, watermark_delay) \
        if right.isStreaming else right
    cond = ((lw[key] == rw[key]) &
            (lw[left_ts] >= rw[start_ts]) &
            (lw[left_ts] <= rw[start_ts] + F.expr(f"INTERVAL {duration}")))
    return lw.join(rw, cond).drop(rw[key])
