"""F1 — event-driven sink dispatch on Structured Streaming.

The reference's event path is: Django signal → Celery message →  worker
deserializes → ``sink.dump(entity_id)`` — one entity per message,
at-least-once (``signals.py:19-83``, ``tasks.py:19-59``). The Spark-native
shape replaces the broker hop with a micro-batch boundary:

    readStream(publish events) → foreachBatch(dispatch) → batch pipelines

Inside ``foreachBatch`` we have a plain batch DataFrame, so EVERY pipeline
in ``plans/`` is reused verbatim — same code for streaming ingest and bulk
backfill, which the reference achieves by routing both through the sink
classes. Checkpointing gives exactly-once per epoch into idempotent
(dump_id-versioned) sinks; per-entity Celery retries become Spark task
retries.

A "publish event" row is ``(model, object_id, ts)`` — the exact payload of
``dump_data_to_clickhouse.delay(sink_module, sink_name, object_id)``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# handler(entity_ids: DataFrame[object_id]) -> None, one per model,
# the moral equivalent of SinkClass.dump(id) (tasks.py:41-59)
Handler = Callable[[DataFrame], None]


def dispatch_batch(batch_df: DataFrame, handlers: dict[str, Handler],
                   model_col: str = "model", id_col: str = "object_id",
                   on_unknown: Callable[[str], None] | None = None) -> None:
    """Route one micro-batch to per-model handlers (F2 dispatch).

    Entities are deduplicated within the batch — N publish events for one
    course in one epoch trigger ONE dump, a set-oriented improvement the
    reference can't make across independent Celery messages.
    """
    batch_df = batch_df.select(model_col, id_col).distinct().cache()
    try:
        models = [r[0] for r in batch_df.select(model_col).distinct().collect()]
        for model in models:
            handler = handlers.get(model)
            if handler is None:
                # tasks.py logs and drops unknown sinks; surface via hook
                if on_unknown:
                    on_unknown(model)
                continue
            ids = batch_df.filter(F.col(model_col) == model).select(id_col)
            handler(ids)
    finally:
        batch_df.unpersist()


def run_dispatch_stream(stream_df: DataFrame, handlers: dict[str, Handler],
                        checkpoint_dir: str, *, model_col: str = "model",
                        id_col: str = "object_id", trigger: dict | None = None,
                        query_name: str = "event_sink_dispatch"):
    """Wire the dispatcher onto an unbounded stream. ``trigger`` defaults
    to ``availableNow`` (drain-and-stop, used by tests/backfill catch-up);
    pass ``{"processingTime": "10 seconds"}`` for continuous micro-batches
    — the L2 throttle analog."""
    trigger = trigger or {"availableNow": True}
    return (stream_df.writeStream
            .queryName(query_name)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(**trigger)
            .foreachBatch(lambda df, _epoch: dispatch_batch(
                df, handlers, model_col, id_col))
            .start())
