"""Checkpoint recovery: a stream stopped after batch 1 and RESTARTED from
the same checkpoint must (a) not re-emit batch 1, (b) resume the state
store, so entity watermarks from before the restart still gate batch 2.
This is the Spark-native replacement for the reference's at-least-once
Celery retry + idempotent dump_id versioning story (SURVEY.md §4)."""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil

from openedx_event_sink_clickhouse_spark.streaming.stateful import (
    EVENT_SCHEMA,
    incremental_dump_stream,
)


def _ts(minute):
    return dt.datetime(2024, 1, 1, 10, minute)


def _write(spark, rows, src, stage, mtime):
    df = spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1)
    df.write.mode("overwrite").parquet(stage)
    dest = os.path.join(src, f"b{mtime}.parquet")
    shutil.copy(glob.glob(f"{stage}/part-*.parquet")[0], dest)
    os.utime(dest, (mtime, mtime))


def _run(spark, src, ckpt, out):
    # file sink, not memory: only durable sinks support checkpoint recovery
    stream = (spark.readStream.schema(EVENT_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (incremental_dump_stream(stream)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    return {r.event_id for r in spark.read.parquet(out).collect()}


def test_restart_resumes_state_not_reemitting(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)

    # run 1: only batch 1 exists; user 100's watermark becomes 10:05
    _write(spark, [(1, _ts(0), 100, "view", 1.0, "{}"),
                   (2, _ts(5), 100, "view", 1.0, "{}")],
           src, str(tmp_path / "s1"), 1_000)
    out = str(tmp_path / "out")
    got1 = _run(spark, src, ckpt, out)
    assert got1 == {1, 2}

    # "crash", then batch 2 arrives: one stale event, one fresh
    _write(spark, [(3, _ts(3), 100, "view", 1.0, "{}"),   # ≤ watermark
                   (4, _ts(9), 100, "view", 1.0, "{}")],  # fresh
           src, str(tmp_path / "s2"), 2_000)
    all_emitted = _run(spark, src, ckpt, out)

    # batch 1 NOT re-emitted (offsets recovered) and event 3 gated by the
    # RESTORED state — both properties come from the checkpoint; the file
    # sink accumulates, so total output = run1 ∪ {4} exactly once each
    assert all_emitted == {1, 2, 4}
