"""End-to-end integration: file stream → applyInPandasWithState
incremental gate → projection/dump-metadata serialization → ClickHouse
sink POST per micro-batch (captured wire-level). The full EP1/EP2 shape
with every layer real except the HTTP socket."""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil

from pyspark.sql import functions as F

from openedx_event_sink_clickhouse_spark.sinks.clickhouse import (
    ClickHouseConfig,
    ClickHouseSink,
)
from openedx_event_sink_clickhouse_spark.streaming.stateful import (
    EVENT_SCHEMA,
    incremental_dump_stream,
)
from tests.test_sinks import file_capture_transport, read_captures


def _ts(minute):
    return dt.datetime(2024, 1, 1, 10, minute)


BATCH1 = [(1, _ts(0), 100, "view", 1.0, "{}"),
          (2, _ts(5), 100, "view", 2.0, "{}")]
BATCH2 = [(3, _ts(5), 100, "view", 9.0, "{}"),   # stale → gated out
          (4, _ts(9), 100, "buy", 3.0, "{}")]    # newer → dumped


def _write_file(spark, rows, src, stage, mtime):
    df = spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1)
    df.write.mode("overwrite").parquet(stage)
    dest = os.path.join(src, f"b{mtime}.parquet")
    shutil.copy(glob.glob(f"{stage}/part-*.parquet")[0], dest)
    os.utime(dest, (mtime, mtime))


def test_stream_gate_serialize_sink(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_file(spark, BATCH1, src, str(tmp_path / "s1"), 1_000)
    _write_file(spark, BATCH2, src, str(tmp_path / "s2"), 2_000)
    cap = str(tmp_path / "cap")
    os.makedirs(cap)
    sink = ClickHouseSink(ClickHouseConfig(database="event_sink"),
                          transport=file_capture_transport(cap))

    def serialize(df):
        # P1-P3: projection + rename + dump metadata (serializers.py shape)
        return df.select(
            F.col("event_id").alias("pk"),
            "user_id", "event_type", "value",
            F.col("ts").cast("string").alias("modified"),
        )

    def write_batch(batch_df, epoch_id):
        sink.insert_df(serialize(batch_df), "events_sink")

    stream = (spark.readStream.schema(EVENT_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (incremental_dump_stream(stream)
         .writeStream.foreachBatch(write_batch)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120)

    captures = read_captures(cap)
    assert all(c["params"]["query"] ==
               "INSERT INTO event_sink.events_sink FORMAT CSV"
               for c in captures)
    # reference's insert error-tolerance params ride along (K2)
    assert all(c["params"]["input_format_allow_errors_num"] == 1
               for c in captures)
    rows = [line for c in captures for line in c["data"].splitlines()]
    pks = sorted(int(r.split(",")[0]) for r in rows)
    assert pks == [1, 2, 4]  # event 3 suppressed by the state-store gate
    # positional CSV with QUOTE_NONNUMERIC parity: strings quoted,
    # numerics bare (base_sink.py:265-272)
    row1 = next(r for r in rows if r.startswith("1,"))
    assert row1 == '1,100,"view",1.0,"2024-01-01 10:00:00"'
