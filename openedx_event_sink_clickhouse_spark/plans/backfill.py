"""EP3 — bulk backfill (reference ``management/commands/
dump_data_to_clickhouse.py``), set-oriented.

The reference iterates pages, issuing ONE watermark query per item
(``should_dump_item`` → HTTP round trip, ``dump_data_to_clickhouse.py:29-81``
+ ``course_published.py:165``). Here eligibility for the whole candidate
set is one plan: scans S1-S4 → tri-state classification (A2 with reasons)
→ L1 limit → partition-batched sink writes with L2 throttle.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.incremental import watermarks
from ..operators.scans import in_list, not_in_list, range_scan


@dataclass
class BackfillOptions:
    """CLI option surface (``dump_data_to_clickhouse.py:84-163``)."""

    ids: list | None = None          # --ids
    skip_ids: list | None = None     # --ids_to_skip
    start_pk: object | None = None   # resume point
    force: bool = False              # --force
    limit: int | None = None         # --limit (must be > 0; not with force)
    batch_size: int = 10_000         # --batch_size
    sleep_time: float = 1.0          # --sleep_time

    def validate(self) -> None:
        # mirrors handle()'s guards (dump_data_to_clickhouse.py:178-194)
        if self.limit is not None and self.limit <= 0:
            raise ValueError("'limit' must be greater than 0!")
        if self.limit is not None and self.force:
            raise ValueError("The 'limit' option cannot be used with 'force'!")


def classify_targets(source: DataFrame, sink_history: DataFrame | None, *,
                     key: str, modified_col: str, sink_ts_col: str,
                     opts: BackfillOptions) -> DataFrame:
    """``fetch_target_items`` (``base_sink.py:284-306``) as one plan:
    every candidate row annotated with ``should_dump`` + ``dump_reason``
    — the reference's ``(item, should_be_dumped, reason)`` triples."""
    df = source
    if opts.start_pk is not None:
        df = range_scan(df, key, opts.start_pk)
    if opts.ids:
        df = in_list(df, key, opts.ids)
    if opts.skip_ids:
        df = not_in_list(df, key, opts.skip_ids)

    if opts.force or sink_history is None:
        reason = "Force is set" if opts.force else "No reason"
        return df.withColumn("should_dump", F.lit(True)) \
                 .withColumn("dump_reason", F.lit(reason))

    wm = watermarks(sink_history, key, sink_ts_col)
    joined = df.join(wm, on=key, how="left")
    never = F.col("last_dump").isNull()
    no_mtime = F.col(modified_col).isNull()
    newer = F.col(modified_col) > F.col("last_dump")
    # reason strings mirror course_published.py:154-198
    return (joined
            .withColumn("should_dump",
                        F.when(never, True)
                         .when(no_mtime, False)
                         .otherwise(newer))
            .withColumn(
                "dump_reason",
                F.when(never, F.lit("Course is not present in ClickHouse"))
                 .when(no_mtime, F.lit("No last modified date in CourseOverview"))
                 .when(newer, F.concat(
                     F.lit("Course has been published since last dump time - "
                           "last dumped "),
                     F.col("last_dump").cast("string"),
                     F.lit(" < last published "),
                     F.col(modified_col).cast("string")))
                 .otherwise(F.concat(
                     F.lit("Course has NOT been published since last dump "
                           "time - last dumped "),
                     F.col("last_dump").cast("string"),
                     F.lit(" >= last published "),
                     F.col(modified_col).cast("string"))))
            .drop("last_dump"))


def select_dump_batch(classified: DataFrame, key: str,
                      opts: BackfillOptions) -> DataFrame:
    """Eligible rows, with L1 limit applied AFTER the skip-filter
    (``dump_data_to_clickhouse.py:70-74``: limit counts eligible items)."""
    eligible = classified.filter(F.col("should_dump")) \
                         .drop("should_dump", "dump_reason")
    if opts.limit is not None:
        eligible = eligible.orderBy(key).limit(opts.limit)
    return eligible


def run_backfill(source: DataFrame, sink_history: DataFrame | None, sink,
                 table: str, *, key: str, modified_col: str, sink_ts_col: str,
                 opts: BackfillOptions | None = None,
                 serializer=None) -> int:
    """Full EP3: classify → limit → serialize → partition-batched insert
    with throttle. Returns the number of rows dumped."""
    opts = opts or BackfillOptions()
    opts.validate()
    classified = classify_targets(source, sink_history, key=key,
                                  modified_col=modified_col,
                                  sink_ts_col=sink_ts_col, opts=opts)
    batch = select_dump_batch(classified, key, opts)
    if serializer is not None:
        batch = serializer(batch)
    # Single pass: the sink chunks each partition into batch_size-row
    # POSTs (S5) and counts rows in the same action — no separate
    # count() scan and no repartition-by-count shuffle. The REBALANCE
    # hint lets AQE right-size partitions (split skewed, merge tiny)
    # without knowing the row count up front.
    return sink.insert_df(batch.hint("rebalance"), table,
                          throttle_secs=opts.sleep_time,
                          max_rows_per_post=opts.batch_size)
