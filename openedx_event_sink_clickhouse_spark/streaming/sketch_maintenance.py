"""Streaming maintenance of mergeable-partial tables (counts, CMS
cells, HLL day-cells): the foreachBatch twin of ``append_counts_batch``
/ ``append_cms_batch``, with REPLAY SAFETY the plain appends don't have.

The problem: foreachBatch is at-least-once. A plain ``append`` of a
batch's partial counts double-counts on replay — unlike the SCD2
maintainers (whose merge is guarded by epoch markers), summed partials
have no natural dedup. The protocol here makes the append itself
idempotent instead of guarding it: each micro-batch's partials land in
their OWN partition directory ``<path>/epoch=<id>/`` with
``mode("overwrite")`` — a replayed epoch overwrites exactly its own
partition, so any number of replays converge to one copy per epoch, and
a crash mid-write is healed by the replay that overwrites the torn
partition. Readers fold the whole directory (``groupBy(...).sum``);
partials are commutative, so epoch boundaries never matter. This is the
lakehouse MERGE-once guarantee reduced to partition-overwrite
granularity — the same reduction ``Scd2BucketedMaintainer`` makes for
history tables.

State size: O(partials × epochs). For CMS that is depth·width rows per
epoch (coordinator-scale forever); for per-key counts it grows with
epochs — fold into a base table periodically (``compact`` here) the way
the digest/count tables compact files.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class EpochPartitionedAppender:
    """Generic foreachBatch handler: ``partials_fn(batch_df)`` reduces
    the batch to its mergeable partials, which land idempotently in
    ``<path>/epoch=<epoch_id>/``. ``fold(spark)`` returns the merged
    view via ``fold_exprs`` (groupBy ``fold_keys`` → sum each value
    column)."""

    def __init__(self, path: str, partials_fn, fold_keys: list[str],
                 value_cols: list[str]) -> None:
        self.path = path
        self.partials_fn = partials_fn
        self.fold_keys = fold_keys
        self.value_cols = value_cols

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        part = self.partials_fn(batch_df)
        # idempotent: the replayed epoch overwrites its own partition
        part.write.mode("overwrite").parquet(
            os.path.join(self.path, f"epoch={epoch_id}"))

    def fold(self, spark) -> DataFrame:
        df = spark.read.parquet(self.path)
        return (df.groupBy(*self.fold_keys)
                .agg(*[F.sum(c).alias(c) for c in self.value_cols]))

    def compact(self, spark, into_epoch: int = -1) -> None:
        """Fold all epoch partitions into one base partition
        (``epoch=<into_epoch>``, default -1 — below any real epoch) and
        drop the originals, bounding partition count as epochs
        accumulate. Crash-safe the same way the SCD2 swap is: the base
        writes beside, then the superseded partitions drop; a crash
        between leaves double-counted epochs at worst UNTIL the next
        compact — callers wanting stricter semantics compact under the
        stream's trigger lock (foreachBatch is serial per query)."""
        folded = self.fold(spark).localCheckpoint()
        epochs = [d for d in os.listdir(self.path)
                  if d.startswith("epoch=") and
                  d != f"epoch={into_epoch}"]
        folded.write.mode("overwrite").parquet(
            os.path.join(self.path, f"epoch={into_epoch}"))
        for d in epochs:
            shutil.rmtree(os.path.join(self.path, d), ignore_errors=True)


def cms_stream_maintainer(path: str, key_col: str, width: int = 1024,
                          depth: int = 4) -> EpochPartitionedAppender:
    """CMS cells kept fresh by a stream: per-trigger cost is one narrow
    batch pass emitting ≤ depth·width cells; serving folds
    ≤ depth·width·epochs rows. Pair with ``heavyhitters.cms_estimate``
    on ``fold()``'s output."""
    from ..operators.heavyhitters import cms_sketch

    return EpochPartitionedAppender(
        path, lambda b: cms_sketch(b, key_col, width, depth),
        ["d", "bucket"], ["c"])


def counts_stream_maintainer(path: str, key_col: str
                             ) -> EpochPartitionedAppender:
    """Per-key exact counts kept fresh by a stream (the count table's
    streaming twin): each trigger appends the batch's own groupBy
    counts; fold() is the serve-side sum. Compact periodically — unlike
    CMS, per-epoch partial size is O(batch distinct keys)."""
    def partials(b: DataFrame) -> DataFrame:
        return (b.filter(F.col(key_col).isNotNull())
                .groupBy(key_col).agg(F.count("*").alias("n_rows")))

    return EpochPartitionedAppender(path, partials, [key_col], ["n_rows"])
