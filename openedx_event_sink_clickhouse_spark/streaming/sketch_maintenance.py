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
                 value_cols: list[str],
                 agg_exprs: list | None = None) -> None:
        self.path = path
        self.partials_fn = partials_fn
        self.fold_keys = fold_keys
        self.value_cols = value_cols
        # default merge is summation; sketches with their own merge
        # operator (HLL union) pass explicit aggregate expressions
        self.agg_exprs = agg_exprs

    def _manifest(self) -> str:
        return os.path.join(self.path, "_compact_manifest")

    def _scratch(self) -> str:
        # leading dot: invisible to Spark partition discovery, so a
        # half-built base can never enter a fold
        return os.path.join(self.path, ".compact_new")

    def _recover(self) -> None:
        """Finish (or discard) an interrupted compact. The manifest is
        written only AFTER the new base's data is complete, so: manifest
        present → the scratch base supersedes every partition it lists;
        delete them, install the base, drop the manifest. No manifest →
        any scratch dir is an incomplete fold; discard it. Either way
        fold() never sees a row twice or loses one."""
        if os.path.isfile(self._manifest()):
            listed = [ln.strip() for ln in open(self._manifest())
                      if ln.strip()]
            for d in listed:
                shutil.rmtree(os.path.join(self.path, d),
                              ignore_errors=True)
            base = listed and listed[0].split("=", 1)[0]  # "epoch"
            target = os.path.join(self.path, f"{base}=-1") if base else None
            if os.path.isdir(self._scratch()) and target:
                os.rename(self._scratch(), target)
            os.remove(self._manifest())
        shutil.rmtree(self._scratch(), ignore_errors=True)

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        self._recover()
        part = self.partials_fn(batch_df)
        # idempotent: the replayed epoch overwrites its own partition
        part.write.mode("overwrite").parquet(
            os.path.join(self.path, f"epoch={epoch_id}"))

    def _fold_exprs(self) -> list:
        if self.agg_exprs is not None:
            return self.agg_exprs
        return [F.sum(c).alias(c) for c in self.value_cols]

    def fold(self, spark) -> DataFrame:
        self._recover()
        df = spark.read.parquet(self.path)
        return df.groupBy(*self.fold_keys).agg(*self._fold_exprs())

    def compact(self, spark) -> None:
        """Fold the CURRENT epoch partitions into one base partition
        (``epoch=-1`` — below any real epoch) and drop exactly those,
        bounding partition count as epochs accumulate.

        Crash-safe manifest protocol (the SCD2 recovery discipline):
        (1) SNAPSHOT the partition list first — an epoch the stream
        writes concurrently is neither folded nor deleted, it just
        survives into the next compact; (2) fold ONLY the snapshot into
        a dot-prefixed scratch dir Spark's discovery ignores; (3) write
        a manifest naming the snapshot — the commit point; (4) delete
        the snapshot dirs, install the scratch as the new base, drop
        the manifest. A crash before (3) discards the scratch (state
        untouched); after (3), :meth:`_recover` — run on every entry —
        finishes the deletes/install, so a partial compact can never
        double-count a partition into a later fold or delete data that
        was not folded."""
        self._recover()
        snapshot = sorted(d for d in os.listdir(self.path)
                          if d.startswith("epoch="))
        if len(snapshot) <= 1:
            return
        only = [os.path.join(self.path, d) for d in snapshot]
        folded = (spark.read.parquet(*only)
                  .groupBy(*self.fold_keys).agg(*self._fold_exprs()))
        folded.write.mode("overwrite").parquet(self._scratch())
        with open(self._manifest(), "w") as fh:
            fh.write("\n".join(snapshot))
        self._recover()


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


def hll_stream_maintainer(path: str, key_col: str = "user_id",
                          ts_col: str = "ts", lg_k: int = 14
                          ) -> EpochPartitionedAppender:
    """HLL day-cells kept fresh by a stream: each trigger writes its
    batch's per-day sketches (``cardinality.daily_sketch_table`` shape);
    the fold UNIONS same-day cells — sketch bytes merge by
    ``hll_union_agg``, not summation — so ``fold()`` is exactly the
    at-rest daily sketch table, and any coarser grain unions from there
    (``cardinality.rollup_estimate``). Per-epoch state is O(days touched
    by the batch)."""
    from ..operators.cardinality import daily_sketch_table

    return EpochPartitionedAppender(
        path, lambda b: daily_sketch_table(b, key_col, ts_col, lg_k),
        ["day"], ["n_events", "sketch"],
        agg_exprs=[F.sum("n_events").alias("n_events"),
                   F.expr("hll_union_agg(sketch, true)").alias("sketch")])


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
