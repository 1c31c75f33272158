"""Streaming ANN index maintenance: a ``foreachBatch`` loop that keeps
the cell-partitioned IVF corpus (``operators/similarity.py``) fresh as
embedding micro-batches arrive — the streaming twin of the incremental
batch append (``ivf_append_batch``), the way ``streaming/dispatch.py``
is the streaming twin of the batch sink pipelines.

Design at 100 TB:

- **Append is O(batch).** Each micro-batch is assigned against the
  FIXED centroid model (a k×dim broadcast) and appended
  ``partitionBy(cell)`` into the existing layout; the corpus is never
  re-scanned, and the post-append compaction trigger keeps per-cell
  file counts bounded as batches accumulate.
- **Drift is detected, not silently absorbed.** A centroid model fitted
  on yesterday's distribution degrades as the stream drifts: new mass
  piles into a few cells, and probe-time pruning loses its selectivity
  (a cell holding half the corpus makes nprobe=1 scan half the corpus).
  The maintainer watches CELL-SIZE SKEW — max/mean rows per cell, read
  from parquet FOOTER metadata only (no data pages, no Spark job) —
  and flips ``needs_refresh`` / fires ``on_refresh`` when it crosses
  the configured ratio.
- **Refresh itself stays OFFLINE.** Re-fitting centroids and rewriting
  the layout mid-stream would rewrite the corpus inside a micro-batch;
  production ANN systems instead VERSION the model: fit new centroids
  offline (``kmeans_centroids``), write a new layout generation
  (``write_ivf_partitioned`` to a fresh path), and cut queries over.
  The maintainer's job ends at raising the signal.
"""

from __future__ import annotations

import glob
import math
import os

from pyspark.sql import DataFrame


class IvfStreamMaintainer:
    """``foreachBatch`` handler object: appends each arriving embedding
    micro-batch into the IVF layout at ``path`` and tracks the
    cell-size skew refresh signal. Use directly::

        m = IvfStreamMaintainer(model_df, path, n_centroids=16)
        (stream.writeStream.foreachBatch(m)
               .option("checkpointLocation", ckpt)
               .start())

    ``skew_refresh_ratio`` is the max/mean cell-row-count ratio beyond
    which ``needs_refresh`` latches True (and ``on_refresh(ratio)``
    fires, once per crossing). With a healthy model the ratio sits near
    its fit-time value; a drifting stream pushes it up monotonically as
    new mass concentrates. 4.0 is a reasonable default: nprobe-cell scan
    cost is proportional to the probed cells' share of rows, so 4× mean
    in the hottest cell ≈ 4× the balanced scan cost before a refit is
    forced."""

    def __init__(self, model: DataFrame, path: str, n_centroids: int = 16,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 centroids: list[list[float]] | None = None,
                 skew_refresh_ratio: float = 4.0,
                 max_files_per_cell: int | None = 8,
                 on_refresh=None) -> None:
        self.model = model
        self.path = path
        self.n_centroids = n_centroids
        self.id_col = id_col
        self.vec_col = vec_col
        self.centroids = centroids
        self.skew_refresh_ratio = skew_refresh_ratio
        self.max_files_per_cell = max_files_per_cell
        self.on_refresh = on_refresh
        self.needs_refresh = False
        self.last_skew: float | None = None

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        from ..operators.similarity import ivf_append_batch

        ivf_append_batch(batch_df, self.path, self.model,
                         n_centroids=self.n_centroids, id_col=self.id_col,
                         vec_col=self.vec_col, centroids=self.centroids,
                         max_files_per_cell=self.max_files_per_cell)
        skew = self.cell_skew()
        self.last_skew = skew
        if skew is not None and skew > self.skew_refresh_ratio \
                and not self.needs_refresh:
            self.needs_refresh = True
            if self.on_refresh is not None:
                self.on_refresh(skew)

    def cell_counts(self) -> dict[int, int]:
        """Rows per cell from parquet footer metadata — O(files) catalog
        reads, no data pages, no Spark job; cheap enough to run after
        every micro-batch."""
        import pyarrow.parquet as pq

        counts: dict[int, int] = {}
        for cell_dir in glob.glob(os.path.join(self.path, "cell=*")):
            suffix = os.path.basename(cell_dir).split("=", 1)[1]
            if not suffix.isdigit():
                # Compaction scratch from a crashed fold (cell=N
                # .compact_tmp/.compact_old) — not a live partition;
                # compact_partitioned_dir recovers/cleans these.
                continue
            cell = int(suffix)
            n = 0
            for f in glob.glob(os.path.join(cell_dir, "*.parquet")):
                n += pq.ParquetFile(f).metadata.num_rows
            counts[cell] = n
        return counts

    def cell_skew(self) -> float | None:
        """max/mean rows per cell over cells PRESENT in the layout (an
        empty or single-cell layout has no meaningful skew -> None).
        The mean divides by the model's cell count, not the present
        count: mass collapsing into few cells IS the drift signal."""
        counts = self.cell_counts()
        total = sum(counts.values())
        if total == 0 or self.n_centroids == 0:
            return None
        mean = total / self.n_centroids
        return max(counts.values()) / mean if mean > 0 else math.inf


def maintain_ivf_stream(stream: DataFrame,
                        maintainer: IvfStreamMaintainer,
                        checkpoint_dir: str,
                        available_now: bool = True):
    """Wire an embedding stream through the maintainer: returns the
    started StreamingQuery (caller awaits/stops). ``available_now=True``
    drains the current backlog and stops — the shape the tests and
    batch-backfill use; False runs continuously."""
    w = (stream.writeStream.foreachBatch(maintainer)
         .option("checkpointLocation", checkpoint_dir))
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
