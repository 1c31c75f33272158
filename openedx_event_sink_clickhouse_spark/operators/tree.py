"""Hierarchy operators T1–T3: tree ordinal assignment, last-wins dedup,
parent→child fan-out.

The reference walks the modulestore's depth-first pre-order block list with
three mutable counters (``sinks/course_published.py:47-94``):

    chapter    → section += 1; subsection = 0; unit = 0
    sequential → subsection += 1; unit = 0
    vertical   → unit += 1

and stamps the CURRENT (section, subsection, unit) onto every block. That
is an inherently sequential scan in Python; re-expressed relationally it is
three conditional running sums over the traversal order — pure Catalyst
window functions, no UDF, no driver loop:

    section     = Σ is_chapter                 over rows ≤ here
    subsection  = Σ is_sequential  since the last chapter row
    unit        = Σ is_vertical    since the last chapter-or-sequential row

"since the last X" = (running total) − (running total AS OF the last X row),
where the as-of value is ``last(case when X then total end) ignore nulls``.

Scale note: the window partitions by course — one course's blocks
(~10²–10⁴ rows) always fit a partition, and distinct courses spread across
the cluster, so a 100 TB corpus of millions of courses parallelizes
perfectly with a single hash exchange on course_key shared by all three
sums (one Window spec → one sort, three projections).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# block_type → which counters it bumps/resets, per course_published.py:75-87
SECTION_TYPE = "chapter"
SUBSECTION_TYPE = "sequential"
UNIT_TYPE = "vertical"


def tree_ordinals(blocks: DataFrame, partition_key: str = "course_key",
                  order_col: str = "order", type_col: str = "block_type",
                  section_type: str = SECTION_TYPE,
                  subsection_type: str = SUBSECTION_TYPE,
                  unit_type: str = UNIT_TYPE) -> DataFrame:
    """T1 — add ``section``/``subsection``/``unit`` ordinal columns.

    ``blocks`` must carry a depth-first pre-order traversal index in
    ``order_col`` (the reference's ``index``, 1-based). Output matches the
    reference's counter semantics exactly, including blocks before any
    chapter getting (0, 0, 0) and top-level verticals counting units.
    """
    w = (Window.partitionBy(partition_key).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    t = F.col(type_col)

    # Pass 1: the three running totals. Windows can't nest, so totals are
    # materialized as columns; pass 2 reuses the identical window spec, so
    # the physical plan keeps ONE exchange + ONE sort (the second Window
    # node sees its required ordering already satisfied).
    totals = blocks.select(
        "*",
        F.sum((t == section_type).cast("int")).over(w).alias("_sec_total"),
        F.sum((t == subsection_type).cast("int")).over(w).alias("_sub_total"),
        F.sum((t == unit_type).cast("int")).over(w).alias("_unit_total"),
    )
    # Pass 2: running totals AS OF the most recent resetting row (NULL on
    # non-reset rows, carried forward by last(..., ignorenulls)).
    sub_base = F.last(F.when(t == section_type, F.col("_sub_total")),
                      ignorenulls=True).over(w)
    unit_base = F.last(F.when(t.isin(section_type, subsection_type),
                              F.col("_unit_total")),
                       ignorenulls=True).over(w)
    return (totals
            .withColumn("section", F.col("_sec_total").cast("int"))
            .withColumn("subsection",
                        (F.col("_sub_total") - F.coalesce(sub_base, F.lit(0))).cast("int"))
            .withColumn("unit",
                        (F.col("_unit_total") - F.coalesce(unit_base, F.lit(0))).cast("int"))
            .drop("_sec_total", "_sub_total", "_unit_total"))


def last_wins_dedup(df: DataFrame, key_cols: list[str] | str,
                    order_col: str = "order") -> DataFrame:
    """T2 — keep only the LAST occurrence per key, in traversal order.

    The reference builds ``location_to_node[stripped_location] = fields``
    so later duplicates overwrite earlier ones (``course_published.py:90-94``).
    Relationally: max-order row per key. ``max_by`` over a struct keeps it a
    single hash aggregate (map-side partial, then one shuffle on the key) —
    cheaper than the row_number() formulation, which must sort.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    payload = F.struct(*[F.col(c) for c in df.columns if c not in keys])
    winner = F.max_by(payload, F.col(order_col)).alias("_w")
    out = df.groupBy(*keys).agg(winner)
    return out.select(*keys, "_w.*")


def fan_out(parents: DataFrame, children: DataFrame, on: str,
            inherit: dict[str, str]) -> DataFrame:
    """T3 — propagate parent dump metadata onto child rows.

    The reference's nested-sink dispatch hands ``dump_id``/
    ``time_last_dumped`` from the course-overview dump to every block row
    (``base_sink.py:184-203``, ``course_published.py:39-45``). As a join:
    children ⋈ broadcast(parents-slice); ``inherit`` maps parent column →
    child output name.
    """
    slim = parents.select(on, *[F.col(c).alias(a) for c, a in inherit.items()])
    return children.join(F.broadcast(slim), on=on, how="inner")
