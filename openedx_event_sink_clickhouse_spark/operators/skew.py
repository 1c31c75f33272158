"""Skew-mitigation operators: salting for hot keys.

AQE's skew-join splitting (on in ``session.py``) handles most runtime
skew; these are the explicit tools for the cases AQE can't fix:

- :func:`salted_aggregate` — a hot grouping key overloads one reduce
  task. Two-phase aggregation (groupBy(key, salt) → groupBy(key)) caps
  any single task's share of a hot key at 1/``buckets``. Only valid for
  algebraic aggregates (sum/count/min/max — re-aggregable partials).
- :func:`salted_broadcast_join` — joining a big skewed fact against a
  dim too large for one broadcast bucket but small enough to replicate
  ``buckets``× : the fact side gets a DETERMINISTIC per-row salt, the
  dim is exploded across all salts, and the join key becomes
  (key, salt) — spreading each hot key over ``buckets`` tasks.

Salts are derived from stable row content (xxhash64), never ``rand()``:
deterministic plans re-execute identically under task retry —
nondeterministic salts can duplicate or drop rows when a stage is
recomputed (the same reason the reference versions dumps by dump_id
rather than relying on exactly-once delivery).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

AGG_FNS = {"sum": (F.sum, F.sum), "count": (F.count, F.sum),
           "min": (F.min, F.min), "max": (F.max, F.max)}


def salted_aggregate(df: DataFrame, key: str | list[str],
                     aggs: dict[str, tuple[str, str]],
                     buckets: int = 16,
                     salt_from: str | None = None) -> DataFrame:
    """Two-phase skew-safe aggregate.

    ``aggs`` maps output column → (fn, input column), fn one of
    sum/count/min/max. ``salt_from`` names a column whose hash spreads the
    rows (defaults to the first agg input — any high-cardinality column
    works; the salt only needs to split hot keys, not be uniform).
    """
    keys = [key] if isinstance(key, str) else list(key)
    unknown = {fn for fn, _ in aggs.values()} - set(AGG_FNS)
    if unknown:
        raise ValueError(f"non-algebraic aggregate(s) {unknown}; "
                         f"salting supports {sorted(AGG_FNS)}")
    salt_src = salt_from or next(iter(aggs.values()))[1]
    salt = F.pmod(F.xxhash64(salt_src), F.lit(buckets)).alias("_salt")

    partial = (df.withColumn("_salt", salt)
               .groupBy(*keys, "_salt")
               .agg(*[AGG_FNS[fn][0](col).alias(out)
                      for out, (fn, col) in aggs.items()]))
    return (partial.groupBy(*keys)
            .agg(*[AGG_FNS[fn][1](out).alias(out)
                   for out, (fn, _) in aggs.items()]))


def salted_broadcast_join(fact: DataFrame, dim: DataFrame, key: str,
                          buckets: int = 8, how: str = "inner",
                          salt_from: str | None = None) -> DataFrame:
    """Join a skewed fact to a replicable dim by spreading each key over
    ``buckets`` (key, salt) sub-keys. The dim is exploded ``buckets``× —
    use only when buckets × |dim| is still broadcast-sized."""
    salt_src = salt_from or key
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*fact.columns)
                        if salt_from is None else F.xxhash64(salt_src),
                        F.lit(buckets)))
    salted_dim = (dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
        .withColumn("_salt", F.col("_salt").cast("bigint")))
    out = salted_fact.join(F.broadcast(salted_dim), [key, "_salt"], how)
    return out.drop("_salt")
