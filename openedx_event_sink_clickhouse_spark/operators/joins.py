"""Join operators S7–S9 (reference ``select_related`` prefetches and the
CCX child-course expansion).

Scale posture: every reference join is fact ⋈ small-dimension, so each is
explicitly ``broadcast()`` — a map-side hash join with ZERO shuffle of the
fact side. At 100 TB that is the difference between a pipeline and a
cluster-wide exchange. AQE would usually infer this, but dimensions like
``external_id_type`` are known-small by construction, so we declare it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def enrich(fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str,
           pick: dict[str, str], how: str = "left") -> DataFrame:
    """S7/S8 — N:1 dimension prefetch (``select_related("user")`` pulling
    ``user.email`` — ``sinks/user_profile_sink.py:18-19``,
    ``serializers.py:37``; double prefetch for external_id —
    ``sinks/external_id_sink.py:18-19``).

    ``pick`` maps dim column → output alias; only those columns survive,
    so Catalyst prunes the dim scan to exactly the joined fields. The dim
    key is aliased to the fact key so the join key appears once.
    """
    slim = dim.select(F.col(dim_key).alias(fact_key),
                      *[F.col(c).alias(a) for c, a in pick.items()])
    return fact.join(F.broadcast(slim), on=fact_key, how=how)


def expand_children(parents: DataFrame, children: DataFrame, on,
                    how: str = "inner") -> DataFrame:
    """S9 — parent → child expansion (CCX children of a course,
    ``utils.py:62-68`` consumed at ``tasks.py:35-38``). The parent set is
    the (small) per-batch driver table → broadcast it, stream children."""
    return children.join(F.broadcast(parents), on=on, how=how)
