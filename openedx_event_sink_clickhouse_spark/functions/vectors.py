"""Vector math as Column expressions over ``array<double>``.

``zip_with`` + ``aggregate`` keep the dot product inside whole-stage
codegen — no UDF, no Arrow transfer. Verified bit-identical to DuckDB's
``list_dot_product`` (both sum left-to-right in double), which is what
makes cosine results oracle-checkable without tolerance bands.

Embeddings arrive as ``array<float>``; ALWAYS cast to double before any
arithmetic (float accumulation diverges between engines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def _safe_cos(num: Column, den: Column) -> Column:
    # Zero-norm guard: a zero vector would divide by zero — an ANSI-mode
    # runtime error (Spark 4 default), NaN otherwise. Score it 0.0; for
    # every nonzero denominator the value is bit-unchanged.
    return F.when(den != 0.0, num / den).otherwise(F.lit(0.0))


def cosine(a: Column, b: Column) -> Column:
    return _safe_cos(dot(a, b), l2_norm(a) * l2_norm(b))


def cosine_with_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine with the operands' L2 norms precomputed as columns.

    Bit-identical to :func:`cosine` (same operations in the same order —
    the norm subtrees are merely hoisted), but lets self-join/ANN
    operators pay the norm aggregate once per VECTOR instead of once per
    PAIR: per candidate pair only the dot-product pass remains."""
    return _safe_cos(dot(a, b), na * nb)


def cosine_sql(a: str, b: str) -> str:
    """DuckDB twin of :func:`cosine` (operands must already be DOUBLE[])."""
    return (f"list_dot_product({a}, {b}) / "
            f"(sqrt(list_dot_product({a}, {a})) * "
            f"sqrt(list_dot_product({b}, {b})))")
