"""Text tokenization/shingling column expressions shared by the dedup and
text-analysis operators. All JVM-side builtins (split/transform/md5) —
no Python UDFs in any hot path.

Oracle parity: every expression here has a DuckDB twin used by the
registry's SQL (same lowercase/split semantics, same md5-derived hashes —
see ``functions/hashes.py`` for why md5).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def words(text: Column) -> Column:
    """Whitespace tokens of lowercased text. The synthetic corpus is
    single-space separated; for messier corpora swap in a regex split —
    kept simple so the DuckDB twin (``string_split(lower(x), ' ')``) is
    bit-identical."""
    return F.split(F.lower(text), " ")


def ngrams(words_col: Column, n: int = 3) -> Column:
    """Word n-grams built with ``transform(sequence(...))`` — the shingle
    list stays one array cell per document (no explode, no row blow-up).

    The words array is let-bound through a single-element ``transform``
    before the per-gram lambda touches it. Without that binding, Catalyst's
    projection collapse inlines the upstream ``split(lower(text))`` into
    every ``element_at`` INSIDE the gram lambda, and higher-order-function
    bodies get no common-subexpression elimination — each gram would
    re-split the whole document (O(words²) per doc; measured 40× slower
    on the sf0.1 corpus). A lambda variable is evaluated once, giving
    O(words) regardless of what expression feeds this function.

    Guarded for docs shorter than n words: Spark's ``sequence(0, -k)``
    counts DOWN (unlike DuckDB's empty list), which would drive
    ``element_at`` out of bounds."""
    def gram_list(w: Column) -> Column:
        grams = F.transform(
            F.sequence(F.lit(0), F.size(w) - n),
            lambda i: F.concat_ws(" ", *[F.element_at(w, i + k + 1)
                                         for k in range(n)]),
        )
        return F.when(F.size(w) >= n, grams) \
                .otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(words_col), gram_list), 1)


def distinct_shingles(text: Column, n: int = 3) -> Column:
    """array_distinct(n-grams(words(text))) — the set used for jaccard."""
    return F.array_distinct(ngrams(words(text), n))


def shingles_sql(text_expr: str, n: int = 3) -> str:
    """DuckDB twin of :func:`distinct_shingles` (1-based list indexing)."""
    w = f"string_split(lower({text_expr}), ' ')"
    grams = " || ' ' || ".join(f"__w[i+{k}]" if k else "__w[i]"
                               for k in range(n))
    return (f"list_distinct(list_transform(generate_series(1, len({w})-{n - 1}), "
            f"i -> {grams}))").replace("__w", w)
