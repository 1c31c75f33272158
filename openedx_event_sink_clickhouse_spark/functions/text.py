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


def gram_run_stats(grams: Column) -> Column:
    """Per-row duplicate/mode statistics of a gram array, MAP-ONLY:
    returns a struct ``(dupchars, bestc, bestg)`` — characters covered by
    grams occurring more than once (count × gram length, summed), the
    highest occurrence count, and the most frequent gram (count ties
    break to the lexicographically smallest).

    Sort the array (O(G log G) inside the row) and fold it once with
    ``F.aggregate``, counting run lengths of equal adjacent grams. The
    set-oriented alternative — explode → groupBy(id, gram) → window →
    join back — shuffles corpus-token-scale data twice to compute a
    per-row number; this fold deletes both shuffles, so per-doc
    repetition stats stay embarrassingly parallel at any corpus size.
    Empty arrays return ``(0, 0, "")``. Every state reference is a
    lambda variable, so nothing re-evaluates the upstream split (the
    HOF-binding rule :func:`ngrams` documents)."""
    g = F.sort_array(grams)
    zero = F.lit(0).cast("long")
    init = F.struct(F.lit("").alias("prev"), zero.alias("run"),
                    zero.alias("dupchars"), zero.alias("bestc"),
                    F.lit("").alias("bestg"))

    def merge(acc: Column, x: Column) -> Column:
        same = x == acc["prev"]
        run_closes = ~same & (acc["run"] > 0)
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long"))
             .alias("run"),
            (acc["dupchars"]
             + F.when(run_closes & (acc["run"] > 1),
                      acc["run"] * F.length(acc["prev"]))
                .otherwise(zero)).alias("dupchars"),
            F.when(run_closes & (acc["run"] > acc["bestc"]), acc["run"])
             .otherwise(acc["bestc"]).alias("bestc"),
            F.when(run_closes & (acc["run"] > acc["bestc"]), acc["prev"])
             .otherwise(acc["bestg"]).alias("bestg"),
        )

    def finish(acc: Column) -> Column:
        # close the final run (same arithmetic as a run boundary)
        return F.struct(
            (acc["dupchars"]
             + F.when(acc["run"] > 1, acc["run"] * F.length(acc["prev"]))
                .otherwise(zero)).alias("dupchars"),
            F.when(acc["run"] > acc["bestc"], acc["run"])
             .otherwise(acc["bestc"]).alias("bestc"),
            F.when(acc["run"] > acc["bestc"], acc["prev"])
             .otherwise(acc["bestg"]).alias("bestg"),
        )

    return F.aggregate(g, init, merge, finish)


def distinct_shingles(text: Column, n: int = 3) -> Column:
    """array_distinct(n-grams(words(text))) — the set used for jaccard."""
    return F.array_distinct(ngrams(words(text), n))


def shingles_sql(text_expr: str, n: int = 3) -> str:
    """DuckDB twin of :func:`distinct_shingles` (1-based list indexing)."""
    return f"list_distinct({ngrams_sql(text_expr, n)})"


def ngrams_sql(text_expr: str, n: int = 3) -> str:
    """DuckDB twin of :func:`ngrams` — WITH duplicates (repetition
    counting needs multiplicities; dedup wants :func:`shingles_sql`).
    ``generate_series(1, 0)`` is empty in DuckDB, so short docs yield
    ``[]`` like the Spark guard."""
    w = f"string_split(lower({text_expr}), ' ')"
    grams = " || ' ' || ".join(f"__w[i+{k}]" if k else "__w[i]"
                               for k in range(n))
    return (f"list_transform(generate_series(1, len({w})-{n - 1}), "
            f"i -> {grams})").replace("__w", w)
