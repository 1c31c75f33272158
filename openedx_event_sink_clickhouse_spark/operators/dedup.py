"""Deduplication operators for the training-data pipeline (north-star
extensions; no reference counterpart — SURVEY.md §2 "does NOT have" note).

Four families, all shuffle-frugal and oracle-checkable:

- **Exact** — hash-groupBy on a content digest; one map-side-partial
  aggregate, survivors = min-id per digest.
- **MinHash + LSH** — per-doc signature computed WITHOUT exploding
  shingles (array exprs inside codegen), then banded: docs sharing any
  band bucket are candidates. The only shuffle is the band-bucket
  self-join, whose size is O(candidates), not O(n²) — this is the
  100 TB path. Candidates are verified with exact jaccard.
- **SimHash** — 32-bit rotation-invariant fingerprint; near-dups differ
  in ≤ k bits, so banding its bytes gives a pigeonhole-exact candidate
  filter (hamming ≤ 3 over 4 bands ⇒ ≥ 1 identical band).
- **N-gram jaccard** — exact set similarity against a probe document
  (the brute-force baseline the fancy ones are judged against).

All hashes are md5-derived (``functions/hashes.py``) so the DuckDB oracle
reproduces them bit-for-bit; swap ``xxhash64`` in production for ~3×
faster hashing with identical structure.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import distinct_shingles

# MinHash/LSH defaults: 12 hashes in 4 bands × 3 rows → catches
# jaccard ≳ 0.6 with high probability ((1-(1-s^3)^4) ≈ 0.9 at s=0.8)
NUM_HASHES = 12
NUM_BANDS = 4
ROWS_PER_BAND = 3


def _hash32_expr(x: str, seed: int) -> str:
    return (f"cast(conv(substring(md5(concat({x}, '#{seed}')), 1, 8), 16, 10) "
            f"as bigint)")


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the lowest id per content digest.

    One hash aggregate — at scale this is a single shuffle on the digest,
    with map-side partial min. Returns (content_hash, keep_id, n_copies).
    """
    return (docs
            .select(F.md5(F.col(text_col)).alias("content_hash"),
                    F.col(id_col))
            .groupBy("content_hash")
            .agg(F.min(id_col).alias("keep_id"),
                 F.count("*").alias("n_copies")))


def with_shingles(docs: DataFrame, text_col: str = "text", n: int = 3,
                  min_words: int | None = None) -> DataFrame:
    """Attach the distinct word-n-gram shingle set (drops docs too short
    to have any n-gram)."""
    out = docs.withColumn("shingles", distinct_shingles(F.col(text_col), n))
    return out.filter(F.size("shingles") > 0)


def minhash_signature(shingle_col: Column, num_hashes: int = NUM_HASHES) -> Column:
    """MinHash signature as an array<bigint> column — num_hashes
    independent md5 families, each ``min`` taken inside one array
    expression (no explode, no shuffle)."""
    mins = [F.expr(f"array_min(transform(shingles, x -> {_hash32_expr('x', s)}))")
            for s in range(num_hashes)]
    return F.array(*mins)


def lsh_bands(sig_col: Column, num_bands: int = NUM_BANDS,
              rows_per_band: int = ROWS_PER_BAND) -> Column:
    """Band digests: md5 of each r-row slice of the signature. Docs share
    a bucket iff a band matches exactly."""
    bands = []
    for b in range(num_bands):
        vals = [F.element_at(sig_col, b * rows_per_band + r + 1).cast("string")
                for r in range(rows_per_band)]
        bands.append(F.md5(F.concat_ws(",", *vals)))
    return F.array(*bands)


def jaccard(a: Column, b: Column, scale: int = 6) -> Column:
    """Exact jaccard of two pre-distinct shingle arrays."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.round(inter / union, scale)


def minhash_lsh_pairs(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", n: int = 3,
                      threshold: float = 0.6,
                      max_bucket: int | None = 1000) -> DataFrame:
    """Near-duplicate pairs via MinHash banding, verified with exact
    jaccard ≥ threshold. Returns (id_a, id_b, jaccard_sim), id_a < id_b.

    Plan shape: docs → (id, shingles, bands) [narrow] → explode bands
    [×NUM_BANDS] → self-join on (band_idx, band_hash) [the ONLY shuffle]
    → distinct pairs → verify. ``max_bucket`` drops degenerate buckets
    (a stop-shingle shared by everything) — the skew guard that keeps the
    join from going quadratic at scale; dropped buckets only lose pairs
    that other bands will usually still catch.
    """
    base = (with_shingles(docs, text_col, n)
            .select(F.col(id_col).alias("id"), "shingles"))
    sigs = base.select(
        "id", "shingles",
        lsh_bands(minhash_signature(F.col("shingles"))).alias("bands"))
    buckets = sigs.select(
        "id", F.posexplode("bands").alias("band_idx", "band_hash"))
    if max_bucket is not None:
        counts = (buckets.groupBy("band_idx", "band_hash")
                  .agg(F.count("*").alias("_n"))
                  .filter(F.col("_n") <= max_bucket).drop("_n"))
        buckets = buckets.join(counts, ["band_idx", "band_hash"])
    a, b = buckets.alias("a"), buckets.alias("b")
    pairs = (a.join(b, ["band_idx", "band_hash"])
             .filter(F.col("a.id") < F.col("b.id"))
             .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
             .distinct())
    left = base.select(F.col("id").alias("id_a"),
                       F.col("shingles").alias("sh_a"))
    right = base.select(F.col("id").alias("id_b"),
                        F.col("shingles").alias("sh_b"))
    return (pairs.join(left, "id_a").join(right, "id_b")
            .withColumn("jaccard_sim", jaccard(F.col("sh_a"), F.col("sh_b")))
            .filter(F.col("jaccard_sim") >= threshold)
            .select("id_a", "id_b", "jaccard_sim"))


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 32) -> DataFrame:
    """SimHash fingerprints: per token (with multiplicity), each of
    ``bits`` bit positions votes ±1 by the token hash's bit; the sign of
    the tally sets the fingerprint bit. Entirely array expressions — one
    narrow projection per document. Returns (doc_id, simhash)."""
    toks = (f"transform(split(lower({text_col}), ' '), "
            f"x -> {_hash32_expr('x', 0)})")
    # One pass over the tokens: the accumulator is the array of `bits`
    # tallies, each bit voting ±1 per token (Σ (2·bit_j(h) − 1)).
    tallies = (f"aggregate({toks}, array_repeat(cast(0 as bigint), {bits}), "
               f"(acc, h) -> zip_with(acc, sequence(0, {bits - 1}), "
               f"(a, j) -> a + 2 * (shiftright(h, j) & 1) - 1))")
    sig = (f"aggregate(zip_with({tallies}, sequence(0, {bits - 1}), "
           f"(t, j) -> if(t > 0, shiftleft(cast(1 as bigint), j), "
           f"cast(0 as bigint))), cast(0 as bigint), (acc, x) -> acc + x)")
    return docs.select(F.col(id_col), F.expr(sig).alias("simhash"))


def simhash_near_pairs(sigs: DataFrame, id_col: str = "doc_id",
                       sig_col: str = "simhash", max_hamming: int = 3,
                       num_bands: int = 4, bits: int = 32) -> DataFrame:
    """Candidate pairs whose fingerprints differ in ≤ max_hamming bits.

    Pigeonhole banding: split the 32-bit signature into ``num_bands``
    byte-bands; hamming ≤ num_bands−1 forces ≥ 1 identical band, so the
    self-join on (band_idx, band_value) is exact, not approximate —
    and it is again the only shuffle.
    """
    width = bits // num_bands
    mask = (1 << width) - 1
    bands = F.array(*[
        F.shiftrightunsigned(F.col(sig_col), b * width)
         .bitwiseAND(F.lit(mask).cast("bigint"))
        for b in range(num_bands)])
    buckets = sigs.select(F.col(id_col).alias("id"), F.col(sig_col).alias("sig"),
                          F.posexplode(bands).alias("band_idx", "band_val"))
    a, b = buckets.alias("a"), buckets.alias("b")
    return (a.join(b, ["band_idx", "band_val"])
            .filter(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    F.bit_count(F.expr("a.sig ^ b.sig")).alias("hamming"))
            .distinct()
            .filter(F.col("hamming") <= max_hamming))


def ngram_jaccard_vs_probe(docs: DataFrame, probe_id, text_col: str = "text",
                           id_col: str = "doc_id", n: int = 3,
                           min_sim: float = 0.0) -> DataFrame:
    """Exact n-gram jaccard of every document against one probe document
    — the brute-force near-dup baseline. One broadcast of a single row;
    the corpus streams through map tasks."""
    base = with_shingles(docs, text_col, n).select(id_col, "shingles")
    probe = (base.filter(F.col(id_col) == probe_id)
             .select(F.col("shingles").alias("probe_shingles")))
    out = (base.filter(F.col(id_col) != probe_id)
           .crossJoin(F.broadcast(probe))
           .select(F.col(id_col),
                   jaccard(F.col("shingles"),
                           F.col("probe_shingles")).alias("jaccard_sim")))
    return out.filter(F.col("jaccard_sim") > min_sim) if min_sim > 0 else out
