"""Text-analysis operators over the ``documents`` table — the quality /
language-ID / token-count / fingerprint layer a training-data pipeline
runs before dedup and filtering.

Greenfield relative to the reference (openedx-event-sink-clickhouse has no
text analytics; see SURVEY.md §2 "categories the reference does NOT have"),
designed per the north-star extensions. Everything here is pure Column
expressions — whole-stage-codegen'd, no Python UDFs, no shuffles except
where an aggregate genuinely requires one. At 100 TB these are
embarrassingly parallel map-only scans: per-document outputs need zero
shuffle, and corpus-level rollups reduce map-side first.

Oracle parity: every expression has a DuckDB twin in the registry; hashes
go through ``functions.hashes.md5_hash64`` (cross-engine identical).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashes import md5_hash64
from ..functions.text import ngrams, words

# Marker function-words per language for the n-gram/profile heuristic.
# Ordered dict order doubles as the deterministic tie-break priority.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "is", "of", "and", "to", "in"),
    "de": ("der", "die", "und", "ist", "das", "ein", "nicht"),
    "fr": ("le", "la", "et", "les", "des", "un", "est"),
    "es": ("el", "los", "y", "es", "las", "una", "por"),
    "zh": ("的", "是", "了", "在", "有"),
}

# Stopword list for quality scoring (quality != language-ID: one fixed set).
STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "of", "and", "to", "in", "is", "it", "that",
)


def _count_in(words_col: Column, vocab: tuple[str, ...]) -> Column:
    """# tokens of ``words_col`` that are in ``vocab`` (JVM-side filter)."""
    return F.size(F.filter(words_col, lambda w: w.isin(*vocab)))


def quality_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality metrics: length, word stats, punctuation /
    stopword / distinct-word ratios. Map-only — no shuffle at any scale."""
    w = words(F.col(text_col))
    lowered = F.lower(F.col(text_col))
    n_chars = F.length(F.col(text_col))
    n_words = F.size(w)
    alpha_chars = F.length(F.regexp_replace(lowered, "[^a-z0-9 ]", ""))
    word_len_sum = F.aggregate(
        F.transform(w, F.length), F.lit(0), lambda acc, x: acc + x)
    # every ratio is ONE IEEE division of exact integers — published
    # raw: round(double, 6) of an integer ratio flips at half-boundary
    # values (k/128 word ratios land exactly on .5 micro-units) where
    # round implementations differ across engines/versions — the r10
    # driver-red class (VERDICT r10)
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        (word_len_sum.cast("double") / n_words).alias("avg_word_len"),
        ((n_chars - alpha_chars).cast("double") / n_chars)
        .alias("punct_ratio"),
        (_count_in(w, STOPWORDS).cast("double") / n_words)
        .alias("stopword_ratio"),
        (F.size(F.array_distinct(w)).cast("double") / n_words)
        .alias("uniq_word_ratio"),
    )


def gopher_repetition_signals(docs: DataFrame, text_col: str = "text",
                              top_n: int = 2, dup_n: int = 5) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1 —
    public paper), per document:

    - ``dup_word_frac`` — fraction of word occurrences that repeat an
      already-seen word;
    - ``top_ngram_char_frac`` — characters covered by all occurrences of
      the single most frequent ``top_n``-gram / total characters (ties
      break to the lexicographically smallest gram);
    - ``dup_ngram_char_frac`` — characters covered by ``dup_n``-grams
      occurring more than once / total characters.

    Plan: MAP-ONLY. Repetition is a per-document statistic, so the gram
    counting never leaves the row: one :func:`~..functions.text.
    gram_run_stats` sorted-run fold per n — the explode → groupBy(doc,
    gram) alternative shuffles corpus-token-scale data to recompute a
    per-row number, exactly the shuffle this formulation deletes at
    100 TB."""
    from ..functions.text import gram_run_stats

    w = words(F.col(text_col))
    n_chars = F.length(F.col(text_col))
    n_words = F.size(w)
    top_stats = gram_run_stats(ngrams(w, top_n))
    dup_stats = gram_run_stats(ngrams(w, dup_n))
    # zero-length guard: an empty document would otherwise divide by 0
    # — NULL under non-ANSI Spark vs inf/NaN in an IEEE oracle, and a
    # NULL signal sails through every > threshold filter rule. 0.0 is
    # the honest value (no characters, no repetition).
    frac = lambda num: F.when(
        n_chars > 0,
        num.cast("double") / n_chars).otherwise(F.lit(0.0))
    # Same guard for the word-denominator division: a NULL text yields
    # NULL n_words, and an unguarded NULL dup_word_frac sails through
    # every `> threshold` filter rule (repetition_filter would emit
    # keep=1 for it) — the char fractions above already coalesce to 0.0,
    # so the word fraction must too (ADVICE r8). Mirrored in the DuckDB
    # oracle (_REPETITION_SQL).
    return docs.select(
        "doc_id",
        F.when(n_words > 0,
               (n_words - F.size(F.array_distinct(w))).cast("double")
               / n_words).otherwise(F.lit(0.0))
         .alias("dup_word_frac"),
        frac(top_stats["bestc"] * F.length(top_stats["bestg"]))
        .alias("top_ngram_char_frac"),
        frac(dup_stats["dupchars"]).alias("dup_ngram_char_frac"),
    )


def entropy_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Shannon-entropy quality signals, per document: character-level
    and word-level distribution entropy in bits (H = log2(n) − Σ cᵢ·
    log2(cᵢ)/n). Low char entropy flags repeated-glyph gibberish and
    boilerplate padding; low word entropy flags template spam — the
    compressibility-style signal CCNet-class pipelines cut on, computed
    engine-side instead of via an external compressor.

    Plan: MAP-ONLY, the gopher_repetition_signals discipline — sort the
    symbol array inside the row and fold adjacent runs once with
    ``aggregate`` (no explode, no groupBy(doc, symbol) shuffle at
    corpus-token scale). The fold accumulates Σ run·log2(run) in SORTED
    symbol order, and the DuckDB twin sums ``k·log2(k)`` over a
    char-ordered list, so both engines add the same IEEE terms in the
    same sequence. Empty/NULL docs emit 0.0 (the dup_word_frac rule:
    a NULL signal would sail through every threshold filter)."""

    def run_log_sum(symbols: Column) -> Column:
        g = F.sort_array(symbols)
        zero = F.lit(0).cast("long")
        init = F.struct(F.lit("").alias("prev"), zero.alias("run"),
                        F.lit(0.0).alias("acc"))
        close = lambda acc: acc["acc"] + F.when(
            acc["run"] > 1,
            acc["run"].cast("double") * F.log2(acc["run"].cast("double"))
        ).otherwise(F.lit(0.0))

        def merge(acc: Column, x: Column) -> Column:
            same = x == acc["prev"]
            return F.struct(
                x.alias("prev"),
                F.when(same, acc["run"] + 1)
                 .otherwise(F.lit(1).cast("long")).alias("run"),
                F.when(same, acc["acc"]).otherwise(close(acc)).alias("acc"),
            )

        return F.aggregate(g, init, merge, close)

    def entropy(symbols: Column, n: Column) -> Column:
        return F.when(
            n > 0,
            F.round(F.log2(n.cast("double"))
                    - run_log_sum(symbols) / n.cast("double"), 6)
        ).otherwise(F.lit(0.0))

    chars = F.split(F.col(text_col), "")
    w = words(F.col(text_col))
    n_chars = F.length(F.col(text_col))
    n_words = F.size(w)
    return docs.select(
        "doc_id",
        F.coalesce(n_chars, F.lit(0)).cast("long").alias("n_chars"),
        entropy(chars, n_chars).alias("char_entropy"),
        entropy(w, n_words).alias("word_entropy"),
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count plus a BPE-ish regex token count
    (letter runs / digit runs / single non-alnum marks — the classic
    pre-tokenizer split). ``regexp_count`` keeps it codegen'd."""
    w = words(F.col(text_col))
    bpe_pattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
    return docs.select(
        "doc_id",
        F.size(w).alias("ws_tokens"),
        F.regexp_count(F.lower(F.col(text_col)), F.lit(bpe_pattern))
         .alias("bpe_tokens"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic profile-based language ID: score = # marker-function-
    word hits per language; argmax wins, ties break by LANG_MARKERS order.
    (The synthetic corpus shares one vocabulary so scores — not the
    driver's ``lang`` labels — are the correctness target.)"""
    w = words(F.col(text_col))
    scores = {lang: _count_in(w, marks) for lang, marks in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    pred: Column = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):
        pred = F.when((best > 0) & (scores[lang] == best), F.lit(lang)) \
                .otherwise(pred)
    cols = [F.col("doc_id"), F.col("lang").alias("labeled_lang")]
    cols += [scores[lang].alias(f"score_{lang}") for lang in LANG_MARKERS]
    cols.append(pred.alias("predicted_lang"))
    return docs.select(*cols)


def fingerprints(docs: DataFrame, text_col: str = "text",
                 shingle_n: int = 5, k: int = 4) -> DataFrame:
    """Rolling-hash document fingerprint (winnowing-lite): hash every
    ``shingle_n``-word shingle, keep the minimum as the scalar fingerprint
    and the ``k`` smallest as the sketch. Content-defined, so shared
    passages produce shared fingerprints across documents; the sketch is
    the join key for fingerprint-level near-dup clustering at scale.

    The sketch is emitted as a comma-joined string, not ``array<bigint>``:
    a scalar column hashes cleanly in any downstream comparator (and the
    join key for sketch-level grouping is the whole sketch anyway)."""
    sh = ngrams(words(F.col(text_col)), shingle_n)
    hashes = F.array_sort(F.transform(sh, lambda s: md5_hash64(s)))
    sketch = F.concat_ws(
        ",", F.transform(F.slice(hashes, 1, k), lambda x: x.cast("string")))
    return docs.select(
        "doc_id",
        F.get(hashes, 0).alias("fingerprint64"),  # null-safe for <n-word docs
        sketch.alias("sketch"),
    )


def tokenize_ids(docs: DataFrame, vocab_size: int = 32768,
                 text_col: str = "text") -> DataFrame:
    """Hashing-trick tokenization: every whitespace token maps to a
    deterministic id in [0, vocab_size) via ``md5(token) mod V`` — the
    feature-hashing vocabulary (no trained merges, no OOV). Returns
    (doc_id, n_tokens, token_ids_csv); ids are comma-joined so the
    output stays scalar for any downstream comparator.

    Map-only: one ``transform`` over the token array per doc (the array
    is the lambda input, so the split evaluates once — no O(words²)
    re-tokenization). A trained BPE would need a Python tokenizer via
    ``mapInPandas``; the Spark-side shape (schema, batching, pruning)
    would match ``operators/multimodal.py``'s decode pattern."""
    toks = words(F.col(text_col))
    ids = F.transform(
        toks, lambda t: (md5_hash64(t) % vocab_size).cast("string"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.concat_ws(",", ids).alias("token_ids_csv"))


def corpus_language_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus rollup: documents / mean quality metrics per predicted
    language. One partial-aggregated shuffle on a low-cardinality key."""
    lid = language_id(docs, text_col).select("doc_id", "predicted_lang")
    q = quality_signals(docs, text_col)
    return (
        q.join(lid, "doc_id")
         .groupBy("predicted_lang")
         .agg(F.count("*").alias("n_docs"),
              F.round(F.avg("n_words"), 6).alias("avg_n_words"),
              F.round(F.avg("stopword_ratio"), 6).alias("avg_stopword_ratio"),
              F.round(F.avg("uniq_word_ratio"), 6).alias("avg_uniq_word_ratio"))
    )


def ngram_diversity(docs: DataFrame, text_col: str = "text",
                    group_col: str = "source") -> DataFrame:
    """Distinct-n corpus diversity per group: unique-to-total unigram
    and bigram ratios — the distinct-1/distinct-2 readout (Li et al.,
    NAACL 2016, "A Diversity-Promoting Objective Function") that flags
    MODE COLLAPSE in a corpus slice before training does: synthetic or
    template-generated sources repeat the same n-grams, so their
    distinct ratio craters while per-doc quality signals stay normal.
    Returns (group, total/distinct unigrams, diversity_1, total/distinct
    bigrams, diversity_2).

    Plan: two explode→partial-aggregated groupBys (the Zipf-skewed hot
    grams pre-reduce map-side, same shape as the vocabulary builds) on
    the low-cardinality group key, joined at group grain. No window, no
    self-join; at 100 TB swap ``count_distinct`` for the HLL sketch
    (``operators/cardinality.py``) in the same plan."""
    from ..functions.text import ngrams, words

    uni = (docs.select(F.col(group_col),
                       F.explode(words(F.col(text_col))).alias("g"))
           .groupBy(group_col)
           .agg(F.count("*").cast("long").alias("total_unigrams"),
                F.count_distinct("g").cast("long")
                .alias("distinct_unigrams")))
    bi = (docs.select(F.col(group_col),
                      F.explode(ngrams(words(F.col(text_col)), 2))
                      .alias("g"))
          .groupBy(group_col)
          .agg(F.count("*").cast("long").alias("total_bigrams"),
               F.count_distinct("g").cast("long").alias("distinct_bigrams")))
    return (uni.join(bi, group_col)
            .select(group_col, "total_unigrams", "distinct_unigrams",
                    F.round(F.col("distinct_unigrams")
                            / F.col("total_unigrams"), 6)
                    .alias("diversity_1"),
                    "total_bigrams", "distinct_bigrams",
                    F.round(F.col("distinct_bigrams")
                            / F.col("total_bigrams"), 6)
                    .alias("diversity_2")))


def unigram_logprob(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-document unigram language-model score against the corpus's own
    word distribution — the cheap importance/quality signal behind
    DSIR-style data selection and perplexity filtering (a doc of rare
    words scores low-probability → high perplexity). Returns
    (doc_id, n_tokens, avg_logprob, unigram_ppl) where ``unigram_ppl`` =
    exp(-avg ln p(word)).

    Plan shape: the word-frequency model is one hash aggregate on the
    exploded token stream (map-side partials soak up the Zipf skew — hot
    words pre-reduce in every task before the shuffle). Scoring joins the
    model back onto the token stream WITHOUT a broadcast hint: a hint
    would force the attempt even on a web-scale vocabulary (an explicit
    hint never "degrades gracefully" — Spark obeys it); unhinted, AQE
    broadcasts the vocab while it fits under the threshold and otherwise
    plans a shuffle join on ``word``. Then one groupBy(doc) aggregate.
    The 1-row total remains an explicit broadcast. The document text
    itself never shuffles.
    """
    tok = docs.select(F.col(id_col).alias("id"),
                      F.explode(words(F.col(text_col))).alias("word"))
    freq = tok.groupBy("word").agg(F.count("*").alias("c"))
    tot = freq.agg(F.sum("c").cast("double").alias("n"))
    scored = (tok.join(freq, "word")
              .crossJoin(F.broadcast(tot))
              .select("id", F.log(F.col("c") / F.col("n")).alias("lp")))
    return (scored.groupBy("id")
            .agg(F.count("*").alias("n_tokens"),
                 F.round(F.avg("lp"), 6).alias("avg_logprob"),
                 F.round(F.exp(-F.avg("lp")), 6).alias("unigram_ppl"))
            .select(F.col("id").alias(id_col), "n_tokens",
                    "avg_logprob", "unigram_ppl"))


def dsir_importance(docs: DataFrame, target: DataFrame,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """DSIR-style importance weights: score every corpus document by how
    much more likely its words are under the TARGET distribution (the
    domain you want more of) than under the corpus's own — per-doc
    avg_w [ln p_target(w) − ln p_corpus(w)]. Positive ⇒ target-like;
    selection keeps the highest-weight docs (or samples ∝ weight).
    Returns (doc_id, n_tokens, avg_log_ratio, importance_weight) with
    ``importance_weight = exp(avg_log_ratio)``.

    Both unigram models use add-one smoothing over the SHARED vocabulary
    (the union of corpus and target words), so target-OOV words get a
    finite penalty instead of −∞ and the ratio is defined everywhere:
    p(w) = (c_w + 1) / (N + V).

    Plan shape: one hash aggregate per distribution (the target side is
    benchmark-scale); a full-outer merge of the two frequency tables
    forms the shared vocab — that merged model joins the corpus token
    stream UNHINTED (AQE broadcasts while it fits, shuffle-joins on
    ``word`` beyond — same reasoning as :func:`unigram_logprob`); the
    scalar (N_c, N_t, V) ride one broadcast 1-row frame. The corpus text
    never shuffles; everything downstream of the token explode is
    narrow-key aggregates."""
    def toks(df: DataFrame) -> DataFrame:
        return df.select(F.col(id_col).alias("id"),
                         F.explode(words(F.col(text_col))).alias("word"))

    ctok = toks(docs)
    cfreq = ctok.groupBy("word").agg(F.count("*").alias("cc"))
    tfreq = toks(target).groupBy("word").agg(F.count("*").alias("tc"))
    vocab = (cfreq.join(tfreq, "word", "full_outer")
             .select("word",
                     F.coalesce("cc", F.lit(0)).alias("cc"),
                     F.coalesce("tc", F.lit(0)).alias("tc")))
    consts = vocab.agg(
        F.sum("cc").cast("double").alias("nc"),
        F.sum("tc").cast("double").alias("nt"),
        F.count("*").cast("double").alias("v"))
    lr = (F.log((F.col("tc") + 1) / (F.col("nt") + F.col("v")))
          - F.log((F.col("cc") + 1) / (F.col("nc") + F.col("v"))))
    scored = (ctok.join(vocab, "word")
              .crossJoin(F.broadcast(consts))
              .select("id", lr.alias("lr")))
    return (scored.groupBy("id")
            .agg(F.count("*").alias("n_tokens"),
                 # + 0.0 canonicalizes signed zero: round() of a tiny
                 # negative average yields -0.0 in DuckDB vs +0.0 in
                 # Spark (sf0.1 bitwise-audit catch) — IEEE x+0.0 maps
                 # -0.0 to +0.0 and is the identity for everything else
                 (F.round(F.avg("lr"), 6) + F.lit(0.0))
                 .alias("avg_log_ratio"),
                 F.round(F.exp(F.avg("lr")), 6).alias("importance_weight"))
            .select(F.col("id").alias(id_col), "n_tokens",
                    "avg_log_ratio", "importance_weight"))


def bigram_logprob(docs: DataFrame, lam: float = 0.75,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-document interpolated-bigram LM score against the corpus's
    own distribution — one model-capacity step above
    :func:`unigram_logprob` (a doc of common words in UNCOMMON order now
    scores low, which the unigram model cannot see). Each position
    i >= 1 contributes ln(lam * p(w_i | w_{i-1}) + (1-lam) * p(w_i)):
    Jelinek-Mercer interpolation, whose unigram floor keeps unseen
    continuations finite without Katz-style backoff bookkeeping.
    ``lam`` defaults to a dyadic 0.75 (exact in binary FP). Returns
    (doc_id, n_bigrams, avg_logprob, bigram_ppl); one-word docs have no
    bigram and drop out, as in the DuckDB twin.

    Plan: bigram lists build MAP-ONLY per doc (the let-bound
    ``ngrams`` transform — no O(words²) re-split), so the only
    token-scale shuffles are the two count models (gram, word) and the
    score joins, all unhinted so AQE broadcasts the vocab while it fits
    and degrades to shuffle joins at web scale. Document text never
    shuffles."""
    w = words(F.col(text_col))
    grams = (docs.select(F.col(id_col).alias("id"),
                         F.explode(ngrams(w, 2)).alias("g"))
             .select("id", "g",
                     F.split("g", " ").getItem(0).alias("_w1"),
                     F.split("g", " ").getItem(1).alias("_w2")))
    tok = docs.select(F.explode(w).alias("word"))
    uni = tok.groupBy("word").agg(F.count("*").alias("c1"))
    tot = uni.agg(F.sum("c1").cast("double").alias("n"))
    bi = grams.groupBy("g").agg(F.count("*").alias("c2"))
    u1 = uni.select(F.col("word").alias("_w1"), F.col("c1").alias("_c_prev"))
    u2 = uni.select(F.col("word").alias("_w2"), F.col("c1").alias("_c_cur"))
    p_bi = F.col("c2").cast("double") / F.col("_c_prev").cast("double")
    p_uni = F.col("_c_cur").cast("double") / F.col("n")
    scored = (grams.join(bi, "g").join(u1, "_w1").join(u2, "_w2")
              .crossJoin(F.broadcast(tot))
              .select("id", F.log(F.lit(lam) * p_bi
                                  + F.lit(1.0 - lam) * p_uni).alias("lp")))
    return (scored.groupBy("id")
            .agg(F.count("*").cast("long").alias("n_bigrams"),
                 F.round(F.avg("lp"), 6).alias("avg_logprob"),
                 F.round(F.exp(-F.avg("lp")), 6).alias("bigram_ppl"))
            .select(F.col("id").alias(id_col), "n_bigrams",
                    "avg_logprob", "bigram_ppl"))


def vocab_growth(docs: DataFrame, deciles: int = 10,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Heaps-law vocabulary-growth curve: distinct vocabulary and total
    tokens after the first 10%, 20%, ... of the corpus (by doc id) —
    the readout that says whether a corpus is still contributing new
    types or has saturated (flattening type/token ratio → diminishing
    deduplication value of further ingestion). Returns one row per
    decile: (decile, threshold_doc, n_tokens, vocab_size,
    type_token_ratio). Thresholds derive from the corpus's own max id,
    so the curve is scale-free across sf dirs.

    Scale shape: a word enters the vocabulary at its MIN doc id — one
    token-scale aggregate — and each of the 10 checkpoints then counts
    words whose first appearance precedes it: vocab-scale rows × 10 via
    a broadcast threshold fan-out, never a re-scan of the corpus per
    checkpoint. Token totals fan the per-doc count frame out the same
    way. All integers until the final ratio."""
    w = words(F.col(text_col))
    tok = docs.select(F.col(id_col).alias("id"),
                      F.explode(w).alias("word"))
    fd = tok.groupBy("word").agg(F.min("id").alias("_fd"))
    per_doc = docs.select(F.col(id_col).alias("id"),
                          F.size(w).cast("long").alias("_nt"))
    thresholds = (docs.agg(F.max(F.col(id_col)).alias("_mx"))
                  .select(F.explode(F.sequence(
                      F.lit(1), F.lit(deciles))).alias("decile"), "_mx")
                  .select("decile",
                          F.floor(F.col("_mx") * F.col("decile")
                                  / F.lit(deciles)).cast("long")
                          .alias("threshold_doc")))
    vocab = (fd.crossJoin(F.broadcast(thresholds))
             .filter(F.col("_fd") <= F.col("threshold_doc"))
             .groupBy("decile", "threshold_doc")
             .agg(F.count("*").cast("long").alias("vocab_size")))
    toks = (per_doc.crossJoin(F.broadcast(thresholds))
            .filter(F.col("id") <= F.col("threshold_doc"))
            .groupBy("decile", "threshold_doc")
            .agg(F.sum("_nt").cast("long").alias("n_tokens")))
    return (toks.join(vocab, ["decile", "threshold_doc"])
            .select("decile", "threshold_doc", "n_tokens", "vocab_size",
                    (F.col("vocab_size").cast("double")
                     / F.col("n_tokens"))
                    .alias("type_token_ratio")))


def zipf_fit(docs: DataFrame, top_k: int = 100,
             text_col: str = "text") -> DataFrame:
    """Zipf-law fit over the top-``top_k`` word frequencies: OLS slope
    of ln(freq) on ln(rank) (a healthy natural-language corpus sits
    near -1; template/boilerplate-heavy corpora flatten, spam inflates
    the head) — a one-row corpus-forensics gate next to the Benford
    audit. Returns (n_terms, zipf_slope, zipf_intercept, r2).

    Engine parity for a REGRESSION ON LOGS: each ln is rounded to 9
    decimals and every regression moment accumulates as an exact
    DECIMAL of those rounded values (doubles would sum in
    engine-specific order) — the fit is then one fixed double
    expression. The frequency table reduces token-scale data once;
    ranking the top-k is a single-partition window over k rows, the
    standard coordinator-scale model fit."""
    from pyspark.sql import Window
    tok = docs.select(F.explode(words(F.col(text_col))).alias("word"))
    freq = tok.groupBy("word").agg(F.count("*").alias("c"))
    top = (freq.orderBy(F.col("c").desc(), F.col("word")).limit(top_k)
           .withColumn("rk", F.row_number().over(
               Window.orderBy(F.col("c").desc(), F.col("word")))))
    x = F.round(F.log(F.col("rk").cast("double")), 9)
    y = F.round(F.log(F.col("c").cast("double")), 9)
    pts = top.select(x.alias("_x"), y.alias("_y"))
    g = pts.agg(
        F.count("*").cast("long").alias("n_terms"),
        F.sum(F.col("_x").cast("decimal(18,9)")).alias("_sx"),
        F.sum(F.col("_y").cast("decimal(18,9)")).alias("_sy"),
        F.sum(F.round(F.col("_x") * F.col("_y"), 12)
              .cast("decimal(30,12)")).alias("_sxy"),
        F.sum(F.round(F.col("_x") * F.col("_x"), 12)
              .cast("decimal(30,12)")).alias("_sxx"),
        F.sum(F.round(F.col("_y") * F.col("_y"), 12)
              .cast("decimal(30,12)")).alias("_syy"))
    n = F.col("n_terms").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx, syy = F.col("_sxx").cast("double"), F.col("_syy").cast("double")
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    slope = (n * sxy - sx * sy) / dx
    return g.select(
        "n_terms",
        F.round(F.when(dx > 0, slope), 6).alias("zipf_slope"),
        F.round(F.when(dx > 0, (sy - slope * sx) / n), 6)
        .alias("zipf_intercept"),
        F.round(F.when((dx > 0) & (dy > 0),
                       (n * sxy - sx * sy) * (n * sxy - sx * sy)
                       / (dx * dy)), 6).alias("r2"))


def feature_hashing(docs: DataFrame, dim: int = 16,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """The hashing trick (Weinberger et al. 2009): fixed-dimension
    signed token-count features with NO vocabulary — each token maps to
    slot md5(token) mod dim with sign from an independent hash bit (the
    signed variant keeps collision bias zero-mean), so featurization is
    one stateless map regardless of vocabulary size. The classic cheap
    featurizer for linear classifiers / dedup pre-filters where a BPE
    or vocab model is too heavy. Returns (doc_id, f_0 .. f_{dim-1}),
    flat scalar columns (the harness's canonicalizer cannot hash
    list cells — the established flat-projection rule).

    Plan: explode → two md5 expressions → one (doc, slot) pivot via
    conditional sums in a single groupBy(doc) — no shuffle wider than
    the doc grain, no model state anywhere."""
    from ..functions.hashes import md5_hash32, md5_hash64

    tok = docs.select(F.col(id_col).alias("id"),
                      F.explode(words(F.col(text_col))).alias("w"))
    slot = (md5_hash64(F.col("w")) % dim).alias("_slot")
    sign = F.when(md5_hash32(F.col("w"), seed=1) % 2 == 0,
                  F.lit(1)).otherwise(F.lit(-1)).alias("_sign")
    hashed = tok.select("id", slot, sign)
    aggs = [F.sum(F.when(F.col("_slot") == j, F.col("_sign"))
                  .otherwise(0)).cast("long").alias(f"f_{j}")
            for j in range(dim)]
    return (hashed.groupBy(F.col("id").alias(id_col)).agg(*aggs))


def term_burstiness(docs: DataFrame, top_k: int = 20,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Term burstiness (Church & Gale, 1995): the variance-to-mean
    ratio (Fano factor) of a term's per-document count ACROSS the whole
    corpus, zeros included — the forensic beside the Zipf/Heaps fits.
    A Poisson-scattered term sits near 1.0; content words clump
    (burstiness ≫ 1) while function words spread evenly (≈ 1) — a
    synthetic/template corpus shows the wrong profile (its "content"
    terms are stamped uniformly, so their burstiness collapses toward
    the function-word band).

    Zeros never enumerate: a doc without the term contributes 0 to both
    Σc and Σc², so the corpus-wide moments are the term's own tf sums
    plus the document COUNT — mean = Σc/N, var = (Σc² − (Σc)²/N)/(N−1),
    all from exact integer sums (one double formula each, association
    mirrored in the oracle). Scope is the top ``top_k`` terms by
    document frequency (ties to term text) via TakeOrderedAndProject —
    the stable high-signal slice, not a vocab-scale report."""
    from ..functions.text import words
    tf = (docs.select(F.col(id_col).alias("id"),
                      F.explode(words(F.col(text_col))).alias("w"))
          .groupBy("id", "w").agg(F.count("*").alias("c")))
    stats = tf.groupBy("w").agg(
        F.count("*").alias("df"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"))
    n_docs = docs.select(F.count("*").alias("n"))
    nd = F.col("n").cast("double")
    s1, s2 = F.col("s1").cast("double"), F.col("s2").cast("double")
    mean = s1 / nd
    var = (s2 - s1 * s1 / nd) / (nd - F.lit(1.0))
    return (stats.crossJoin(F.broadcast(n_docs))
            .orderBy(F.desc("df"), "w").limit(top_k)
            .select(F.col("w").alias("term"),
                    F.col("df").cast("bigint").alias("df"),
                    F.col("s1").cast("bigint").alias("total_tf"),
                    F.round(mean, 6).alias("mean_tf"),
                    F.round(var, 6).alias("variance_tf"),
                    F.round(var / mean, 6).alias("burstiness")))
