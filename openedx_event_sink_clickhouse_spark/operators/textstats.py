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
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        F.round(word_len_sum.cast("double") / n_words, 6).alias("avg_word_len"),
        F.round((n_chars - alpha_chars).cast("double") / n_chars, 6)
         .alias("punct_ratio"),
        F.round(_count_in(w, STOPWORDS).cast("double") / n_words, 6)
         .alias("stopword_ratio"),
        F.round(F.size(F.array_distinct(w)).cast("double") / n_words, 6)
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
        F.round(num.cast("double") / n_chars, 6)).otherwise(F.lit(0.0))
    # Same guard for the word-denominator division: a NULL text yields
    # NULL n_words, and an unguarded NULL dup_word_frac sails through
    # every `> threshold` filter rule (repetition_filter would emit
    # keep=1 for it) — the char fractions above already coalesce to 0.0,
    # so the word fraction must too (ADVICE r8). Mirrored in the DuckDB
    # oracle (_REPETITION_SQL).
    return docs.select(
        "doc_id",
        F.when(n_words > 0,
               F.round((n_words - F.size(F.array_distinct(w))).cast("double")
                       / n_words, 6)).otherwise(F.lit(0.0))
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
                 F.round(F.avg("lr"), 6).alias("avg_log_ratio"),
                 F.round(F.exp(F.avg("lr")), 6).alias("importance_weight"))
            .select(F.col("id").alias(id_col), "n_tokens",
                    "avg_log_ratio", "importance_weight"))
