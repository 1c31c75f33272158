"""Text-analysis operator tests: hand-computed goldens on tiny fixtures
plus structural checks on the driver corpus. Mirrors the reference's
golden-row test style (test_utils/helpers.py:240-289) at DataFrame level.
"""

from __future__ import annotations

from openedx_event_sink_clickhouse_spark.operators.textstats import (
    corpus_language_profile,
    fingerprints,
    language_id,
    quality_signals,
    token_counts,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_quality_signals_golden(spark):
    df = _docs(spark, [(1, "The cat, and a dog!", "en")])
    r = quality_signals(df).collect()[0]
    # words: [the, cat,, and, a, dog!] -> 5 tokens, 15 word chars
    assert r.n_chars == 19
    assert r.n_words == 5
    assert r.avg_word_len == 3.0
    # non-[a-z0-9 ] chars: ',' and '!' -> 2/19 (raw IEEE division —
    # the ratios publish unrounded since r11, VERDICT r10 half-boundary class)
    assert r.punct_ratio == 2 / 19
    # stopwords among tokens: the, and, a  ("cat," has the comma attached)
    assert r.stopword_ratio == 3 / 5
    assert r.uniq_word_ratio == 1.0


def test_token_counts_golden(spark):
    df = _docs(spark, [(1, "ab1 c-d  e", "en")])
    r = token_counts(df).collect()[0]
    # whitespace split on single spaces: [ab1, c-d, '', e]
    assert r.ws_tokens == 4
    # regex runs: ab|1|c|-|d|e
    assert r.bpe_tokens == 6


def test_language_id_markers_and_tiebreak(spark):
    df = _docs(spark, [
        (1, "der hund und die katze ist da", "de"),
        (2, "xyzzy qwerty", "zz"),          # no markers -> und
        (3, "the la", "mix"),               # en==fr tie -> en (priority order)
    ])
    out = {r.doc_id: r for r in language_id(df).collect()}
    assert out[1].predicted_lang == "de" and out[1].score_de == 4
    assert out[2].predicted_lang == "und"
    assert out[3].predicted_lang == "en"
    assert out[3].score_en == out[3].score_fr == 1


def test_fingerprints_shared_passage(spark):
    shared = "one two three four five six seven"
    df = _docs(spark, [
        (1, shared + " tail a", "en"),
        (2, "head b " + shared, "en"),
        (3, "completely different words here now ok", "en"),
    ])
    out = {r.doc_id: r for r in fingerprints(df).collect()}
    # docs 1 and 2 share 5-gram shingles from the common passage, so their
    # sketches overlap; doc 3 shares nothing. Sketch is a comma-joined
    # string of the k smallest shingle hashes.
    sk = {i: set(int(x) for x in out[i].sketch.split(",")) for i in (1, 2, 3)}
    assert sk[1] & sk[2]
    assert not sk[1] & sk[3]
    assert out[1].fingerprint64 == min(sk[1])


def test_fingerprints_short_doc_null_safe(spark):
    df = _docs(spark, [(1, "too short", "en")])
    r = fingerprints(df).collect()[0]
    assert r.fingerprint64 is None
    assert r.sketch == ""


def test_corpus_profile_partitions_all_docs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    prof = corpus_language_profile(docs).collect()
    assert sum(r.n_docs for r in prof) == docs.count()


def test_tokenize_ids_hashing_trick(spark):
    from openedx_event_sink_clickhouse_spark.operators.textstats import (
        tokenize_ids,
    )
    df = spark.createDataFrame(
        [(1, "Spam spam eggs"), (2, "")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in tokenize_ids(df, vocab_size=100).collect()}
    ids1 = out[1].token_ids_csv.split(",")
    assert out[1].n_tokens == 3 and len(ids1) == 3
    # same (lowercased) token -> same id; all ids within the vocab
    assert ids1[0] == ids1[1] != ids1[2]
    assert all(0 <= int(i) < 100 for i in ids1)


def test_unigram_logprob_hand_computed(spark):
    import math

    from openedx_event_sink_clickhouse_spark.operators.textstats import (
        unigram_logprob,
    )
    # Corpus counts: a:2, b:2 over 4 tokens → p = 0.5 everywhere, so
    # every doc's avg log-prob is ln(0.5) and unigram_ppl is exactly 2.
    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "b")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
    assert out[0]["n_tokens"] == 3 and out[1]["n_tokens"] == 1
    for r in out.values():
        assert r["avg_logprob"] == round(math.log(0.5), 6)
        assert r["unigram_ppl"] == 2.0


def test_unigram_logprob_rare_words_raise_perplexity(spark):
    from openedx_event_sink_clickhouse_spark.operators.textstats import (
        unigram_logprob,
    )
    # Doc 1 is all hapaxes; doc 0 repeats the dominant word — the rare
    # doc must score strictly higher perplexity.
    docs = spark.createDataFrame(
        [(0, "x x x x x x"), (1, "q r s t u v")], ["doc_id", "text"])
    out = {r["doc_id"]: r["unigram_ppl"]
           for r in unigram_logprob(docs).collect()}
    assert out[1] > out[0]


def test_dsir_importance_prefers_target_like_docs(spark):
    from openedx_event_sink_clickhouse_spark.operators.textstats import (
        dsir_importance,
    )
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma alpha beta"),
         (1, "delta epsilon zeta delta epsilon"),
         (2, "alpha beta alpha beta gamma")],
        ["doc_id", "text"])
    target = spark.createDataFrame(
        [(9, "alpha beta gamma beta alpha")], ["doc_id", "text"])
    out = {r.doc_id: r for r in dsir_importance(docs, target).collect()}
    assert len(out) == 3
    # Target-vocabulary docs outscore the disjoint-vocabulary doc.
    assert out[0].importance_weight > out[1].importance_weight
    assert out[2].importance_weight > out[1].importance_weight
    # Target-like docs land above 1 (more likely under target),
    # disjoint docs below.
    assert out[0].avg_log_ratio > 0 > out[1].avg_log_ratio


def test_dsir_importance_smoothing_handles_oov(spark):
    # A word absent from BOTH models never occurs in the token stream;
    # a word absent only from the target must get a finite penalty.
    from openedx_event_sink_clickhouse_spark.operators.textstats import (
        dsir_importance,
    )
    docs = spark.createDataFrame([(0, "only corpus words")],
                                 ["doc_id", "text"])
    target = spark.createDataFrame([(9, "unrelated target text")],
                                   ["doc_id", "text"])
    row = dsir_importance(docs, target).collect()[0]
    import math
    assert math.isfinite(row.avg_log_ratio)
    assert row.importance_weight > 0


def test_gopher_repetition_signals_golden(spark):
    from openedx_event_sink_clickhouse_spark.operators.textstats import (
        gopher_repetition_signals)
    # doc 1: "a b a b a c" — words 6, distinct 3 -> dup_word_frac 0.5
    #   2-grams: [a b, b a, a b, b a, a c]; top is "a b"×2 (tie with
    #   "b a"×2 broken lexicographically) -> 2*3/11 chars
    #   3-grams: [a b a, b a b, a b a, b a c]; dup "a b a"×2 -> 2*5/11
    df = _docs(spark, [(1, "a b a b a c", "en")])
    r = gopher_repetition_signals(df, dup_n=3).collect()[0]
    assert r.dup_word_frac == 0.5
    # raw IEEE divisions since r11 (VERDICT r10 half-boundary class)
    assert r.top_ngram_char_frac == 6 / 11
    assert r.dup_ngram_char_frac == 10 / 11
    # doc shorter than n words: all gram stats zero, no error
    short = gopher_repetition_signals(
        _docs(spark, [(2, "hello", "en")]), dup_n=3).collect()[0]
    assert short.top_ngram_char_frac == 0.0
    assert short.dup_ngram_char_frac == 0.0
    assert short.dup_word_frac == 0.0
    # no repetition at all -> dup fracs 0, top gram counted once
    clean = gopher_repetition_signals(
        _docs(spark, [(3, "w x y z", "en")]), dup_n=3).collect()[0]
    assert clean.dup_word_frac == 0.0
    assert clean.top_ngram_char_frac == 3 / 7  # "w x"×1
    assert clean.dup_ngram_char_frac == 0.0


def test_repetition_filter_reason_order(spark):
    from openedx_event_sink_clickhouse_spark.operators.curation import (
        repetition_filter)
    rows = [
        (1, " ".join(["spam"] * 30), "en"),            # dup_words fires first
        (2, " ".join(f"w{i}" for i in range(40)), "en"),  # clean
    ]
    got = {r.doc_id: r for r in
           repetition_filter(_docs(spark, rows)).collect()}
    assert got[1].keep == 0 and got[1].reason == "dup_words"
    assert got[2].keep == 1 and got[2].reason is None


def test_entropy_signals_hand_computed(spark):
    # Hand-verifiable distributions: uniform chars hit log2(k) exactly;
    # a single repeated glyph is 0 bits; NULL/empty coalesce to 0.0
    # (the dup_word_frac rule — no NULL sails through a threshold).
    import math

    from openedx_event_sink_clickhouse_spark.operators.textstats import (
        entropy_signals)

    docs = spark.createDataFrame(
        [(0, "abcd"),          # uniform over 4 chars -> 2.0 bits
         (1, "aaaa"),          # degenerate -> 0.0
         (2, "aabb"),          # uniform over 2 -> 1.0
         (3, "a b a b"),       # words: {a:2, b:2} -> 1.0 bit
         (4, ""), (5, None)],
        "doc_id long, text string")
    got = {r.doc_id: r for r in entropy_signals(docs).collect()}
    assert got[0].char_entropy == 2.0
    assert got[1].char_entropy == 0.0
    assert got[2].char_entropy == 1.0
    assert got[3].word_entropy == 1.0
    assert got[4].char_entropy == 0.0 and got[4].word_entropy == 0.0
    assert got[5].char_entropy == 0.0 and got[5].word_entropy == 0.0
    assert got[5].n_chars == 0
    # non-trivial distribution vs math.log2 reference: "aab" ->
    # 3 chars, counts {a:2, b:1}: H = log2(3) - (2*log2(2))/3
    docs2 = spark.createDataFrame([(0, "aab")], "doc_id long, text string")
    h = entropy_signals(docs2).collect()[0].char_entropy
    assert h == round(math.log2(3) - 2 * math.log2(2) / 3, 6)


def test_entropy_signals_flag_gibberish_below_prose(spark):
    from openedx_event_sink_clickhouse_spark.operators.textstats import (
        entropy_signals)

    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "aaaaaaaa aaaaaaaa aaaaaaaa aaaaaaaa"),
         (2, "spam spam spam spam spam spam spam spam")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in entropy_signals(docs).collect()}
    assert got[1].char_entropy < got[0].char_entropy   # glyph spam
    assert got[2].word_entropy == 0.0                  # template spam
    assert got[0].word_entropy > 2.5                   # real prose


def test_bigram_logprob_known_corpus(spark):
    # Corpus: "a b a b" + "b a". Bigrams: (a,b)x2, (b,a)x2. Unigrams:
    # a:3, b:3, N=6. For doc 0, every bigram has p(w2|w1)=2/3 wait:
    # c2(a b)=2, c1(a)=3 -> 2/3; c2(b a)=2, c1(b)=3 -> 2/3; p_uni=0.5.
    # term = ln(0.75*2/3 + 0.25*0.5) = ln(0.625) everywhere.
    import math
    from openedx_event_sink_clickhouse_spark.operators.textstats import (
        bigram_logprob)
    docs = spark.createDataFrame([(0, "a b a b"), (1, "b a")],
                                 ["doc_id", "text"])
    out = {r.doc_id: r for r in bigram_logprob(docs).collect()}
    assert out[0].n_bigrams == 3 and out[1].n_bigrams == 1
    expect = round(math.log(0.75 * 2 / 3 + 0.25 * 0.5), 6)
    assert out[0].avg_logprob == expect
    assert out[1].avg_logprob == expect


def test_bigram_logprob_drops_single_word_docs(spark):
    from openedx_event_sink_clickhouse_spark.operators.textstats import (
        bigram_logprob)
    docs = spark.createDataFrame([(0, "only"), (1, "two words")],
                                 ["doc_id", "text"])
    out = bigram_logprob(docs).collect()
    assert [r.doc_id for r in out] == [1]


def test_vocab_growth_monotone_and_exact(spark):
    # 10 docs, doc i introduces exactly one new word plus one repeat:
    # vocab at decile d must be d+? -- construct explicitly.
    from openedx_event_sink_clickhouse_spark.operators.textstats import (
        vocab_growth)
    docs = spark.createDataFrame(
        [(i, f"w{i} shared") for i in range(1, 11)], ["doc_id", "text"])
    out = sorted(vocab_growth(docs).collect(), key=lambda r: r.decile)
    assert len(out) == 10
    # decile d covers docs 1..d: vocab = d new words + "shared".
    for d, r in enumerate(out, start=1):
        assert r.threshold_doc == d
        assert r.vocab_size == d + 1
        assert r.n_tokens == 2 * d
    # monotone growth in both axes
    assert all(a.vocab_size <= b.vocab_size for a, b in zip(out, out[1:]))


def test_zipf_fit_exact_power_law(spark):
    # freq(rank) = C * rank^-0.8 exactly (integer-rounded counts break
    # exactness, so build counts by repeating words): slope must
    # recover ~-0.8 with r2 ~ 1 on an exact log-log line. Use powers of
    # 2 for exactness: freq = 2^(10 - rank) -> slope of ln f vs ln rank
    # is NOT linear, so instead pin a 2-point fit which any line fits:
    # r2 == 1 and slope = (y2-y1)/(x2-x1).
    import math
    from openedx_event_sink_clickhouse_spark.operators.textstats import (
        zipf_fit)
    rows = [(0, " ".join(["alpha"] * 8 + ["beta"] * 2))]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    r = zipf_fit(docs, top_k=10).collect()[0]
    assert r.n_terms == 2
    expect = (math.log(2) - math.log(8)) / (math.log(2) - math.log(1))
    assert abs(r.zipf_slope - expect) < 1e-5
    assert r.r2 == 1.0


def test_zipf_fit_single_term_null_fit(spark):
    from openedx_event_sink_clickhouse_spark.operators.textstats import (
        zipf_fit)
    docs = spark.createDataFrame([(0, "same same same")],
                                 ["doc_id", "text"])
    r = zipf_fit(docs).collect()[0]
    assert r.n_terms == 1 and r.zipf_slope is None


def test_feature_hashing_fixed_dim_and_sign_consistency(spark):
    # Same token always lands in the same signed slot: a doc of one
    # repeated word has |f_slot| == count and all other slots 0; two
    # docs sharing the word agree on slot and sign direction.
    from openedx_event_sink_clickhouse_spark.operators.textstats import (
        feature_hashing)
    docs = spark.createDataFrame(
        [(0, "spark spark spark"), (1, "spark")], ["doc_id", "text"])
    out = {r.doc_id: r for r in feature_hashing(docs, dim=8).collect()}
    v0 = [out[0][f"f_{j}"] for j in range(8)]
    v1 = [out[1][f"f_{j}"] for j in range(8)]
    nz0 = [(j, x) for j, x in enumerate(v0) if x != 0]
    nz1 = [(j, x) for j, x in enumerate(v1) if x != 0]
    assert len(nz0) == 1 and len(nz1) == 1
    assert nz0[0][0] == nz1[0][0]          # same slot
    assert nz0[0][1] == 3 * nz1[0][1]      # same sign, 3x magnitude


def test_ngram_diversity_ratios(spark):
    # "a a a a" collapses to 1 distinct unigram / 4 total (diversity_1 =
    # 0.25) and 1 distinct bigram / 3 (0.333333); "a b c d" is fully
    # diverse (1.0 / 1.0). Mode collapse shows as a cratered ratio.
    from openedx_event_sink_clickhouse_spark.operators.textstats import (
        ngram_diversity)

    docs = spark.createDataFrame(
        [(1, "a a a a", "dup"), (2, "a b c d", "fresh")],
        "doc_id long, text string, source string")
    got = {r.source: r for r in ngram_diversity(docs).collect()}
    d = got["dup"]
    assert (d.total_unigrams, d.distinct_unigrams) == (4, 1)
    assert d.diversity_1 == 0.25
    assert (d.total_bigrams, d.distinct_bigrams) == (3, 1)
    assert d.diversity_2 == 0.333333
    f = got["fresh"]
    assert f.diversity_1 == 1.0 and f.diversity_2 == 1.0


def test_term_burstiness_separates_clumped_from_even_terms(spark):
    import numpy as np
    import pytest
    from openedx_event_sink_clickhouse_spark.operators.textstats import (
        term_burstiness)
    # "the" appears once in EVERY doc (even); "spark" appears 8 times
    # in one doc only (maximally bursty); both have comparable total tf
    docs = [(i, "the filler words here now") for i in range(8)]
    docs.append((8, "the " + " ".join(["spark"] * 8)))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["term"]: r for r in term_burstiness(df, top_k=10).collect()}
    n = 9
    # hand oracle for any term: counts vector over all 9 docs
    def fano(counts):
        a = np.array(counts + [0] * (n - len(counts)), dtype=float)
        return a.var(ddof=1) / a.mean()
    assert out["the"]["df"] == 9 and out["the"]["total_tf"] == 9
    assert out["the"]["burstiness"] == pytest.approx(fano([1] * 9), abs=1e-6)
    assert out["spark"]["burstiness"] == pytest.approx(fano([8]), abs=1e-6)
    # the clumped term must dominate the even one by an order of magnitude
    assert out["spark"]["burstiness"] > 10 * out["the"]["burstiness"]
    # zeros-included mean: total_tf / n_docs, not total_tf / df
    assert out["spark"]["mean_tf"] == pytest.approx(8 / 9, abs=1e-6)
