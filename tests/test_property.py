"""Property-based tests (hypothesis): the custom operators vs brute-force
reference implementations on randomized inputs. Sizes are bounded and
examples capped so each property stays a few seconds; Spark work is
wide-schema-free so the round trips stay cheap."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from openedx_event_sink_clickhouse_spark.operators.asof import asof_join
from openedx_event_sink_clickhouse_spark.operators.rangejoin import range_join
from openedx_event_sink_clickhouse_spark.operators.skew import salted_aggregate

BASE = dt.datetime(2024, 1, 1)

_PROP = dict(max_examples=12, deadline=None,
             suppress_health_check=[HealthCheck.function_scoped_fixture])


def _dt(minutes: int) -> dt.datetime:
    return BASE + dt.timedelta(minutes=int(minutes))


rows_left = st.lists(
    st.tuples(st.integers(0, 3),            # key
              st.integers(0, 500)),         # ts minutes
    min_size=1, max_size=30)
rows_right = st.lists(
    st.tuples(st.integers(0, 3),
              st.integers(0, 500),
              st.floats(-100, 100, allow_nan=False)),
    min_size=0, max_size=20)


@given(rows_left, rows_right)
@settings(**_PROP)
def test_asof_matches_pandas_merge_asof(spark, lefts, rights):
    left = spark.createDataFrame(
        [(i, f"k{k}", _dt(m)) for i, (k, m) in enumerate(lefts)],
        "id long, k string, ts timestamp")
    right = spark.createDataFrame(
        [(f"k{k}", _dt(m), v) for k, m, v in rights] or
        [("__none__", _dt(0), 0.0)],
        "k string, rts timestamp, price double")

    got = {r.id: (r.asof_rts, r.asof_price) for r in
           asof_join(left, right, "k", "ts", "rts", ["price"]).collect()}

    # brute-force reference: latest right at-or-before, ties → max value
    # is irrelevant because (k, rts) duplicates keep last-sorted; emulate
    # pandas merge_asof per key
    rdf = pd.DataFrame([(f"k{k}", _dt(m), v) for k, m, v in rights] or
                       [("__none__", _dt(0), 0.0)],
                       columns=["k", "rts", "price"])
    for i, (k, m) in enumerate(lefts):
        sub = rdf[(rdf.k == f"k{k}") & (rdf.rts <= _dt(m))]
        if sub.empty:
            assert got[i] == (None, None)
        else:
            best = sub.sort_values(["rts"]).iloc[-1]
            assert got[i][0] == best.rts.to_pydatetime()
            # value ambiguity when duplicate (k, rts): accept any of them
            cands = set(sub[sub.rts == best.rts].price)
            assert got[i][1] in cands


@given(rows_left, rows_right, st.integers(1, 120))
@settings(**_PROP)
def test_asof_tolerance_matches_bruteforce(spark, lefts, rights, tol_min):
    # merge_asof(tolerance=...) semantics: the latest at-or-before match
    # survives only if left.ts - right.ts <= tolerance; otherwise every
    # matched column is NULL.
    left = spark.createDataFrame(
        [(i, f"k{k}", _dt(m)) for i, (k, m) in enumerate(lefts)],
        "id long, k string, ts timestamp")
    right = spark.createDataFrame(
        [(f"k{k}", _dt(m), v) for k, m, v in rights] or
        [("__none__", _dt(0), 0.0)],
        "k string, rts timestamp, price double")
    got = {r.id: (r.asof_rts, r.asof_price) for r in
           asof_join(left, right, "k", "ts", "rts", ["price"],
                     tolerance=f"{tol_min} minutes").collect()}
    rdf = pd.DataFrame([(f"k{k}", _dt(m), v) for k, m, v in rights] or
                       [("__none__", _dt(0), 0.0)],
                       columns=["k", "rts", "price"])
    for i, (k, m) in enumerate(lefts):
        sub = rdf[(rdf.k == f"k{k}") & (rdf.rts <= _dt(m))]
        if sub.empty:
            assert got[i] == (None, None)
            continue
        best = sub.sort_values(["rts"]).iloc[-1]
        if best.rts.to_pydatetime() < _dt(m) - dt.timedelta(minutes=tol_min):
            assert got[i] == (None, None)
        else:
            assert got[i][0] == best.rts.to_pydatetime()
            cands = set(sub[sub.rts == best.rts].price)
            assert got[i][1] in cands


@given(rows_left, rows_right, st.integers(60, 7200))
@settings(**_PROP)
def test_range_join_matches_bruteforce(spark, lefts, rights, bucket_secs):
    left = spark.createDataFrame(
        [(i, f"k{k}", _dt(m)) for i, (k, m) in enumerate(lefts)],
        "id long, k string, ts timestamp")
    right = spark.createDataFrame(
        [(j, f"k{k}", _dt(m), _dt(m + 30)) for j, (k, m, _) in enumerate(rights)]
        or [(0, "__none__", _dt(0), _dt(0))],
        "rid long, k string, start timestamp, end timestamp")

    got = sorted((r.id, r.rid) for r in
                 range_join(left, right, "k", "ts", "start", "end",
                            bucket_secs=bucket_secs).collect())
    expected = sorted(
        (i, j)
        for i, (k, m) in enumerate(lefts)
        for j, (rk, rm, _) in enumerate(rights)
        if k == rk and rm <= m <= rm + 30)
    assert got == expected


@given(st.lists(st.tuples(st.integers(0, 2), st.integers(-50, 50)),
                min_size=1, max_size=40),
       st.integers(2, 16))
@settings(**_PROP)
def test_salted_agg_matches_plain(spark, rows, buckets):
    df = spark.createDataFrame([(f"g{g}", v) for g, v in rows],
                               "g string, v long")
    got = {r.g: (r.s, r.n) for r in salted_aggregate(
        df, "g", {"s": ("sum", "v"), "n": ("count", "v")},
        buckets=buckets, salt_from="v").collect()}
    expected = {}
    for g, v in rows:
        s, n = expected.get(f"g{g}", (0, 0))
        expected[f"g{g}"] = (s + v, n + 1)
    assert got == expected


# --- text shingling (let-bound HOF rewrite) vs Python reference -----------

texts = st.lists(
    st.text(alphabet="ab X", min_size=0, max_size=40),
    min_size=1, max_size=20)


@given(texts, st.integers(1, 4))
@settings(**_PROP)
def test_shingles_match_python_reference(spark, docs, n):
    from openedx_event_sink_clickhouse_spark.functions.text import (
        distinct_shingles, words)
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string")
    got = {r.doc_id: r.s for r in
           df.select("doc_id",
                     distinct_shingles(F.col("text"), n).alias("s")).collect()}

    for i, t in enumerate(docs):
        ws = t.lower().split(" ")  # Spark split semantics: '' -> ['']
        grams = [" ".join(ws[j:j + n]) for j in range(len(ws) - n + 1)] \
            if len(ws) >= n else []
        expect = list(dict.fromkeys(grams))  # array_distinct keeps order
        assert got[i] == expect, (t, n, got[i], expect)


# --- fused MinHash signature vs Python reference --------------------------

@given(st.lists(st.lists(st.text(alphabet="abc", min_size=1, max_size=6),
                         min_size=0, max_size=15),
                min_size=1, max_size=8))
@settings(**_PROP)
def test_minhash_signature_matches_python_reference(spark, shingle_sets):
    import hashlib
    import pyspark.sql.functions as F
    from openedx_event_sink_clickhouse_spark.operators.dedup import (
        MERSENNE31, MINHASH_PARAMS, minhash_signature, shingle_hashes)

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(shingle_sets)],
        "id long, shingles array<string>")
    got = {r.id: r.sig for r in
           df.select("id", minhash_signature(
               shingle_hashes(F.col("shingles"))).alias("sig")).collect()}

    for i, shingles in enumerate(shingle_sets):
        hs = [int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
              for s in shingles]
        expect = [min(((h * a + b) % MERSENNE31 for h in hs), default=None)
                  for a, b in MINHASH_PARAMS]
        assert got[i] == expect, (shingles, got[i], expect)


pack_docs = st.lists(st.integers(1, 40),   # token count per doc
                     min_size=1, max_size=25)


@given(pack_docs, st.integers(8, 64))
@settings(**_PROP)
def test_pack_sequences_invariants(spark, token_counts, budget):
    from openedx_event_sink_clickhouse_spark.operators.curation import (
        pack_sequences,
    )
    rows = [(i, " ".join(["w"] * n), "en", "s")
            for i, n in enumerate(token_counts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    out = sorted(pack_sequences(df, token_budget=budget).collect(),
                 key=lambda r: r.doc_id)
    # token counts survive; start offsets are the running sum; bin ids are
    # the greedy floor(start/budget) and therefore non-decreasing.
    assert [r.n_tokens for r in out] == token_counts
    start = 0
    prev_bin = 0
    for r in out:
        assert r.bin_id == start // budget
        assert r.bin_offset == start % budget
        assert r.bin_id >= prev_bin
        prev_bin = r.bin_id
        start += r.n_tokens


edge_lists = st.lists(
    st.tuples(st.integers(0, 19), st.integers(0, 19)),
    min_size=1, max_size=60).map(
        lambda es: sorted({(min(a, b), max(a, b)) for a, b in es if a != b}))


@given(edge_lists)
@settings(**_PROP)
def test_triangle_counts_match_bruteforce(spark, edges):
    from openedx_event_sink_clickhouse_spark.operators.graph import (
        triangle_counts)
    if not edges:
        return
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.id: (r.degree, r.triangles)
           for r in triangle_counts(df).collect()}
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    for v in adj:
        nbrs = sorted(adj[v])
        t = sum(1 for i, x in enumerate(nbrs) for y in nbrs[i + 1:]
                if y in adj[x])
        want[v] = (len(nbrs), t)
    assert got == want


directed_edges = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)),
    min_size=0, max_size=40).map(
        lambda es: sorted({(a, b) for a, b in es if a != b}))


@given(directed_edges, st.sets(st.integers(0, 14), min_size=1, max_size=3),
       st.integers(1, 4))
@settings(**_PROP)
def test_seed_distances_match_bfs(spark, edges, seeds, hops):
    from openedx_event_sink_clickhouse_spark.operators.graph import (
        seed_distances)
    e = spark.createDataFrame(edges or [(-1, -2)], "src long, dst long")
    sd = spark.createDataFrame([(s,) for s in sorted(seeds)], "id long")
    got = {r.id: r.hops
           for r in seed_distances(e, sd, max_hops=hops).collect()}
    out: dict = {}
    for a, b in edges:
        out.setdefault(a, []).append(b)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, hops + 1):
        frontier = {t for s in frontier for t in out.get(s, [])
                    if t not in dist}
        for t in frontier:
            dist[t] = h
    assert got == dist


doc_words = st.lists(
    st.sampled_from(["a", "bb", "ccc", "d", "ee", "fff", "g"]),
    min_size=0, max_size=40)


@given(st.lists(doc_words, min_size=1, max_size=6),
       st.integers(1, 3))
@settings(**_PROP)
def test_gram_run_stats_matches_bruteforce(spark, docs_words, n):
    # The sorted-run fold's (dupchars, bestc, bestg) vs a dict-count
    # reference on arbitrary word sequences, including empty docs and
    # docs shorter than n.
    from collections import Counter

    from pyspark.sql import functions as F

    from openedx_event_sink_clickhouse_spark.functions.text import (
        gram_run_stats, ngrams)

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs_words)],
        "doc_id long, text string")
    w = F.split(F.lower(F.col("text")), " ")
    got = {r.doc_id: r.s for r in df.select(
        "doc_id", gram_run_stats(ngrams(w, n)).alias("s")).collect()}
    for i, ws in enumerate(docs_words):
        # note: split('') == [''] — mirror exactly
        toks = " ".join(ws).split(" ")
        grams = [" ".join(toks[j:j + n])
                 for j in range(len(toks) - n + 1)] if len(toks) >= n else []
        cnt = Counter(grams)
        dupchars = sum(c * len(g) for g, c in cnt.items() if c > 1)
        if cnt:
            bestc = max(cnt.values())
            bestg = min(g for g, c in cnt.items() if c == bestc)
        else:
            bestc, bestg = 0, ""
        s = got[i]
        assert (s["dupchars"], s["bestc"], s["bestg"]) == \
            (dupchars, bestc, bestg), (i, toks, dict(cnt))


iv_rows = st.lists(
    st.tuples(st.integers(0, 2),             # key
              st.integers(0, 400),           # start minute
              st.integers(1, 120)),          # duration minutes
    min_size=1, max_size=25)


@given(iv_rows)
@settings(**_PROP)
def test_interval_union_matches_bruteforce_merge(spark, rows):
    from openedx_event_sink_clickhouse_spark.operators.intervals import (
        interval_union)
    df = spark.createDataFrame(
        [(f"k{k}", _dt(s), _dt(s + d)) for k, s, d in rows],
        "key string, start_ts timestamp, end_ts timestamp")
    got = {r.key: r for r in interval_union(df, "key").collect()}

    # brute-force: sort, sweep, merge on touch-or-overlap
    by_key: dict = {}
    for k, s, d in rows:
        by_key.setdefault(f"k{k}", []).append((s, s + d))
    for k, ivs in by_key.items():
        ivs.sort()
        islands = []
        for s, e in ivs:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        covered = sum(e - s for s, e in islands) * 60.0  # minutes -> sec
        r = got[k]
        assert r.n_intervals == len(ivs)
        assert r.n_islands == len(islands), (k, ivs, islands)
        assert r.covered_seconds == covered
