"""Similarity-search semantics: brute force is ground truth; IVF/LSH are
subsets ranked identically; blocking behaves."""

from __future__ import annotations

import math

from openedx_event_sink_clickhouse_spark.operators.similarity import (
    brute_force_topk,
    cosine_neardup_pairs,
    ivf_assign,
    ivf_topk,
    srp_bucket_topk,
    srp_planes,
)
from openedx_event_sink_clickhouse_spark.sources.tables import load_table


def _emb(spark, sf_dir):
    return load_table(spark, "embeddings", sf_dir)


def test_brute_force_topk_is_exact_and_sorted(spark, sf_dir):
    got = brute_force_topk(_emb(spark, sf_dir), probe_id=0, k=10).collect()
    assert len(got) == 10
    sims = [r["cosine_sim"] for r in got]
    assert sims == sorted(sims, reverse=True)
    assert all(-1.0 <= s <= 1.0 for s in sims)
    assert all(r["vec_id"] != 0 for r in got)


def test_ivf_results_are_brute_force_subset_with_same_scores(spark, sf_dir):
    bf = {r["vec_id"]: r["cosine_sim"]
          for r in brute_force_topk(_emb(spark, sf_dir), 0, k=400).collect()}
    ivf = ivf_topk(_emb(spark, sf_dir), 0, k=10).collect()
    assert len(ivf) > 0
    for r in ivf:
        # every IVF hit exists in the exact ranking with the same score
        assert math.isclose(bf[r["vec_id"]], r["cosine_sim"], abs_tol=1e-9)


def test_ivf_assign_centroid_members(spark, sf_dir):
    assigned = ivf_assign(_emb(spark, sf_dir), n_centroids=16)
    rows = assigned.collect()
    assert {r["centroid"] for r in rows} <= set(range(16))
    # a centroid vector belongs to its own cell (cosine with itself = 1)
    own = {r["id"]: r["centroid"] for r in rows if r["id"] < 16}
    assert own == {i: i for i in range(16)}


def test_srp_bucket_results_subset_of_brute_force(spark, sf_dir):
    bf = {r["vec_id"]: r["cosine_sim"]
          for r in brute_force_topk(_emb(spark, sf_dir), 0, k=500).collect()}
    lsh = srp_bucket_topk(_emb(spark, sf_dir), 0, k=10, num_planes=4).collect()
    assert len(lsh) > 0
    for r in lsh:
        assert math.isclose(bf[r["vec_id"]], r["cosine_sim"], abs_tol=1e-9)


def test_srp_planes_deterministic():
    a = srp_planes(4, 8)
    b = srp_planes(4, 8)
    assert a == b
    assert all(-1.0 <= x < 1.0 for row in a for x in row)


def test_neardup_pairs_blocked_by_label(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    labels = {r["vec_id"]: r["label"] for r in emb.collect()}
    pairs = cosine_neardup_pairs(emb, threshold=0.2).collect()
    assert len(pairs) > 0
    for r in pairs:
        assert labels[r["id_a"]] == labels[r["id_b"]]
        assert r["id_a"] < r["id_b"]
        assert r["cosine_sim"] >= 0.2
