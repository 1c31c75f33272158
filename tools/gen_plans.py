"""Generate PLANS.md: formatted physical plans for the headline queries
at sf0.001, so plan quality (pushdown, broadcast, partial aggregation,
codegen spans) is auditable without running Spark.

Run: python tools/gen_plans.py > PLANS.md
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SHOW = [
    "flagship_incremental_dump",
    "t1_tree_ordinals",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "sim_neardup_pairs",
    "sim_lsh_bucket_topk",
    "sim_quantized_topk",
    "serialize_user_profile",
    "ret_bm25_topk",
    "cur_decontaminate",
    "asof_last_purchase",
    "skew_salted_agg",
    "tpch_q5",
    "tpch_q21",
    "dedup_duplicate_spans",
    "sim_ivf_recall",
    "dedup_lsh_recall",
    "sim_ivfpq_recall",
    "mm_phash_recall",
    "dedup_semantic_recall",
    "text_unigram_logprob",
    "cur_clean_lines",
    "evt_funnel",
    "evt_cohort_retention",
    "llm_prepare_corpus",
    "llm_release_pipeline",
    "cur_perplexity_filter",
    "cur_shuffle_shards",
    "sim_ivf_incremental",
    "sim_hard_negatives",
    "dedup_incremental",
    "dedup_incremental_neardup",
    "dedup_incremental_clusters",
    "dedup_survivors",
    "ret_bm25_at_rest",
    "scd2_user_event_history",
    "evt_resample_hourly",
    "dedup_remove_spans",
    "mm_phash_neardup",
    "llm_bpe_packing",
    "sim_pq_topk",
    "cur_mix_interleave",
    "scd2_state_as_of",
    "graph_triangle_count",
    "evt_top_paths",
    "cur_weighted_sample",
    "agg_heavy_hitters",
    "evt_attribution",
    "evt_rolling_actives",
    "dq_referential_audit",
    "dq_reconcile_orders",
    "sim_random_projection",
    "agg_heavy_hitters_incremental",
    "join_bloom_prefilter",
    "evt_funnel_windowed",
    "evt_attribution_linear",
    "dq_schema_drift",
    "scd2_incremental_merge",
    "text_repetition_signals",
    "cur_repetition_signals",
    "agg_cms_heavy_hitters",
    "dedup_semantic_survivors",
    "evt_cuped_readout",
    "cur_split_leakage_safe",
    "agg_hll_distinct_rollup",
    "evt_ab_conversion_test",
    "evt_ab_srm_check",
    "agg_histogram_quantiles",
    "agg_grouped_quantiles",
    "sim_ivfpq_topk",
    "cur_zorder_key",
    "ret_phrase_search",
    "evt_markov_transitions",
    "evt_sequential_monitoring",
    "evt_jackknife_ci",
    "graph_edge_jaccard",
    "graph_kcore",
    "dq_benford_audit",
    "dq_psi_drift",
    "evt_churn_labels",
    "evt_rfm_segments",
    "agg_kmv_distinct",
    "evt_anomaly_mad",
    "evt_funnel_latency",
    "mm_wav_silence_segments",
    "evt_ewma_smoothing",
    "evt_basket_lift",
    "text_bigram_logprob",
    "agg_grouping_sets",
    "unpivot_lineitem_metrics",
    "evt_interval_union",
    "cur_reservoir_per_key",
    "agg_kmv_set_ops",
    "graph_label_propagation",
    "evt_deseasonalized_anomaly",
    "evt_rolling_correlation",
    "evt_cusum_changepoint",
    "agg_gini_concentration",
    "agg_abc_classification",
    "join_incremental_view",
    "join_dynamic_partition_pruning",
    "scd1_apply_changelog",
    "evt_bot_detection",
    "text_feature_hashing",
    "rec_user_items",
    "dedup_allpairs_jaccard",
    "dedup_allpairs_incremental",
    "dedup_survivors_by_quality",
    "sim_embedding_covariance",
    "sim_matryoshka_recall",
    "ret_query_likelihood",
    "agg_moment_profile",
    "evt_ols_readout",
    "evt_did_readout",
    "dq_dp_release",
    "graph_adamic_adar",
]

SF = "/root/testdata/sf0.001"


def main() -> None:
    from openedx_event_sink_clickhouse_spark import registry
    from openedx_event_sink_clickhouse_spark.session import get_spark

    spark = get_spark("plans", master="local[4]",
                      extra_conf={"spark.sql.shuffle.partitions": "4"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    print("# PLANS — headline physical plans (auto-generated)\n")
    print("`.explain('formatted')` at sf0.001, local[4]. What to look for:"
          " `PushedFilters`/`ReadSchema` (pushdown + pruning), "
          "`BroadcastHashJoin` on dims, `partial_*` aggregates before "
          "exchanges, `WholeStageCodegen` spans, single exchanges under "
          "stacked windows. Regenerate: "
          "`python tools/gen_plans.py > PLANS.md`\n")
    for name in SHOW:
        df = qs[name](spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        print(f"## {name}\n\n```\n{plan}```\n")


if __name__ == "__main__":
    main()
