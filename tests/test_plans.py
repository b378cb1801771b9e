"""Plan-shape assertions: the properties that make queries survive a 100×
scale-up (pushdown, broadcast, top-k without global sort, no cartesian
products, codegen coverage)."""

from __future__ import annotations

import fs2_kinesis_firehose_spark.queries as q
from fs2_kinesis_firehose_spark.plans import assert_plan_contains, assert_plan_lacks, explain_str

q.load_all()


def test_flagship_pushes_filter_and_broadcasts_dims(spark, sf_smoke):
    df = q.QUERIES["revenue_by_nation"](spark, sf_smoke)
    plan = assert_plan_contains(df, "BroadcastHashJoin", "PushedFilters")
    # the shipdate range predicate must reach the lineitem parquet scan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400], plan
    assert_plan_lacks(df, "CartesianProduct")


def test_topk_uses_take_ordered_not_global_sort(spark, sf_smoke):
    assert_plan_contains(q.QUERIES["global_top10_orders"](spark, sf_smoke), "TakeOrderedAndProject")
    assert_plan_contains(
        q.QUERIES["cosine_topk_bruteforce"](spark, sf_smoke), "TakeOrderedAndProject"
    )


def test_pricing_summary_partial_aggregation(spark, sf_smoke):
    df = q.QUERIES["pricing_summary"](spark, sf_smoke)
    plan = explain_str(df)
    # map-side partial + final aggregate (two HashAggregate operators)
    assert plan.count("HashAggregate") >= 2, plan
    # whole-stage codegen present (codegen mode shows the compiled subtrees;
    # AQE's non-final simple plan has no stage markers before execution)
    assert "WholeStageCodegen" in explain_str(df, mode="codegen")


def test_anti_and_semi_joins(spark, sf_smoke):
    assert_plan_contains(q.QUERIES["parts_never_ordered"](spark, sf_smoke), "LeftAnti")
    assert_plan_contains(q.QUERIES["customers_with_orders"](spark, sf_smoke), "LeftSemi")


def test_column_pruning_reaches_scan(spark, sf_smoke):
    plan = explain_str(q.QUERIES["segment_count_distinct"](spark, sf_smoke))
    # the orders scan must not read untouched wide columns
    scan_section = plan[plan.find("orders.parquet") :][:800]
    assert "o_totalprice" not in scan_section, plan


def test_minhash_lsh_no_cartesian(spark, sf_smoke):
    assert_plan_lacks(
        q.QUERIES["minhash_lsh_pairs"](spark, sf_smoke), "CartesianProduct"
    )


def test_stream_static_join_broadcasts_dim(spark, sf_smoke):
    from pyspark.sql import functions as F

    from fs2_kinesis_firehose_spark.streaming.replay import replay_parquet
    from fs2_kinesis_firehose_spark.tables import load_table

    stream = replay_parquet(spark, sf_smoke, "events")
    nation = load_table(spark, sf_smoke, "nation")
    joined = stream.join(F.broadcast(nation), stream.user_id % 25 == nation.n_nationkey)
    assert "BroadcastHashJoin" in explain_str(joined, mode="simple")


def test_interval_join_pushes_filter_no_bnlj(spark, sf_smoke):
    df = q.QUERIES["interval_join_incident_counts"](spark, sf_smoke)
    plan = assert_plan_contains(df, "PushedFilters")
    # the incident threshold must reach the intervals-side parquet scan
    assert "GreaterThanOrEqual(value,250.0)" in plan, plan
    assert_plan_lacks(df, "BroadcastNestedLoopJoin")
    assert_plan_lacks(df, "CartesianProduct")


def test_stratified_sample_prunes_columns(spark, sf_smoke):
    plan = explain_str(q.QUERIES["stratified_sample_docs"](spark, sf_smoke))
    scan_section = plan[plan.find("documents.parquet") :][:600]
    assert "text" not in scan_section, plan  # only doc_id+lang read


def test_gemm_neardup_single_shuffle_no_bnlj(spark, sf_smoke):
    df = q.QUERIES["embedding_neardup_blocked"](spark, sf_smoke)
    assert_plan_lacks(df, "BroadcastNestedLoopJoin")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan  # one group shuffle


def test_tpch_q6_predicates_reach_scan(spark, sf_smoke):
    df = q.QUERIES["tpch_q6_forecast_revenue"](spark, sf_smoke)
    plan = assert_plan_contains(df, "PushedFilters")
    pushed = plan.split("PushedFilters")[1][:400]
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed, plan


def test_tpch_q19_bracket_join_no_cartesian(spark, sf_smoke):
    df = q.QUERIES["tpch_q19_discounted_revenue"](spark, sf_smoke)
    assert_plan_lacks(df, "CartesianProduct")
    assert_plan_lacks(df, "BroadcastNestedLoopJoin")
    assert_plan_contains(df, "BroadcastHashJoin")  # keyed on partkey, brackets residual


def test_tpch_q7_broadcasts_all_dims_pushes_shipdate(spark, sf_smoke):
    df = q.QUERIES["tpch_q7_volume_shipping"](spark, sf_smoke)
    plan = assert_plan_contains(df, "PushedFilters")
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400], plan
    # supplier, customer, nation x2 all broadcast; lineitem x orders is the
    # only non-broadcast join
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert_plan_lacks(df, "CartesianProduct")


def test_lm_scoring_broadcasts_model_tables(spark, sf_smoke):
    df = q.QUERIES["lm_perplexity_scores"](spark, sf_smoke)
    plan = explain_str(df)
    # bigram + unigram + vocab joins all broadcast — the corpus is never
    # shuffled for the LM lookup
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert_plan_lacks(df, "CartesianProduct")
    # no Python in the plan: scoring is pure codegen + broadcast joins
    assert "Python" not in plan, plan


def test_span_dedup_two_inherent_shuffles_no_python(spark, sf_smoke):
    df = q.QUERIES["span_dedup_stats"](spark, sf_smoke)
    plan = explain_str(df)
    assert "Python" not in plan, plan
    executed = df._jdf.queryExecution().executedPlan().toString()
    # one shuffle on span_text (first-occurrence window), one back on doc_id
    # (reassembly + left join); nothing else
    assert executed.count("Exchange hashpartitioning") <= 3, executed


def test_ann_recall_broadcasts_query_set(spark, sf_smoke):
    df = q.QUERIES["ann_recall_at_k"](spark, sf_smoke)
    plan = explain_str(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert_plan_lacks(df, "CartesianProduct")


def test_chunking_is_pure_narrow_maps(spark, sf_smoke):
    """doc_chunk_stats must have ZERO shuffles — split/sequence/transform/
    posexplode are all narrow; parallelism comes from file splits."""
    df = q.QUERIES["doc_chunk_stats"](spark, sf_smoke)
    plan = explain_str(df)
    assert "Exchange" not in plan, plan


def test_semdedup_single_shuffle_gemm_stage(spark, sf_smoke):
    """semantic_pairs: one Exchange (groupBy cell) feeding the Arrow GEMM
    stage; never a join (no pair-wise expression eval), never a cartesian."""
    import numpy as np

    from fs2_kinesis_firehose_spark.operators import similarity as S
    from fs2_kinesis_firehose_spark.operators.semdedup import semantic_pairs
    from fs2_kinesis_firehose_spark.tables import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    cents = S.seeded_centroids(64, 16, seed=7, scale=0.125)
    import re

    plan = explain_str(semantic_pairs(emb, cents, threshold=0.4))
    # formatted mode lists each operator twice (tree + detail) — count the
    # numbered detail entries
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1, plan
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "Join" not in plan, plan


def test_gopher_repetition_grams_stay_codegen(spark, sf_smoke):
    """The 9-n gram build must be window lead + concat_ws — no higher-order
    transform/slice (interpreted, allocation-per-gram) in the plan."""
    df = q.QUERIES["gopher_repetition_flags"](spark, sf_smoke)
    plan = explain_str(df)
    assert "concat_ws" in plan, plan
    assert "transform(" not in plan, plan
    # gram construction shuffles key on the doc id only
    assert "CartesianProduct" not in plan, plan


# queries whose construction itself runs jobs (streaming engines, eager
# produce, connected-components fixpoints, driver-side trainers) — their
# plan shapes are pinned individually; the blanket scan skips them to keep
# this test analysis-only
_EAGER_OR_STREAMING = {
    "streaming_tumbling_counts", "streaming_sliding_stats",
    "streaming_session_counts", "streaming_dedup_counts",
    "streaming_static_join_revenue", "streaming_stream_stream_join",
    "streaming_stateful_user_stats", "streaming_incremental_neardup",
    "kinesis_roundtrip_counts", "firehose_delivery_accounting",
    "near_dedup_survivors", "near_dedup_cluster_sizes",
    "semantic_dedup_survivors", "curation_funnel_counts",
    "bpe_learned_token_counts", "ngram_jaccard_filtered",
    "stratified_sample_docs", "ivf_topk", "ann_lsh_topk", "ann_recall_at_k",
}


def test_no_cartesian_product_catalog_wide(spark, sf_smoke):
    """No registered query may plan a CartesianProduct — a cross product
    that isn't a deliberate one-row-scalar broadcast is always a bug at
    scale.  (Scalar crossJoins compile to BroadcastNestedLoopJoin with a
    1-row build side, which this scan permits.)"""
    offenders = []
    for name, fn in q.QUERIES.items():
        if name in _EAGER_OR_STREAMING:
            continue
        plan = explain_str(fn(spark, sf_smoke))
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, f"CartesianProduct in: {offenders}"


def test_heavy_hitters_sketch_plan(spark, sf_smoke):
    """Misra–Gries pipeline: sketch pass is MapInPandas; candidate recount
    joins broadcast (never a shuffled corpus-side join on candidates)."""
    plan = explain_str(q.QUERIES["heavy_hitter_bigrams"](spark, sf_smoke))
    assert "MapInPandas" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_rrf_rankers_use_take_ordered(spark, sf_smoke):
    """Both RRF rankers must truncate via TakeOrderedAndProject (per-
    partition heaps), not a global Sort+Limit."""
    plan = explain_str(q.QUERIES["hybrid_rrf_topk"](spark, sf_smoke))
    assert "TakeOrderedAndProject" in plan


def test_snapshot_upsert_is_single_full_outer_join(spark, sf_smoke):
    """The MERGE apply must be ONE full-outer join on the key — never a
    per-cohort join cascade or a cartesian shape."""
    plan = explain_str(q.QUERIES["snapshot_upsert_accounting"](spark, sf_smoke))
    # formatted mode prints each join once in the tree and once in the
    # detail block — one physical FullOuter join == one "Join type:" line
    assert plan.count("Join type: FullOuter") == 1
    assert "CartesianProduct" not in plan


def test_q18_bloom_prefilter_drops_fact_rows_scan_side(spark, sf_smoke):
    """The Bloom membership pass (ArrowEvalPython) must sit directly over
    the lineitem fact scan — rows drop BEFORE the first exchange, which is
    the entire point of a runtime filter."""
    plan = explain_str(
        q.QUERIES["tpch_q18_bloom_prefilter"](spark, sf_smoke), mode="simple"
    )
    lines = plan.splitlines()
    hit = False
    for i, line in enumerate(lines):
        if "FileScan parquet" in line and "lineitem" in line:
            above = "\n".join(lines[max(0, i - 5) : i])
            if "ArrowEvalPython" in above:
                # membership filter is scan-adjacent; the exchange is above it
                hit = True
    assert hit, plan
    assert "CartesianProduct" not in plan


def test_tpch_q12_pushes_shipdate_single_fact_shuffle(spark, sf_smoke):
    df = q.QUERIES["tpch_q12_shipmode_priority"](spark, sf_smoke)
    plan = assert_plan_contains(df, "PushedFilters")
    # the 1996 shipdate bracket must reach the lineitem scan
    lineitem_scan = plan[plan.find("lineitem.parquet") :][:900]
    assert "l_shipdate" in lineitem_scan, plan
    assert_plan_lacks(df, "CartesianProduct")


def test_tpch_q21_takeordered_no_cartesian(spark, sf_smoke):
    df = q.QUERIES["tpch_q21_suppliers_kept_waiting"](spark, sf_smoke)
    # top-100 via TakeOrdered, never a global Sort+Limit
    plan = assert_plan_contains(df, "TakeOrderedAndProject", "BroadcastHashJoin")
    assert_plan_lacks(df, "CartesianProduct")
    # the o_orderstatus='F' filter must reach the orders scan
    orders_scan = plan[plan.find("orders.parquet") :][:900]
    assert "o_orderstatus" in orders_scan, plan


def test_hll_partial_aggregation_and_pruned_scan(spark, sf_smoke):
    from fs2_kinesis_firehose_spark.operators.hll import hll_table
    from fs2_kinesis_firehose_spark.tables import load_table

    df = hll_table(load_table(spark, sf_smoke, "orders"), "o_custkey")
    plan = explain_str(df)
    # map-side partial max + final max: register partials shuffle, not rows
    assert plan.count("HashAggregate") >= 2, plan
    # column pruning: the register build must only read o_custkey
    scan_section = plan[plan.find("orders.parquet") :][:800]
    assert "o_totalprice" not in scan_section, plan


def test_classifier_features_and_gradient_stay_codegen(spark, sf_smoke):
    """The training hot path must be pure JVM: features are one explode +
    one dim-way count_if aggregate (partial+final), gradients one aggregate
    over the checkpoint — no Python evaluation anywhere, and the documents
    scan reads only (doc_id, text)."""
    from fs2_kinesis_firehose_spark.operators.classifier import hashed_features
    from fs2_kinesis_firehose_spark.tables import load_table

    feat = hashed_features(
        load_table(spark, sf_smoke, "documents"), "text", "doc_id",
        dim=8, label_min_tokens=40,
    )
    plan = explain_str(feat)
    assert plan.count("HashAggregate") >= 2, plan
    assert_plan_lacks(feat, "BatchEvalPython", "ArrowEvalPython", "CartesianProduct")
    scan_section = plan[plan.find("documents.parquet") :][:800]
    assert "lang" not in scan_section, plan


def test_classifier_eval_ranks_on_histogram_not_rows(spark, sf_smoke):
    """The AUC rank cumsum (single-partition Window) must consume the
    score HISTOGRAM (post-aggregate), never raw rows: a HashAggregate on
    the quantized score sits below the Window in the plan."""
    from fs2_kinesis_firehose_spark.operators.classifier import (
        classifier_eval,
        hashed_features,
    )
    from fs2_kinesis_firehose_spark.tables import load_table

    feat = hashed_features(
        load_table(spark, sf_smoke, "documents"), "text", "doc_id",
        dim=8, label_min_tokens=40,
    )
    df = classifier_eval(feat, [0.1 * (j + 1) for j in range(9)])
    plan = explain_str(df)
    w_pos = plan.find("Window")
    assert w_pos != -1, plan
    assert "HashAggregate" in plan[w_pos:], plan
    assert_plan_lacks(df, "BatchEvalPython", "ArrowEvalPython")


def test_editdist_verify_before_distinct_no_cartesian(spark, sf_smoke):
    """The segment filter must stay an equi-join (no cartesian fallback)
    and the threshold-Levenshtein verify must run BELOW the pair-dedup
    aggregate so the distinct shuffles true-pair multiplicity, not the
    full candidate volume."""
    df = q.QUERIES["editdist_neardup_counts"](spark, sf_smoke)
    plan = explain_str(df)
    assert "levenshtein" in plan, plan
    assert_plan_lacks(df, "CartesianProduct")
    # boundary mode has no short-string fallback bucket; the ONLY permitted
    # nested-loop join is the check_keys guard (editdist.py) — a broadcast
    # cross join whose build side is a single-row key-uniqueness aggregate.
    # The segment join itself must stay an equi-join.
    import re

    bnlj_ops = re.findall(r"^\(\d+\) BroadcastNestedLoopJoin", plan, re.M)
    assert len(bnlj_ops) <= 1, plan
    if bnlj_ops:
        bnlj = plan.find("BroadcastNestedLoopJoin")
        assert "_keys_ok" in plan[bnlj:], (
            "the sole BNLJ must be the 1-row check_keys guard:\n" + plan
        )
    # top-down formatted plan: the verify Filter is a descendant of the
    # dedup HashAggregate, so it prints after the FIRST aggregate block
    assert plan.find("levenshtein") > plan.find("HashAggregate"), plan


def test_pmi_takeordered_and_partial_counts(spark, sf_smoke):
    df = q.QUERIES["pmi_collocations_topk"](spark, sf_smoke)
    plan = assert_plan_contains(df, "TakeOrderedAndProject")
    assert_plan_lacks(df, "CartesianProduct")
    # bigram + unigram counts both partial-aggregated (>= 4 HashAggregates)
    assert plan.count("HashAggregate") >= 4, plan


def test_mad_windows_run_on_histograms_not_rows(spark, sf_smoke):
    """Both median passes must sort per-group DISTINCT-VALUE aggregates,
    never raw rows: every Window's input chain includes a HashAggregate
    (the histogram), and the median join-backs broadcast."""
    df = q.QUERIES["mad_event_outliers"](spark, sf_smoke)
    plan = explain_str(df)
    assert plan.count("Window") >= 2, plan
    assert "BroadcastHashJoin" in plan, plan
    first_window = plan.find("Window")
    assert "HashAggregate" in plan[first_window:], plan


def test_analyze_stats_single_scan_expand_distinct(spark, sf_smoke):
    df = q.QUERIES["analyze_orders_stats"](spark, sf_smoke)
    plan = explain_str(df)
    # one pass over orders; the multi-distinct runs via Expand, map-side
    assert plan.count("orders.parquet") == 1, plan
    assert "Expand" in plan, plan
    assert_plan_lacks(df, "CartesianProduct")


def test_concat_pack_single_exchange_no_python(spark, sf_smoke):
    """concat_chunk_pack is pure window SQL: exactly ONE exchange (the
    shard hash shuffle feeding the prefix-sum sort) and zero Python
    evaluation — the property that distinguishes it from the next-fit
    applyInPandas packer."""
    import re

    df = q.QUERIES["seq_concat_pack_stats"](spark, sf_smoke)
    plan = explain_str(df)
    assert_plan_lacks(df, "BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas")
    assert "Window" in plan, plan
    # shard shuffle + final stats aggregate exchange + orderBy: bounded
    n_ex = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_ex <= 3, plan


def test_token_budget_sample_no_join_single_window(spark, sf_smoke):
    """token_budget_sample is shuffle-on-group + window + filter on the
    kept side; the stats query adds only aggregates and the kept-vs-total
    join on the ≤|groups| rows."""
    df = q.QUERIES["token_budget_sample_stats"](spark, sf_smoke)
    plan = explain_str(df)
    assert "Window" in plan, plan
    assert_plan_lacks(df, "CartesianProduct", "BatchEvalPython", "ArrowEvalPython")


def test_source_overlap_no_cartesian_reuses_hash_partitioning(spark, sf_smoke):
    """The chunk-hash self-join must be an equi-join (never cartesian)
    and Python-free (the chunker is codegen explode)."""
    df = q.QUERIES["source_chunk_overlap_matrix"](spark, sf_smoke)
    assert_plan_lacks(
        df, "CartesianProduct", "BroadcastNestedLoopJoin",
        "BatchEvalPython", "ArrowEvalPython",
    )


def test_zipf_windows_vocab_not_corpus(spark, sf_smoke):
    """The ROW_NUMBER rank runs over the VOCAB aggregate (HashAggregate
    below the Window), never raw token rows, and the final OLS is a
    1-row closed-form aggregate."""
    df = q.QUERIES["zipf_fit_stats"](spark, sf_smoke)
    plan = explain_str(df)
    w = plan.find("Window")
    assert w != -1, plan
    assert "HashAggregate" in plan[w:], plan
    assert_plan_lacks(df, "CartesianProduct", "BatchEvalPython", "ArrowEvalPython")


def test_tpch_q11_single_scan_broadcast_total(spark, sf_smoke):
    """Q11's global-share HAVING must fold the total from the per-part
    aggregate (lazy checkpoint read twice), not re-scan lineitem — the
    plan shows a 1-row broadcast guard join and exactly one parquet-or-
    checkpoint source feeding both sides."""
    df = q.QUERIES["tpch_q11_important_parts"](spark, sf_smoke)
    plan = explain_str(df)
    # the total rides back as a broadcast join (BNLJ cross or BHJ)
    assert "Broadcast" in plan, plan
    assert_plan_lacks(df, "CartesianProduct")


def test_tpch_q16_anti_join_and_distinct_count(spark, sf_smoke):
    df = q.QUERIES["tpch_q16_supplier_part_count"](spark, sf_smoke)
    plan = explain_str(df)
    assert "LeftAnti" in plan, plan
    assert_plan_lacks(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_tpch_q20_semi_join_chain(spark, sf_smoke):
    df = q.QUERIES["tpch_q20_excess_suppliers"](spark, sf_smoke)
    plan = explain_str(df)
    assert plan.count("LeftSemi") >= 2, plan
    assert_plan_lacks(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_snapshot_diff_full_outer_no_broadcast_no_cartesian(spark, sf_smoke):
    # a full-outer join cannot broadcast: the scale-safe plan is ONE
    # co-partitionable sort-merge join on the key
    df = q.QUERIES["snapshot_diff_accounting"](spark, sf_smoke)
    assert_plan_contains(df, "SortMergeJoin", "FullOuter")
    assert_plan_lacks(df, "CartesianProduct", "BroadcastHashJoin")


def test_embedding_evals_broadcast_query_set_no_cartesian(spark, sf_smoke):
    for name in (
        "truncated_dim_recall_at_k",
        "knn_label_accuracy",
        "contrastive_pair_mining",
        "cluster_balanced_sample_counts",
    ):
        df = q.QUERIES[name](spark, sf_smoke)
        assert_plan_lacks(df, "CartesianProduct")


def test_key_skew_report_broadcasts_topn_single_key_shuffle(spark, sf_smoke):
    df = q.QUERIES["join_key_skew_report"](spark, sf_smoke)
    # the top-N side joins the 1-row summary via broadcast, never a shuffle
    # join; TakeOrdered picks the top keys without a global sort
    assert_plan_contains(df, "TakeOrderedAndProject", "BroadcastNestedLoopJoin")
    assert_plan_lacks(df, "CartesianProduct", "SortMergeJoin")


def test_length_bucket_padding_stays_codegen(spark, sf_smoke):
    df = q.QUERIES["length_bucket_padding_stats"](spark, sf_smoke)
    plan = explain_str(df)
    # one scan + partial/final aggregate, no Python, no joins
    assert plan.count("HashAggregate") >= 2, plan
    for op in ("BatchEvalPython", "ArrowEvalPython", "SortMergeJoin"):
        assert op not in plan, plan


def test_scd2_point_in_time_join_is_keyed_not_bnlj(spark, sf_smoke):
    # the interval predicate must ride as a residual on the KEY equi-join;
    # a BroadcastNestedLoopJoin/CartesianProduct here would explode at scale
    df = q.QUERIES["scd2_point_in_time_revenue"](spark, sf_smoke)
    plan = explain_str(df)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert_plan_lacks(df, "CartesianProduct", "BroadcastNestedLoopJoin")


def test_mv_retraction_fold_no_raw_rescan_shape(spark, sf_smoke):
    # the fold joins two AGGREGATE-sized relations; the plan must show the
    # full-outer fold join and no cartesian
    df = q.QUERIES["mv_retraction_refresh_accounting"](spark, sf_smoke)
    assert_plan_contains(df, "FullOuter")
    assert_plan_lacks(df, "CartesianProduct")
