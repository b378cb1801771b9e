"""Query catalog for the driver harness (``__spark_entry__.py``).

Every implemented operator from SURVEY.md §2 registers here via the
``@query(name, oracle=...)`` decorator:

- ``QUERIES[name]``  — ``(spark, sf_dir) -> DataFrame`` (idiomatic DataFrame API).
- ``ORACLES[name]``  — equivalent ANSI SQL that DuckDB runs over the same
  parquet tables.  Column names are aliased identically on both sides because
  the driver sorts columns by name before value-hashing.

Queries whose semantics are not SQL-expressible (hash-seeded MinHash, streaming
state machines) register WITHOUT an oracle; the driver then records a weaker
rows-only check and pytest covers semantics against ground truth instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Driver-window priority.
#
# The grading driver verifies only the FIRST 50 registered queries per round.
# Round 2 registered 17 new queries ahead of everything else and silently
# evicted the entire sink/streaming/temporal/TPC-H surface from verification
# (round-2 verdict, top ask).  Registration order is therefore an explicit,
# reviewed artifact: ``_WINDOW_PRIORITY`` lists the window head-first —
# (1) every query that has never had a driver correctness row, (2) queries
# whose implementation changed this round, (3) flagship operators re-verified
# every round.  ``tests/test_driver_window.py`` pins the resulting first-50
# against the checked-in ``driver_window.txt`` and fails if any never-green
# query (not in ``verified_green.json``) falls outside the window — a module
# reorder can no longer silently drop verification coverage.  Queries rotated
# OUT of the window all have a green row in a prior round's CORRECTNESS file
# (see README rotation note).
# ---------------------------------------------------------------------------
# Queries deliberately kept OUTSIDE the driver window even though they have
# no green driver row: each name here must carry a justification.  The window
# test treats these as reviewed exceptions rather than silent evictions.
# EMPTY as of r13: the one historical entry (simhash_candidates, xxhash64
# production-hash variant subsumed by the oracle-checked
# simhash_neardup_pairs) was retired from the registry entirely — the
# operator stays pytest-only (tests/test_dedup.py), per the r12 verdict.
WINDOW_EXEMPT: dict[str, str] = {}

_WINDOW_PRIORITY: list[str] = [
    # --- r13 window (scripts/window_rotation.py --changed snapshot_diff_
    # accounting,mv_retraction_refresh_accounting,domain_cap_sample_counts,
    # cluster_balanced_sample_counts,range_layout_pruning_stats,
    # streaming_dedup_counts; r12 rows folded into verified_green.json —
    # r12 swept 50/50 green).
    # (1) heads with 8 slots: TWO r13 additions (trained char-trigram
    # language-ID with full 5x4 quantized-GD oracle replay; watermark
    # late-data drop accounting via three-phase replay) and SIX whose
    # implementation changed this round (the r12-advisory null-key/
    # action-vocabulary fixes in snapshot_diff, signed_cdc_delta feeding
    # the retraction MV, group_cap_sample feeding both cap-sampling
    # queries, range_write_clustered; plus streaming_dedup_counts upgraded
    # to the watermarked dropDuplicatesWithinWatermark path — r12 verdict
    # ask #6, state-expiry semantics pinned in tests/test_streaming.py).
    # (2) fills the remaining 42 slots with oldest-evidence rotations:
    # all 15 r7-stale names, then 27 of the 42 r8-stale names
    # (name-ascending); the remaining 15 r8 names head the r14 rotation
    # (see PLANS.md "r14 rotation handoff").
    "lang_id_trained_accuracy",
    "streaming_late_data_accounting",
    "snapshot_diff_accounting",
    "mv_retraction_refresh_accounting",
    "domain_cap_sample_counts",
    "cluster_balanced_sample_counts",
    "range_layout_pruning_stats",
    "streaming_dedup_counts",
    "pandas_udaf_geomean",
    "pii_redaction_stats",
    "quality_scores",
    "returnflag_cube",
    "revenue_by_nation",
    "scd2_version_accounting",
    "source_mixture_counts",
    "stratified_sample_docs",
    "temperature_mixing_counts",
    "token_stats",
    "tpch_q12_shipmode_priority",
    "tpch_q21_suppliers_kept_waiting",
    "train_val_test_counts",
    "udtf_bigram_counts",
    "zorder_pruning_stats",
    "all_party_names_union",
    "ams_f2_bigram_estimate",
    "analyze_orders_stats",
    "array_functions",
    "bm25_postings_topk",
    "bm25_topk",
    "bucketed_colocated_join_revenue",
    "ccnet_perplexity_buckets",
    "customers_with_orders",
    "doc_community_labels",
    "dq_check_report",
    "event_funnel_times",
    "full_outer_nation_balance",
    "hll_distinct_estimates",
    "hll_grouped_distinct_estimates",
    "hll_overlap_estimates",
    "hourly_gap_report",
    "kmeans_cluster_stats",
    "late_shipments",
    "leakage_safe_split_counts",
    "mad_event_outliers",
    "market_segment_rollup",
    "monthly_revenue_running",
    "multimodal_wav_roundtrip_stats",
    "multimodal_y4m_roundtrip_stats",
    "nations_with_customers_and_suppliers",
    "nations_without_rich_suppliers",
]


def load_all() -> None:
    """Import every module that registers queries, then apply the explicit
    driver-window ordering (idempotent)."""
    from fs2_kinesis_firehose_spark.queries import (  # noqa: F401
        cluster_q,
        curation_q,
        dq_q,
        format_q,
        graph_q,
        layout_q,
        llm,
        relational,
        retrieval_q,
        robust_q,
        sinkq,
        sketch_q,
        stats_q,
        streaming_q,
        stringsim_q,
        temporal_q,
        tpch_q,
        upsert_q,
        url_q,
    )

    ordered = {n: QUERIES[n] for n in _WINDOW_PRIORITY if n in QUERIES}
    ordered.update((n, f) for n, f in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)
    o_ordered = {n: ORACLES[n] for n in ordered if n in ORACLES}
    ORACLES.clear()
    ORACLES.update(o_ordered)
