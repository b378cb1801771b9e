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
WINDOW_EXEMPT: dict[str, str] = {
    # xxhash64 production-hash variant; semantics fully driver-verified by
    # simhash_neardup_pairs (portable md5 fingerprints + exhaustive-Hamming
    # oracle).  A window slot here can only ever record no_oracle (r3
    # verdict, "What's wrong" #3).
    "simhash_candidates": "subsumed by oracle-checked simhash_neardup_pairs",
}

_WINDOW_PRIORITY: list[str] = [
    # --- r8 window (derived by scripts/window_rotation.py from the
    # CORRECTNESS history; the r7 verdict's top ask).  Rotation state:
    # r7 swept 50/50 green, leaving 17 late-r7 registrations with NO
    # driver row (they were window-exempt because the r7 slots were
    # exactly full).  This window: (1) heads with all 17 never-verified
    # late-r7 queries — residual IVFADC, DQ report, incremental MV fold,
    # CSV/JSON/ORC roundtrip, the streaming quality gate + the three
    # streaming sketch folds, WAV/Y4M codecs, bucketed co-located join,
    # Hampel outliers, AMS F2, grouped HLL, ANALYZE stats, PassJoin
    # editdist, PMI collocations; (2) re-verifies queries whose
    # implementation changed this round (HLL exact shift-based register
    # math, PQ fit/encode checkpointing); (3) fills the remaining slots
    # with the oldest-evidence (r5) rotations, name-ascending.
    # ---------------------------------------------------------------
    # (1) never driver-verified (late-r7 registrations, exemptions lifted)
    "ivf_pq_residual_rescored_topk",
    "dq_check_report",
    "incremental_mv_refresh_accounting",
    "text_format_roundtrip_counts",
    "streaming_quality_gate_accounting",
    "multimodal_wav_roundtrip_stats",
    "multimodal_y4m_roundtrip_stats",
    "bucketed_colocated_join_revenue",
    "mad_event_outliers",
    "streaming_hll_cardinality",
    "ams_f2_bigram_estimate",
    "streaming_heavy_hitter_bigrams",
    "streaming_kll_doclen_quantiles",
    "hll_grouped_distinct_estimates",
    "analyze_orders_stats",
    "editdist_neardup_counts",
    "pmi_collocations_topk",
    # (2) implementation changed this round -> re-verify
    "hll_distinct_estimates",
    "hll_overlap_estimates",
    "pq_adc_topk",
    "pq_rescored_topk",
    "ivf_pq_rescored_topk",
    # (3) oldest-evidence rotations (newest green row is r5), name-asc
    "all_party_names_union",
    "array_functions",
    "bm25_postings_topk",
    "bm25_topk",
    "ccnet_perplexity_buckets",
    "customers_with_orders",
    "doc_community_labels",
    "event_funnel_times",
    "full_outer_nation_balance",
    "hourly_gap_report",
    "kmeans_cluster_stats",
    "late_shipments",
    "leakage_safe_split_counts",
    "market_segment_rollup",
    "monthly_revenue_running",
    "nations_with_customers_and_suppliers",
    "nations_without_rich_suppliers",
    "pagerank_top_sources",
    "part_copurchase_triangles",
    "parts_never_ordered",
    "segment_count_distinct",
    "snapshot_upsert_accounting",
    "streaming_progress_rollup",
    "streaming_tumbling_counts",
    "streaming_upsert_accounting",
    "tfidf_doc_keywords",
    "top_orders_per_customer",
    "tpch_q10_returned_items",
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
    )

    ordered = {n: QUERIES[n] for n in _WINDOW_PRIORITY if n in QUERIES}
    ordered.update((n, f) for n, f in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)
    o_ordered = {n: ORACLES[n] for n in ordered if n in ORACLES}
    ORACLES.clear()
    ORACLES.update(o_ordered)
