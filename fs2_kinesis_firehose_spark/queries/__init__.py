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
    # --- r14 window (scripts/window_rotation.py --changed <the ten
    # PQ-family names>; r13 rows folded into verified_green.json —
    # r13 swept 50/50 green).  An evidence-freshness round per the r13
    # verdict: no new queries, the surface is complete at 159/159.
    # (1) heads with the TEN queries whose fit path changed in r13
    # addendum 3 (fused multi-subspace pq_fit: one corpus pass per
    # iteration instead of m) AFTER their newest driver rows were
    # recorded (r10-r12) — bit-equality with the sequential path is
    # pytest-pinned, but the strongest evidence is a driver row against
    # the shipped code.
    # (2) ONE never-green addition leads: streaming_left_outer_attribution
    # (the r13 verdict's missing #3 — the stream-stream LEFT OUTER join
    # with state-timeout NULL emission, full row-set oracle).
    # (3) THREE r14-changed-output queries (the r13-advisory fixes):
    # the tagged NULL-key encoding permutes group_cap_sample's kept sets,
    # so domain_cap_sample_counts / cluster_balanced_sample_counts now
    # emit different kept_id_sums than their r13 driver rows, and
    # streaming_late_data_accounting's oracle expectation changed — their
    # stale evidence must be re-earned this round.
    # (4) fills the remaining 36 slots with oldest-evidence rotations:
    # all 15 remaining r8-stale names (closing the r8 backlog entirely —
    # after this window every registered query is r10+ fresh), then 21
    # of the r10 block (name-ascending).
    "streaming_left_outer_attribution",
    "pq_adc_topk",
    "pq_adc_bcast_topk",
    "pq_rescored_topk",
    "ivf_pq_rescored_topk",
    "ivf_pq_residual_rescored_topk",
    "ivf_pq_residual_bcast_topk",
    "ivf_pq_persisted_topk",
    "ivf_pq_append_serve_topk",
    "streaming_ann_serving_topk",
    "ivf_topk",
    "domain_cap_sample_counts",
    "cluster_balanced_sample_counts",
    "streaming_late_data_accounting",
    "pagerank_top_sources",
    "parts_never_ordered",
    "pmi_collocations_topk",
    "segment_count_distinct",
    "snapshot_upsert_accounting",
    "streaming_heavy_hitter_bigrams",
    "streaming_hll_cardinality",
    "streaming_kll_doclen_quantiles",
    "streaming_progress_rollup",
    "streaming_quality_gate_accounting",
    "streaming_tumbling_counts",
    "text_format_roundtrip_counts",
    "tfidf_doc_keywords",
    "top_orders_per_customer",
    "tpch_q10_returned_items",
    "ann_recall_at_k",
    "bloom_semijoin_revenue",
    "cohort_retention_matrix",
    "cosine_topk_bruteforce",
    "count_min_bigram_estimates",
    "curation_funnel_counts",
    "customer_order_left_join",
    "doc_chunk_stats",
    "dsir_importance_weights",
    "event_type_pivot",
    "events_props_functions",
    "exactly_once_replay_counts",
    "firehose_delivery_accounting",
    "heavy_hitter_bigrams",
    "hourly_daily_event_rollup",
    "hybrid_rrf_topk",
    "incremental_mv_refresh_accounting",
    "interval_join_incident_counts",
    "kinesis_roundtrip_counts",
    "kll_doclen_quantiles",
    "lm_perplexity_scores",
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
