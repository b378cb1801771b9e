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
    # --- r6 window.  Rotation state: r5 swept 50/50 green; after it the
    # registry's OLDEST driver evidence is r1/r2 for five scalar-function
    # queries (map/date/math/string/json — missed by earlier rotations) and
    # r3 for the 26 queries named in the README r5 rotation note (the
    # r1/r2-green names map_functions/date_functions/math_functions/
    # string_functions/events_json_extract were RETIRED in the round-3
    # scalar-surface consolidation — they survive only in
    # verified_green.json history, so the r3 set IS the oldest live
    # evidence).  This window: (1) heads with the ELEVEN queries that have
    # never earned a driver row (this round's new operators — multi-tick
    # SCD2, DOULION triangle estimate, KLL quantiles, Q18+Bloom, Count-Min
    # point frequencies, prefix-filter exact similarity join, k-core
    # peeling, cohort retention, personalized PageRank, product-quantized ANN + its exact-rescore path); (2)
    # re-verifies the FIVE whose implementation changed this round
    # (rrf_fuse lazy guard, bloom word-fold, scd2_apply rewrite, pca
    # centered stats, heavy_hitters checkpoint); (3) rotates in ALL 26
    # r3-evidence queries — after this round every registered query's
    # newest green row is r4+; (4) fills the remaining slots with
    # r4-evidence flagships (heavy Tier-C scale paths).
    # ---------------------------------------------------------------
    # (1) never driver-verified: this round's new queries
    "scd2_multi_tick_accounting",
    "approx_triangle_estimate",
    "kll_doclen_quantiles",
    "tpch_q18_bloom_prefilter",
    "count_min_bigram_estimates",
    "prefix_jaccard_pairs",
    "part_copurchase_kcore",
    "cohort_retention_matrix",
    "ppr_seed_sources",
    "pq_adc_topk",
    "pq_rescored_topk",
    # (2) implementation changed this round -> re-verify
    "hybrid_rrf_topk",
    "bloom_semijoin_revenue",
    "scd2_version_accounting",
    "pca_embedding_variance",
    "heavy_hitter_bigrams",
    # (3) r3-evidence queries (the README r5 rotation-note list, complete)
    "ann_recall_at_k",
    "customer_order_left_join",
    "doc_chunk_stats",
    "dsir_importance_weights",
    "event_type_pivot",
    "events_props_functions",
    "firehose_delivery_accounting",
    "hourly_daily_event_rollup",
    "interval_join_incident_counts",
    "lm_perplexity_scores",
    "multimodal_png_roundtrip_stats",
    "nation_balance_unpivot",
    "normalized_dedup_stats",
    "repeated_chunk_stats",
    "salted_join_priority_revenue",
    "scalar_string_date_math",
    "semantic_dedup_survivors",
    "simhash_neardup_pairs",
    "span_dedup_stats",
    "streaming_dedup_counts",
    "streaming_session_counts",
    "streaming_sliding_stats",
    "streaming_stateful_user_stats",
    "streaming_static_join_revenue",
    "streaming_stream_stream_join",
    "user_session_stats",
    # (4) r4-evidence flagships: heavy Tier-C scale paths
    "near_dedup_clusters_distributed",
    "minhash_lsh_pairs",
    "curation_funnel_counts",
    "streaming_incremental_neardup",
    "kinesis_roundtrip_counts",
    "exactly_once_replay_counts",
    "pricing_summary",
    "cosine_topk_bruteforce",
]


def load_all() -> None:
    """Import every module that registers queries, then apply the explicit
    driver-window ordering (idempotent)."""
    from fs2_kinesis_firehose_spark.queries import (  # noqa: F401
        cluster_q,
        curation_q,
        graph_q,
        layout_q,
        llm,
        relational,
        retrieval_q,
        sinkq,
        sketch_q,
        streaming_q,
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
