"""SemDeDup (operators/semdedup.py) on a hand-built embedding space.

Centroids are passed explicitly so cluster membership is known by
construction; the corpus-scale pipeline is oracle-checked via the
semantic_dedup_survivors registry entry.
"""

from __future__ import annotations

import numpy as np
import pytest

from fs2_kinesis_firehose_spark.operators.semdedup import semantic_dedup, semantic_pairs

# two well-separated cells on the x-axis
CENTS = np.array([[10.0, 0.0], [-10.0, 0.0]])


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], "vec_id int, embedding array<float>"
    )


def test_within_cell_duplicates_collapse_to_min_key(spark):
    rows = [
        (0, (9.0, 1.0)),   # cell 0
        (1, (9.0, 1.0)),   # exact dup of 0 -> dropped
        (2, (9.0, -1.0)),  # cell 0, cos vs 0 = 80/82 < 0.99 -> kept
        (3, (-9.0, 1.0)),  # cell 1
        (4, (-9.0, 1.0)),  # exact dup of 3 -> dropped
    ]
    out = semantic_dedup(_df(spark, rows), CENTS, threshold=0.99)
    assert sorted(r["vec_id"] for r in out.collect()) == [0, 2, 3]


def test_cross_cell_duplicates_are_accepted_misses(spark):
    # identical vectors in DIFFERENT cells are never compared (the published
    # SemDeDup trade-off): both survive
    rows = [(0, (9.0, 0.0)), (1, (-9.0, 0.0)), (2, (9.0, 0.0))]
    pairs = semantic_pairs(_df(spark, rows), CENTS, threshold=0.99)
    assert [(p["key1"], p["key2"]) for p in pairs.collect()] == [(0, 2)]
    out = semantic_dedup(_df(spark, rows), CENTS, threshold=0.99)
    assert sorted(r["vec_id"] for r in out.collect()) == [0, 1]


def test_transitive_chain_is_one_component(spark):
    # angles 0, 0.1, 0.2 rad in cell 0: cos(0.1)=0.995 >= 0.99 links 0-1 and
    # 1-2, cos(0.2)=0.980 < 0.99 leaves no direct 0-2 edge -> one component
    rot = lambda t: (10 * float(np.cos(t)), 10 * float(np.sin(t)))
    rows = [(0, rot(0.0)), (1, rot(0.1)), (2, rot(0.2))]
    out = semantic_dedup(_df(spark, rows), CENTS, threshold=0.99)
    assert sorted(r["vec_id"] for r in out.collect()) == [0]


def test_threshold_one_keeps_near_but_not_exact_dups(spark):
    rows = [(0, (9.0, 1.0)), (1, (9.0, 1.0)), (2, (9.0, 1.1))]
    out = semantic_dedup(_df(spark, rows), CENTS, threshold=1.0)
    assert sorted(r["vec_id"] for r in out.collect()) == [0, 2]


def test_blas_assignment_matches_exact_hof_on_fixture(spark, sf_oracle):
    """ivf_assign_blas (GEMM argmin) must agree cell-for-cell with the
    oracle-exact HOF ivf_assign on the real embeddings fixture — the ulp
    caveat in its docstring must never bite on actual data."""
    from fs2_kinesis_firehose_spark.operators.similarity import (
        ivf_assign,
        ivf_assign_blas,
        seeded_centroids,
    )
    from fs2_kinesis_firehose_spark.tables import load_table

    emb = load_table(spark, sf_oracle, "embeddings")
    cents = seeded_centroids(64, 16, seed=7, scale=0.125)
    exact = {r["vec_id"]: r["ivf_cell"] for r in ivf_assign(emb, cents).collect()}
    blas = {r["vec_id"]: r["ivf_cell"] for r in ivf_assign_blas(emb, cents).collect()}
    assert exact == blas


def test_zero_norm_vectors_never_pair(spark):
    """Cosine is undefined for zero vectors: exact-duplicate zero embeddings
    both survive (documented; no NaN warnings either)."""
    rows = [(0, (0.0, 0.0)), (1, (0.0, 0.0)), (2, (9.0, 1.0))]
    out = semantic_dedup(_df(spark, rows), CENTS, threshold=0.5)
    assert sorted(r["vec_id"] for r in out.collect()) == [0, 1, 2]
