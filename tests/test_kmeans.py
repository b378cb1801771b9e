"""Distributed Lloyd k-means (operators/kmeans.py) vs plain-numpy ground
truth, plus the BLAS≡HOF assignment equivalence the registered query
relies on."""

from __future__ import annotations

import numpy as np
import pytest

from fs2_kinesis_firehose_spark.operators import kmeans as KM
from fs2_kinesis_firehose_spark.tables import load_table


def _reference_lloyd(X, k, iterations, round_to=9):
    """Numpy mirror: first-k init, argmin(|c|²−2vc) with first-min
    tie-break, per-dim means rounded, empty clusters keep their centroid."""
    centroids = X[:k].copy()
    for _ in range(iterations):
        d = np.einsum("ij,ij->i", centroids, centroids)[None, :] - 2.0 * (
            X @ centroids.T
        )
        assign = d.argmin(axis=1)
        for c in range(k):
            members = X[assign == c]
            if len(members):
                centroids[c] = np.round(members.mean(axis=0), round_to)
    return centroids


@pytest.fixture(scope="module")
def emb_df(spark, sf_smoke):
    return load_table(spark, sf_smoke, "embeddings")


def test_centroids_match_numpy_reference(spark):
    rng = np.random.default_rng(11)
    X = rng.normal(0, 1, (200, 6)).astype(np.float32).astype(np.float64)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id bigint, embedding array<float>",
    )
    got = KM.kmeans_lloyd(df, k=4, iterations=3)
    want = _reference_lloyd(X, k=4, iterations=3)
    assert np.allclose(np.asarray(got), want, atol=1e-9)


def test_blas_and_hof_assignments_agree_on_fixture(emb_df):
    cents = KM.kmeans_lloyd(emb_df, k=8, iterations=2)
    hof = {
        r["vec_id"]: r["cluster"]
        for r in KM.assign_clusters(emb_df, cents).select("vec_id", "cluster").collect()
    }
    blas = {
        r["vec_id"]: r["cluster"]
        for r in KM._assign_blas(emb_df, cents, "embedding")
        .select("vec_id", "cluster")
        .collect()
    }
    assert hof == blas


def test_every_cluster_nonempty_and_total_preserved(emb_df):
    cents = KM.kmeans_lloyd(emb_df, k=8, iterations=3)
    counts = (
        KM._assign_blas(emb_df, cents, "embedding").groupBy("cluster").count().collect()
    )
    assert sum(r["count"] for r in counts) == emb_df.count()
    assert all(0 <= r["cluster"] < 8 for r in counts)


def test_validation_errors(emb_df):
    with pytest.raises(ValueError):
        KM.kmeans_lloyd(emb_df, k=0)
    with pytest.raises(ValueError):
        KM.kmeans_lloyd(emb_df, iterations=0)
