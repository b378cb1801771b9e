"""Distributed PCA (operators/pca.py) vs numpy ground truth."""

from __future__ import annotations

import numpy as np
import pytest

from fs2_kinesis_firehose_spark.operators import pca as P


def _df(spark, X, partitions=7):
    return spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    ).repartition(partitions)


def test_fit_matches_numpy(spark):
    rng = np.random.default_rng(3)
    X = rng.normal(0, 1, (400, 6)) @ np.diag([5, 3, 2, 1, 0.5, 0.1])
    m = P.pca_fit(_df(spark, X), k=3)
    cov = np.cov(X, rowvar=False, bias=True)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1][:3]
    assert np.allclose(m["eigenvalues"], evals, rtol=1e-9)
    assert np.isclose(m["total_variance"], np.trace(cov))
    assert m["n"] == 400
    # orthonormal rows
    q = m["components"]
    assert np.allclose(q @ q.T, np.eye(3), atol=1e-10)
    # variance captured by projections equals the eigenvalues
    Z = (X - X.mean(axis=0)) @ q.T
    assert np.allclose(Z.var(axis=0), m["eigenvalues"], rtol=1e-9)


def test_fit_stable_far_from_origin(spark):
    # catastrophic-cancellation regression: a huge mean offset with tiny
    # variance destroys the single-pass E[xxT] − μμT form (relative error
    # ~‖μ‖²·eps/σ² ≈ 1e12·1e-16/1e-4 = 1e0); the centered Chan-merge
    # accumulation must still match numpy to tight relative tolerance
    rng = np.random.default_rng(17)
    X = rng.normal(0, 1e-2, (300, 4)) @ np.diag([3, 2, 1, 0.5]) + 1e6
    m = P.pca_fit(_df(spark, X), k=2)
    cov = np.cov(X, rowvar=False, bias=True)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1][:2]
    assert np.allclose(m["eigenvalues"], evals, rtol=1e-6)
    assert np.isclose(m["total_variance"], np.trace(cov), rtol=1e-6)


def test_fit_independent_of_partitioning(spark):
    rng = np.random.default_rng(9)
    X = rng.normal(0, 1, (200, 5))
    a = P.pca_fit(_df(spark, X, partitions=1), k=2)
    b = P.pca_fit(_df(spark, X, partitions=13), k=2)
    assert np.allclose(a["eigenvalues"], b["eigenvalues"])
    assert np.allclose(a["components"], b["components"])


def test_project_pythagoras(spark):
    # explained + residual variance == total variance (orthogonal split)
    rng = np.random.default_rng(17)
    X = rng.normal(0, 2, (300, 6))
    df = _df(spark, X)
    m = P.pca_fit(df, k=2)
    rows = P.pca_project(df, m, round_to=None).collect()
    Z = np.vstack([r["pca"] for r in rows])
    explained = Z.var(axis=0, ddof=0).sum()
    assert np.isclose(explained, m["eigenvalues"].sum(), rtol=1e-9)
    assert explained <= m["total_variance"] + 1e-9


def test_validation(spark):
    df = _df(spark, np.eye(3))
    with pytest.raises(ValueError):
        P.pca_fit(df, k=0)
    with pytest.raises(ValueError):
        P.pca_fit(df, k=10)  # k > d
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no vectors"):
        P.pca_fit(empty, k=1)


def test_project_drops_null_vectors(spark):
    X = np.eye(4) * 2
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(4)] + [(9, None)],
        "vec_id long, embedding array<double>",
    )
    m = P.pca_fit(df, k=2)
    rows = P.pca_project(df, m).collect()
    assert {r["vec_id"] for r in rows} == {0, 1, 2, 3}
