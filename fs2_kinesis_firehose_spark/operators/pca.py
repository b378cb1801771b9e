"""Distributed PCA over an embedding column.

Dimensionality reduction is the standard pre-step for ANN indexing,
SemDeDup blocking, and embedding visualization.  The classic distributed
construction: the corpus never leaves the cluster — one narrow Arrow pass
accumulates the per-partition sufficient statistics (n, Σx, XᵀX), the
driver folds P statistic blocks (d×d each — metadata, d=64 → 32 KB) into
the covariance matrix and eigendecomposes it (LAPACK ``eigh`` on a d×d
symmetric matrix, microseconds), and projection is one GEMM per Arrow
batch against the broadcast component matrix.

Determinism: ``eigh`` is deterministic for a fixed matrix; component SIGN
is normalized (largest-|loading| coordinate made positive, ties by lowest
index) so projections are reproducible across runs and platforms.

Covariance uses the population convention (divide by n) — stated because
the correctness oracle cross-checks the trace against SQL ``var_pop``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pca_fit", "pca_project"]


def pca_fit(df: DataFrame, k: int, *, vec_col: str = "embedding") -> dict:
    """Fit top-``k`` principal components.  Returns a plain dict:
    ``mean`` (d,), ``components`` (k, d) rows = components,
    ``eigenvalues`` (k,) descending, ``total_variance`` (trace of the
    population covariance), ``n`` (vector count).
    """
    if k < 1:
        raise ValueError("k must be >= 1")

    def partial_stats(batches):
        n = 0
        s = None
        g = None
        for pdf in batches:
            X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += X.shape[0]
            s = X.sum(axis=0) if s is None else s + X.sum(axis=0)
            g = X.T @ X if g is None else g + X.T @ X
        if n == 0:
            return
        yield pd.DataFrame(
            {"n": [n], "s": [s.tobytes()], "g": [g.tobytes()], "d": [s.shape[0]]}
        )

    parts = (
        df.select(vec_col)
        .where(F.col(vec_col).isNotNull())
        .mapInPandas(partial_stats, "n long, s binary, g binary, d int")
        .collect()
    )
    if not parts:
        raise ValueError("pca_fit: no vectors")
    d = parts[0]["d"]
    n = sum(p["n"] for p in parts)
    s = np.zeros(d)
    g = np.zeros((d, d))
    for p in parts:
        s += np.frombuffer(p["s"], dtype=np.float64)
        g += np.frombuffer(p["g"], dtype=np.float64).reshape(d, d)
    if k > d:
        raise ValueError(f"k={k} exceeds dimensionality d={d}")

    mean = s / n
    cov = g / n - np.outer(mean, mean)  # population covariance
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    eigenvalues = evals[order]
    components = evecs[:, order].T  # (k, d)
    # sign normalization: make the largest-|loading| coordinate positive
    for i in range(components.shape[0]):
        j = int(np.argmax(np.abs(components[i])))
        if components[i, j] < 0:
            components[i] = -components[i]
    return {
        "mean": mean,
        "components": components,
        "eigenvalues": eigenvalues,
        "total_variance": float(np.trace(cov)),
        "n": int(n),
    }


def pca_project(
    df: DataFrame,
    model: dict,
    *,
    vec_col: str = "embedding",
    out_col: str = "pca",
    round_to: int | None = 6,
) -> DataFrame:
    """Append ``out_col`` = (x − mean) @ componentsᵀ as array<double> —
    one GEMM per Arrow batch against the broadcast (k×d) component matrix.

    Rows with NULL vectors are DROPPED — the same filter ``pca_fit``
    applies, so fit/project over the same raw table is symmetric (without
    this, a NULL row would crash the Arrow worker mid-GEMM)."""
    mean = np.asarray(model["mean"], dtype=np.float64)
    comps = np.asarray(model["components"], dtype=np.float64)
    df = df.where(F.col(vec_col).isNotNull())

    def project(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            Z = (X - mean) @ comps.T
            if round_to is not None:
                Z = np.round(Z, round_to)
            out = pdf.copy()
            out[out_col] = list(Z)
            yield out

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    return df.mapInPandas(project, f"{fields}, {out_col} array<double>")
