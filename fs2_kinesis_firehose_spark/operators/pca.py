"""Distributed PCA over an embedding column.

Dimensionality reduction is the standard pre-step for ANN indexing,
SemDeDup blocking, and embedding visualization.  The classic distributed
construction: the corpus never leaves the cluster — one narrow Arrow pass
accumulates per-partition CENTERED sufficient statistics
(n, mean, M = Σ(x−mean)(x−mean)ᵀ), merged batch-to-batch and
block-to-block with the pairwise update of Chan, Golub & LeVeque (1979):
``M = M_a + M_b + δδᵀ·n_a·n_b/(n_a+n_b)``, ``δ = mean_b − mean_a``.
Centered accumulation avoids the catastrophic cancellation the single-pass
``E[xxᵀ] − μμᵀ`` form suffers when embeddings sit far from the origin
(variance tiny relative to ‖μ‖²).  The driver folds P statistic blocks
(d×d each — metadata, d=64 → 32 KB) into the covariance matrix and
eigendecomposes it (LAPACK ``eigh`` on a d×d symmetric matrix,
microseconds); projection is one GEMM per Arrow batch against the
broadcast (k×d) component matrix.

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

    def merge(a, b):
        """Chan et al. pairwise merge of (n, mean, M) centered-stat blocks."""
        na, ma, Ma = a
        nb, mb, Mb = b
        tot = na + nb
        delta = mb - ma
        return (
            tot,
            ma + delta * (nb / tot),
            Ma + Mb + np.outer(delta, delta) * (na * nb / tot),
        )

    def partial_stats(batches):
        acc = None
        for pdf in batches:
            X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            if X.shape[0] == 0:
                continue
            bmean = X.mean(axis=0)
            Xc = X - bmean
            block = (X.shape[0], bmean, Xc.T @ Xc)
            acc = block if acc is None else merge(acc, block)
        if acc is None:
            return
        n_p, mean_p, M_p = acc
        yield pd.DataFrame(
            {
                "n": [n_p],
                "mean": [mean_p.tobytes()],
                "m2": [M_p.tobytes()],
                "d": [mean_p.shape[0]],
            }
        )

    parts = (
        df.select(vec_col)
        .where(F.col(vec_col).isNotNull())
        .mapInPandas(partial_stats, "n long, mean binary, m2 binary, d int")
        .collect()
    )
    if not parts:
        raise ValueError("pca_fit: no vectors")
    d = parts[0]["d"]
    acc = None
    for p in parts:
        block = (
            int(p["n"]),
            np.frombuffer(p["mean"], dtype=np.float64).copy(),
            np.frombuffer(p["m2"], dtype=np.float64).reshape(d, d).copy(),
        )
        acc = block if acc is None else merge(acc, block)
    n, mean, M = acc
    if k > d:
        raise ValueError(f"k={k} exceeds dimensionality d={d}")

    cov = M / n  # population covariance (centered stats — no cancellation)
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
