"""SemDeDup — semantic deduplication over an embedding column
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication", public arXiv:2303.09540).

The published recipe: k-means-cluster the embeddings, compare pairs only
WITHIN a cluster, and keep one representative per group of vectors whose
cosine similarity exceeds a threshold.  Cross-cluster near-duplicates are
accepted misses — that is what makes the method scale: candidate generation
is O(Σ cell²) instead of O(n²), identical in shape to the MinHash-LSH
band join (operators/dedup.py:128).

Spark-first composition, with BLAS constants where the repo already proved
them oracle-compatible (`dedup.embedding_neardup_pairs_blocked`):

- cell assignment   → ``similarity.ivf_assign_blas`` — one GEMM per Arrow
  batch; same argmin/tie rule as the oracle-exact HOF form, asserted equal
  on the fixtures;
- within-cell pairs → ONE shuffle on the cell id, one numpy GEMM per cell
  (``applyInPandas``), upper-triangle mask, ROUND(cos, 6) ≥ τ — never a
  per-pair expression eval (a 64-dim codegen'd dot chain pushed into a
  join condition falls back to interpreted and costs ~50 µs/pair; the GEMM
  evaluates ~100× more pairs/sec);
- grouping          → ``dedup.connected_components`` (driver union-find for
  bounded edge sets, alternating star contraction beyond);
- survivor rule     → min key per component (deterministic, the same
  contract as exact/MinHash dedup).

At 100 TB the knobs move, not the plan: more centroids (the paper uses ~100k
so cells stay ~constant-sized — the GEMM task is O(cell²) and cells are the
unit of parallelism), trained instead of seeded centroids
(``similarity.ivf_train_centroids``), and a parquet layout partitioned by
cell so the pair stage is co-located.

Reference parity note: the reference engine has no embedding operators at
all (its unit of work is an opaque byte record, `RecordOps.scala:26`); this
is part of the Tier-C training-data surface SURVEY.md §2 adds on top.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fs2_kinesis_firehose_spark.operators import dedup as D
from fs2_kinesis_firehose_spark.operators.similarity import ivf_assign_blas


def semantic_pairs(
    df: DataFrame,
    centroids: np.ndarray,
    *,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> DataFrame:
    """(key1, key2, cos_sim) for same-cell pairs with ROUND(cos, 6) ≥ τ,
    key1 < key2.  One shuffle (groupBy cell), one GEMM per cell."""
    assigned = ivf_assign_blas(df, centroids, vec_col).select(
        F.col(key_col).alias("_key"), F.col(vec_col).alias("_vec"), "ivf_cell"
    )
    out_schema = f"key1 {D._key_ddl(df, key_col)}, key2 {D._key_ddl(df, key_col)}, cos_sim double"

    def emit(pdf):
        import pandas as pd

        if len(pdf) < 2:
            return pd.DataFrame({"key1": [], "key2": [], "cos_sim": []})
        X = np.stack(pdf["_vec"].to_numpy()).astype(np.float64)
        k = pdf["_key"].to_numpy()
        n = np.sqrt(np.einsum("ij,ij->i", X, X))
        # zero-norm vectors have no direction: their cosine is undefined, so
        # they never pair (matches the oracle, where 0/0 is non-comparable) —
        # map the NaN/inf lanes to -inf instead of spamming divide warnings
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.round((X @ X.T) / np.outer(n, n), 6)
        cos = np.where(np.isfinite(cos), cos, -np.inf)
        mask = np.triu(cos >= threshold, k=1)
        ii, jj = np.nonzero(mask)
        k1, k2 = k[ii], k[jj]
        lo, hi = np.minimum(k1, k2), np.maximum(k1, k2)
        return pd.DataFrame({"key1": lo, "key2": hi, "cos_sim": cos[ii, jj]})

    return assigned.groupBy("ivf_cell").applyInPandas(emit, out_schema)


def semantic_dedup(
    df: DataFrame,
    centroids: np.ndarray,
    *,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> DataFrame:
    """Rows surviving SemDeDup: one min-key representative per connected
    component of the within-cell cosine≥threshold graph."""
    # edge list is O(duplicates) — tiny; checkpoint so connected_components'
    # edge count and union-find scan don't re-run the assignment + GEMM
    pairs = semantic_pairs(
        df, centroids, threshold=threshold, vec_col=vec_col, key_col=key_col
    ).localCheckpoint(eager=False)
    comp = D.connected_components(pairs)
    drop = comp.filter(F.col("key") != F.col("component")).select(F.col("key").alias(key_col))
    return df.join(drop, key_col, "left_anti")
