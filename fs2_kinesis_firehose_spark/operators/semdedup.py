"""SemDeDup — semantic deduplication over an embedding column
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication", public arXiv:2303.09540).

The published recipe: k-means-cluster the embeddings, compare pairs only
WITHIN a cluster, and keep one representative per group of vectors whose
cosine similarity exceeds a threshold.  Cross-cluster near-duplicates are
accepted misses — that is what makes the method scale: candidate generation
is O(Σ cell²) instead of O(n²), identical in shape to the MinHash-LSH
band join (operators/dedup.py:128).

Spark-first composition — every stage reuses an existing scale-correct op:

- cell assignment   → ``similarity.ivf_assign`` (literal-centroid argmin,
  constant-folded; with seeded centroids the cells are engine-portable and
  the whole pipeline is DuckDB-oracle-checkable);
- within-cell pairs → ``dedup.embedding_neardup_pairs`` with
  ``block_col="ivf_cell"`` (norms computed once per vector, codegen'd flat
  dot chain, per-cell shuffle join — never a cross product);
- grouping          → ``dedup.connected_components`` (driver union-find for
  bounded edge sets, alternating star contraction beyond);
- survivor rule     → min key per component (deterministic, the same
  contract as exact/MinHash dedup).

At 100 TB the knobs move, not the plan: more centroids (the paper uses ~100k
so cells stay ~constant-sized), trained instead of seeded
(``similarity.ivf_train_centroids``), and a parquet layout partitioned by
cell so the pair join is co-located.

Reference parity note: the reference engine has no embedding operators at
all (its unit of work is an opaque byte record, `RecordOps.scala:26`); this
is part of the Tier-C training-data surface SURVEY.md §2 adds on top.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fs2_kinesis_firehose_spark.operators import dedup as D
from fs2_kinesis_firehose_spark.operators.similarity import ivf_assign


def semantic_pairs(
    df: DataFrame,
    centroids: np.ndarray,
    *,
    threshold: float = 0.95,
    dim: int | None = None,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> DataFrame:
    """(key1, key2, cos_sim) for same-cell pairs with cosine ≥ threshold."""
    assigned = ivf_assign(df, centroids, vec_col)
    return D.embedding_neardup_pairs(
        assigned, vec_col, key_col, threshold=threshold, block_col="ivf_cell", dim=dim
    )


def semantic_dedup(
    df: DataFrame,
    centroids: np.ndarray,
    *,
    threshold: float = 0.95,
    dim: int | None = None,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> DataFrame:
    """Rows surviving SemDeDup: one min-key representative per connected
    component of the within-cell cosine≥threshold graph."""
    pairs = semantic_pairs(
        df, centroids, threshold=threshold, dim=dim, vec_col=vec_col, key_col=key_col
    )
    comp = D.connected_components(pairs)
    drop = comp.filter(F.col("key") != F.col("component")).select(F.col("key").alias(key_col))
    return df.join(drop, key_col, "left_anti")
