"""Similarity search over embedding columns.

- ``brute_force_topk``      — exact cosine top-k against a query vector; the
  correctness baseline.  One codegen'd projection + TakeOrderedAndProject
  (per-partition top-k, driver merges k×P rows — no global sort, no collect
  of the corpus).  This is already the right *exact* plan at 100 TB.
- ``random_hyperplane_lsh`` — sign-LSH bucketing; ``ann_topk`` probes only
  the query's bucket (+ optional multi-probe neighbors), turning a full scan
  into a partition-pruned bucket read when the table is written bucketed/
  partitioned by ``bucket``.
- ``ivf_assign`` / ``ivf_topk`` — IVF coarse quantizer: k-means-style
  centroids (sampled + fixed seed), rows assigned to nearest centroid;
  queries probe the ``nprobe`` nearest centroids' inverted lists.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fs2_kinesis_firehose_spark.functions import vectors as V


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> DataFrame:
    dim = len(query_vec)
    """Exact cosine top-k. Deterministic tie-break on the key column.

    The query norm is a constant: computed driver-side with a SEQUENTIAL fold
    (bit-identical to a SQL engine's left-fold, unlike numpy's pairwise sum)
    and baked in as a literal — the per-row work is one dot + one row norm."""
    q = V.literal_vector(query_vec)
    acc = 0.0
    for x in query_vec:
        acc += float(x) * float(x)
    q_norm = F.lit(acc**0.5)
    cos = V.dot(F.col(vec_col), q, dim) / (V.norm(F.col(vec_col), dim) * q_norm)
    scored = df.select(F.col(key_col), F.round(cos, 6).alias("cos_sim"))
    return scored.orderBy(F.col("cos_sim").desc(), F.col(key_col).asc()).limit(k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def random_hyperplane_lsh(
    df: DataFrame,
    dim: int,
    *,
    n_planes: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Append an integer ``bucket`` = sign pattern under ``n_planes`` fixed
    random hyperplanes (2^n_planes buckets).

    The hyperplanes are literal arrays baked into the plan (constant-folded),
    so bucketing is a pure codegen projection — at write time, partitionBy/
    bucketBy on ``bucket`` makes ANN reads partition-pruned."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        sign_bit = (V.dot(F.col(vec_col), V.literal_vector(list(p))) > 0).cast("long")
        bucket = bucket + F.shiftleft(sign_bit, i)
    return df.withColumn("bucket", bucket)


def ann_topk(
    df_bucketed: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    *,
    n_planes: int = 12,
    seed: int = 42,
    multiprobe_hamming: int = 1,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: score only rows in the query's LSH bucket and the
    buckets within ``multiprobe_hamming`` bit flips (multi-probe LSH —
    recovers recall lost to boundary effects without touching the rest of the
    corpus)."""
    planes = _hyperplanes(dim, n_planes, seed)
    qv = np.asarray(query_vec, dtype=np.float64)
    qbucket = int(sum((1 << i) for i, p in enumerate(planes) if float(p @ qv) > 0))
    probes = {qbucket}
    if multiprobe_hamming >= 1:
        probes.update(qbucket ^ (1 << i) for i in range(n_planes))
    if multiprobe_hamming >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                probes.add(qbucket ^ (1 << i) ^ (1 << j))
    candidates = df_bucketed.filter(F.col("bucket").isin(*sorted(probes)))
    return brute_force_topk(candidates, query_vec, k, vec_col, key_col)


# ---------------------------------------------------------------------------
# IVF (inverted-file) coarse quantization
# ---------------------------------------------------------------------------
def ivf_train_centroids(
    df: DataFrame,
    *,
    n_centroids: int = 16,
    sample_fraction: float | None = None,
    max_sample_rows: int = 100_000,
    iters: int = 5,
    seed: int = 42,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Tiny Lloyd's k-means on a driver-side SAMPLE (centroids are metadata,
    not data — the corpus is never collected).

    ``sample_fraction=None`` derives a fraction targeting ``max_sample_rows``
    rows (one cheap count); an explicit fraction is still row-capped by
    ``limit`` so the driver payload stays bounded at any corpus size."""
    if sample_fraction is None:
        n = df.count()
        sample_fraction = min(1.0, max_sample_rows / max(n, 1))
    sample = (
        df.select(vec_col)
        .sample(fraction=sample_fraction, seed=seed)
        .limit(max_sample_rows)
        .toPandas()[vec_col]
    )
    X = np.stack([np.asarray(v, dtype=np.float64) for v in sample])
    rng = np.random.default_rng(seed)
    centroids = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        d = ((X[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(centroids)):
            members = X[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def seeded_centroids(
    dim: int, n_centroids: int = 16, *, seed: int = 7, scale: float = 0.125
) -> np.ndarray:
    """Data-independent Voronoi centroids (seeded gaussian, scaled to the
    embedding distribution).  Quantization quality trails trained k-means,
    but the cells are pure constants — reproducible in any engine, which
    makes the full IVF pipeline oracle-checkable."""
    rng = np.random.default_rng(seed)
    return rng.normal(0.0, scale, (n_centroids, dim))


def _seq_sq_norm(vec) -> float:
    """Sequential-fold |v|² in Python doubles — bit-identical to a SQL
    engine's left fold (numpy pairwise summation is NOT)."""
    acc = 0.0
    for x in vec:
        acc += float(x) * float(x)
    return acc


def _centroid_dist_exprs(vec_col: str, centroids: np.ndarray) -> list[Column]:
    """Per-centroid comparable distance |c|² − 2·(v·c): same argmin as true
    L2 (|v|² is constant per row).  The dot is the HOF fold (zip_with +
    aggregate) DELIBERATELY, not the dim-expanded codegen chain: 16 centroids
    × 64 literal terms × the array duplicated for position+min blows the
    generated method past what Janino can compile in a small driver heap
    (observed OOM at 1 GiB) — the HOF form is interpreted but tiny, and its
    sequential fold order is exactly what the SQL oracle restates."""
    return [
        F.lit(_seq_sq_norm(c))
        - 2.0 * V.dot(F.col(vec_col), V.literal_vector(list(c)))
        for c in centroids
    ]


def ivf_assign(
    df: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Append ``ivf_cell`` = argmin-distance centroid;
    ``array_position(array_min(...))`` picks the first argmin."""
    dists = F.array(*_centroid_dist_exprs(vec_col, centroids))
    return df.withColumn(
        "ivf_cell", (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    )


def ivf_probe_cells(
    centroids: np.ndarray, query_vec: list[float], nprobe: int
) -> list[int]:
    """The ``nprobe`` cells nearest the query, ranked by the SAME
    |c|² − 2·(q·c) sequential-fold arithmetic the row assignment uses (ties
    broken by cell index) — so an oracle ranking cells in SQL lands on the
    identical probe set."""
    dists = []
    for c in centroids:
        acc = 0.0
        for x, y in zip(query_vec, c):
            acc += float(x) * float(y)
        dists.append(_seq_sq_norm(c) - 2.0 * acc)
    order = sorted(range(len(centroids)), key=lambda i: (dists[i], i))
    return order[:nprobe]


def ivf_topk(
    df_assigned: DataFrame,
    centroids: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    *,
    nprobe: int = 4,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> DataFrame:
    """Probe the ``nprobe`` nearest cells' inverted lists, exact re-rank inside."""
    cells = ivf_probe_cells(centroids, query_vec, nprobe)
    candidates = df_assigned.filter(F.col("ivf_cell").isin(cells))
    return brute_force_topk(candidates, query_vec, k, vec_col, key_col)


def ann_recall_eval(
    df_bucketed: DataFrame,
    dim: int,
    *,
    n_queries: int = 8,
    k: int = 10,
    multiprobe_hamming: int = 2,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> DataFrame:
    """Recall@k of the sign-LSH probe path vs exact brute force, for the
    first ``n_queries`` corpus vectors as queries — ONE Spark plan, no
    driver loop over queries.

    Output: (query_id, n_ann, n_common, recall_at_k).  The query set is a
    broadcast (n_queries rows); every corpus row scores against every query
    (codegen'd dot chain), the ANN side keeps rows within
    ``multiprobe_hamming`` bucket bits of the query's bucket, and per-query
    top-k on both sides is a window over query_id.

    Scale note: exact ground truth is inherently O(queries × corpus) — this
    is the OFFLINE quality harness you run on a corpus sample to tune
    n_planes/probe width, not a serving-path query.  The ANN candidate side
    alone is the production read path (bucket-pruned, see ``ann_topk``).
    """
    from pyspark.sql.window import Window

    q = F.broadcast(
        df_bucketed.filter(F.col(key_col) < n_queries).select(
            F.col(key_col).alias("query_id"),
            F.col(vec_col).alias("_qv"),
            F.col("bucket").alias("_qbucket"),
        )
    )
    cos = F.round(
        V.dot(F.col(vec_col), F.col("_qv"), dim)
        / (V.norm(F.col(vec_col), dim) * V.norm(F.col("_qv"), dim)),
        6,
    )
    scored = df_bucketed.crossJoin(q).select(
        "query_id",
        F.col(key_col),
        cos.alias("cos_sim"),
        F.bit_count(F.col("bucket").bitwiseXOR(F.col("_qbucket"))).alias("_ham"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc(key_col))
    exact = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", key_col)
    )
    ann = (
        scored.filter(F.col("_ham") <= multiprobe_hamming)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", key_col)
    )
    n_ann = ann.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_ann"))
    common = (
        exact.join(ann, ["query_id", key_col])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        n_ann.join(common, "query_id", "left")
        .select(
            "query_id",
            "n_ann",
            F.coalesce("n_common", F.lit(0)).alias("n_common"),
            F.round(F.coalesce("n_common", F.lit(0)) / F.lit(float(k)), 2).alias("recall_at_k"),
        )
    )


def ivf_assign_blas(
    df: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """``ivf_assign`` evaluated as one numpy GEMM per Arrow batch
    (``mapInPandas``) instead of per-row interpreted HOF folds — measured
    ~100× on assignment-dominated pipelines (the HOF argmin costs ~2 ms/row;
    see _centroid_dist_exprs for why IT can't be codegen'd).

    Same argmin-of(|c|² − 2·v·c) rule, same first-min tie-break
    (np.argmin); the only delta is float summation order (BLAS pairwise vs
    sequential fold), which can flip a cell only when two centroid distances
    agree to ~1 ulp — measure-zero for real embeddings, and
    tests/test_semdedup.py asserts exact agreement with ``ivf_assign`` on the
    fixtures.  Use THIS in bulk pipelines (SemDeDup); the HOF form remains
    the oracle-exact reference.
    """
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float64)
    c2 = np.einsum("ij,ij->i", C, C)
    from pyspark.sql.types import IntegerType, StructField, StructType

    fields = df.schema.fieldNames()
    # fresh StructType — StructType.add MUTATES the receiver, and df.schema
    # is the DataFrame's cached schema object
    out_schema = StructType(list(df.schema.fields) + [StructField("ivf_cell", IntegerType())])

    def assign(batches):
        for pdf in batches:
            if len(pdf):
                X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                d = c2[None, :] - 2.0 * (X @ C.T)
                pdf = pdf.assign(ivf_cell=d.argmin(axis=1).astype("int32"))
            else:
                pdf = pdf.assign(ivf_cell=pd.Series([], dtype="int32"))
            yield pdf[fields + ["ivf_cell"]]

    return df.mapInPandas(assign, out_schema)
