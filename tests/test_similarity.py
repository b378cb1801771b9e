"""Similarity-search tests: brute-force correctness, ANN recall, IVF recall."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from fs2_kinesis_firehose_spark.operators import similarity as S
from fs2_kinesis_firehose_spark.tables import load_table


def _query_vec(spark, sf_dir, vec_id=0):
    emb = load_table(spark, sf_dir, "embeddings")
    return [float(x) for x in emb.filter(f"vec_id = {vec_id}").first()["embedding"]]


def _numpy_topk(spark, sf_dir, qv, k):
    emb = load_table(spark, sf_dir, "embeddings").toPandas()
    X = np.stack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    q = np.asarray(qv)
    cos = (X @ q) / (np.linalg.norm(X, axis=1) * np.linalg.norm(q))
    order = sorted(zip(-np.round(cos, 6), emb["vec_id"]))
    return [int(v) for _, v in order[:k]]


def test_brute_force_topk_matches_numpy(spark, sf_smoke):
    qv = _query_vec(spark, sf_smoke)
    got = [r.vec_id for r in S.brute_force_topk(
        load_table(spark, sf_smoke, "embeddings"), qv, k=10).collect()]
    assert got == _numpy_topk(spark, sf_smoke, qv, 10)
    assert got[0] == 0  # the probe vector itself is its own nearest neighbor


def test_ann_lsh_recall(spark, sf_smoke):
    """Near-uniform random vectors are sign-LSH's worst case; with 6 planes +
    2-bit multiprobe the candidate set is ~1/3 of the corpus and recall must
    clear 0.4 (clustered real-world embeddings do far better)."""
    emb = load_table(spark, sf_smoke, "embeddings")
    qv = _query_vec(spark, sf_smoke)
    exact = set(_numpy_topk(spark, sf_smoke, qv, 10))
    bucketed = S.random_hyperplane_lsh(emb, dim=64, n_planes=6)
    approx = {
        r.vec_id
        for r in S.ann_topk(
            bucketed, qv, dim=64, k=10, n_planes=6, multiprobe_hamming=2
        ).collect()
    }
    recall = len(exact & approx) / 10
    assert recall >= 0.4, f"ANN recall {recall}"
    # and it must actually prune: candidates ≪ corpus
    n_probe = bucketed.filter("bucket IS NOT NULL").count()
    assert n_probe == emb.count()


def test_ann_bucket_determinism(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    b1 = {r.vec_id: r.bucket for r in S.random_hyperplane_lsh(emb, dim=64).collect()}
    b2 = {r.vec_id: r.bucket for r in S.random_hyperplane_lsh(emb, dim=64).collect()}
    assert b1 == b2


def test_ivf_recall(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    qv = _query_vec(spark, sf_smoke)
    cents = S.ivf_train_centroids(emb, n_centroids=16, seed=42)
    assigned = S.ivf_assign(emb, cents)
    # every row lands in exactly one cell, all cells valid
    cells = assigned.select("ivf_cell").distinct().collect()
    assert all(0 <= r.ivf_cell < 16 for r in cells)
    exact = set(_numpy_topk(spark, sf_smoke, qv, 10))
    approx = {r.vec_id for r in S.ivf_topk(assigned, cents, qv, k=10, nprobe=4).collect()}
    recall = len(exact & approx) / 10
    assert recall >= 0.5, f"IVF recall {recall}"


def test_approx_count_distinct_within_tolerance(spark, sf_smoke):
    import fs2_kinesis_firehose_spark.queries as q

    q.load_all()
    from pyspark.sql import functions as F

    e = load_table(spark, sf_smoke, "events")
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    rows = q.QUERIES["approx_distinct_users"](spark, sf_smoke).collect()
    got = {r.event_type: r for r in rows}
    for et, n in exact.items():
        assert got[et].n_users_exact == n
        assert got[et].hll_within_5pct


def test_sign_quantize_packs_expected_bits(spark):
    from fs2_kinesis_firehose_spark.operators.similarity import (
        query_sign_bits,
        sign_quantize,
    )

    vec = [1.0, -1.0, 0.0, 2.5] + [-0.1] * 60  # only dims 0 and 3 positive
    df = spark.createDataFrame([(1, vec)], "vec_id long, embedding array<float>")
    bits = sign_quantize(df, 64).collect()[0]["bits"]
    assert bits == [0b1001]
    # driver-side packing must agree with the plan-side packing
    assert query_sign_bits(vec) == [0b1001]


def test_sign_quantize_multiword(spark):
    from fs2_kinesis_firehose_spark.operators.similarity import (
        query_sign_bits,
        sign_quantize,
    )

    vec = [0.0] * 130
    vec[0] = vec[64] = vec[129] = 1.0
    df = spark.createDataFrame([(1, vec)], "vec_id long, embedding array<float>")
    bits = sign_quantize(df, 130).collect()[0]["bits"]
    assert bits == query_sign_bits(vec) == [1, 1, 2]


def test_hamming_counts_sign_disagreements(spark):
    from fs2_kinesis_firehose_spark.operators.similarity import (
        hamming_to_query,
        query_sign_bits,
        sign_quantize,
    )

    a = [1.0] * 8 + [-1.0] * 56
    b = [1.0] * 5 + [-1.0] * 59  # dims 5,6,7 differ
    df = sign_quantize(
        spark.createDataFrame([(1, a)], "vec_id long, embedding array<float>"), 64
    )
    out = df.select(hamming_to_query("bits", query_sign_bits(b)).alias("h")).collect()
    assert out[0].h == 3


def test_binary_rescore_recall_vs_bruteforce(spark, sf_smoke):
    from fs2_kinesis_firehose_spark.operators.similarity import (
        binary_quant_rescored_topk,
        brute_force_topk,
    )
    from fs2_kinesis_firehose_spark.tables import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    qv = [float(x) for x in emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]]
    exact = {r.vec_id for r in brute_force_topk(emb, qv, k=10).collect()}
    got = {r.vec_id for r in binary_quant_rescored_topk(emb, qv, k=10, candidates=50).collect()}
    # sign codes at 64 dims: expect most of the true top-10 in a 50-candidate pool
    assert len(exact & got) >= 6
    # the query vector itself (hamming 0, cosine 1.0) must always survive
    assert 0 in got


def test_truncated_dim_recall_detects_prefix_divergence(spark):
    from fs2_kinesis_firehose_spark.operators.similarity import (
        truncated_dim_recall_eval,
    )

    # v3's prefix-2 cosine to the query is 1.0 but its full-dim cosine is
    # tiny, so truncation swaps it into the top-2 and recall@2 drops to 0.5.
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0, 0.0]),   # query (self)
        Row(vec_id=1, embedding=[0.9, 0.1, 0.0, 0.0]),   # true #2 neighbor
        Row(vec_id=2, embedding=[0.0, 1.0, 0.0, 0.0]),   # orthogonal
        Row(vec_id=3, embedding=[1.0, 0.0, 5.0, 0.0]),   # prefix impostor
    ]
    df = spark.createDataFrame(rows)
    out = truncated_dim_recall_eval(df, dim=4, trunc_dim=2, n_queries=1, k=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.query_id, r.n_common, r.recall_at_k) == (0, 1, 0.5)


def test_truncated_dim_recall_full_trunc_is_perfect(spark):
    from fs2_kinesis_firehose_spark.operators.similarity import (
        truncated_dim_recall_eval,
    )

    rows = [
        Row(vec_id=i, embedding=[float(i + 1), float(3 - i), 1.0, 0.5])
        for i in range(4)
    ]
    df = spark.createDataFrame(rows)
    out = truncated_dim_recall_eval(df, dim=4, trunc_dim=4, n_queries=2, k=3).collect()
    assert all(r.recall_at_k == 1.0 for r in out) and len(out) == 2


def test_truncated_dim_recall_bad_trunc_raises(spark):
    import pytest

    from fs2_kinesis_firehose_spark.operators.similarity import (
        truncated_dim_recall_eval,
    )

    df = spark.createDataFrame([Row(vec_id=0, embedding=[1.0, 0.0])])
    with pytest.raises(ValueError, match="trunc_dim"):
        truncated_dim_recall_eval(df, dim=2, trunc_dim=3)


def test_knn_label_eval_majority_vote_and_leave_one_out(spark):
    from fs2_kinesis_firehose_spark.operators.similarity import knn_label_eval

    # query 0 (label 9) has 3 nearest neighbors labeled [1, 1, 2]: the vote
    # must predict 1 (majority), not 9 (its own label — leave-one-out).
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0], label=9),
        Row(vec_id=1, embedding=[0.99, 0.01], label=1),
        Row(vec_id=2, embedding=[0.98, 0.02], label=1),
        Row(vec_id=3, embedding=[0.97, 0.03], label=2),
        Row(vec_id=4, embedding=[-1.0, 0.0], label=9),
    ]
    df = spark.createDataFrame(rows)
    out = knn_label_eval(df, dim=2, n_queries=1, k=3).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.query_id, r.true_label, r.pred_label, r.is_correct) == (0, 9, 1, 0)


def test_knn_label_eval_tie_breaks_to_smallest_label(spark):
    from fs2_kinesis_firehose_spark.operators.similarity import knn_label_eval

    # k=2 neighbors labeled [5, 3]: one vote each → deterministic tie-break
    # to the smaller label (3).
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0], label=3),
        Row(vec_id=1, embedding=[0.99, 0.01], label=5),
        Row(vec_id=2, embedding=[0.98, 0.02], label=3),
        Row(vec_id=3, embedding=[-1.0, 0.0], label=5),
    ]
    df = spark.createDataFrame(rows)
    out = knn_label_eval(df, dim=2, n_queries=1, k=2).collect()
    assert out[0].pred_label == 3 and out[0].is_correct == 1


def test_contrastive_pair_mining_picks_pos_and_hard_neg(spark):
    from fs2_kinesis_firehose_spark.operators.similarity import (
        contrastive_pair_mining,
    )

    # anchor 0 (label 1): nearest same-label is v2, nearest different-label
    # is v1 (closer than v2 → a triplet violation, margin < 0)
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0], label=1),
        Row(vec_id=1, embedding=[0.99, 0.01], label=2),
        Row(vec_id=2, embedding=[0.95, 0.05], label=1),
        Row(vec_id=3, embedding=[-1.0, 0.0], label=2),
    ]
    df = spark.createDataFrame(rows)
    out = contrastive_pair_mining(df, dim=2, n_queries=1).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.query_id, r.true_label, r.pos_id, r.neg_id) == (0, 1, 2, 1)
    assert r.margin < 0  # the hard negative outranks the positive
    assert r.pos_sim == round(r.margin + r.neg_sim, 6)


def test_contrastive_pair_mining_excludes_self(spark):
    from fs2_kinesis_firehose_spark.operators.similarity import (
        contrastive_pair_mining,
    )

    # the anchor itself (cos=1, same label) must NOT be its own positive
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0], label=1),
        Row(vec_id=1, embedding=[0.5, 0.5], label=1),
        Row(vec_id=2, embedding=[0.0, 1.0], label=2),
    ]
    df = spark.createDataFrame(rows)
    r = contrastive_pair_mining(df, dim=2, n_queries=1).collect()[0]
    assert r.pos_id == 1
