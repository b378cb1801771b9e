"""Quality-classifier trainer (operators/classifier.py) vs a plain-numpy
mirror of the SAME quantized-gradient recipe, plus the determinism and
learning-quality properties the registered query relies on."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from fs2_kinesis_firehose_spark.operators.classifier import (
    hashed_features,
    logreg_score,
    logreg_train,
)
from fs2_kinesis_firehose_spark.tables import load_table

DIM = 16
MIN_TOKENS = 40


def _bucket(token: str, dim: int, salt: str = "qc") -> int:
    return int(hashlib.md5((token + "|" + salt).encode()).hexdigest()[:8], 16) % dim


def _reference_features(rows, dim=DIM, count_scale=10.0, min_tokens=MIN_TOKENS):
    """Numpy mirror of hashed_features: bias + scaled bucket counts and the
    token-count teacher label."""
    out = {}
    for doc_id, text in rows:
        toks = text.split()
        x = np.zeros(dim + 1)
        x[0] = 1.0
        for t in toks:
            x[1 + _bucket(t, dim)] += 1.0 / count_scale
        out[doc_id] = (x, 1 if len(toks) >= min_tokens else 0)
    return out


def _reference_train(feats, dim=DIM, iterations=4, lr=4.0, scale_bits=12):
    """Numpy mirror of logreg_train's exact integer-gradient recipe."""
    s = float(1 << scale_bits)
    X = np.stack([x for x, _ in feats.values()])
    y = np.array([lab for _, lab in feats.values()], dtype=float)
    n = len(y)
    w = np.zeros(dim + 1)
    for _ in range(iterations):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        g = np.rint((p - y)[:, None] * X * s).astype(np.int64).sum(axis=0)
        w = w - lr * g / (s * n)
    return w


@pytest.fixture(scope="module")
def docs(spark, sf_oracle):
    return load_table(spark, sf_oracle, "documents").select("doc_id", "text")


@pytest.fixture(scope="module")
def feats(docs):
    return hashed_features(
        docs, "text", "doc_id", dim=DIM, label_min_tokens=MIN_TOKENS
    ).localCheckpoint(eager=True)


def test_features_match_reference(docs, feats):
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    ref = _reference_features(rows)
    got = {r["doc_id"]: (np.array(r["x"]), r["label"]) for r in feats.collect()}
    assert set(got) == set(ref)
    for k, (x, lab) in ref.items():
        gx, glab = got[k]
        assert glab == lab, k
        np.testing.assert_allclose(gx, x, rtol=0, atol=1e-12)


def test_trained_weights_match_reference_bitwise(docs, feats):
    """The quantization contract: Spark's distributed integer-gradient sums
    reproduce the numpy trainer's weights EXACTLY (same doubles), because
    every per-iteration gradient is an exact integer and the weight update
    is the same fixed-order double arithmetic."""
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    ref_w = _reference_train(_reference_features(rows))
    w = logreg_train(feats, dim=DIM, iterations=4, lr=4.0, scale_bits=12)
    assert list(ref_w) == w  # bit-identical, not approx


def test_training_is_partitioning_invariant(feats):
    """Repartitioning must not move a single bit of the trained weights —
    integer gradient sums are associative/commutative exactly."""
    w1 = logreg_train(feats, dim=DIM, iterations=3, lr=4.0)
    w2 = logreg_train(feats.repartition(7), dim=DIM, iterations=3, lr=4.0)
    assert w1 == w2


def test_classifier_learns_the_teacher_rule(feats):
    """The model must generalize the token-count rule well above chance:
    >= 90% accuracy against the weak-supervision labels at sf0.01."""
    w = logreg_train(feats, dim=DIM, iterations=12, lr=4.0)
    scored = logreg_score(feats, w).collect()
    correct = sum(1 for r in scored if (r["prob"] >= 0.5) == (r["label"] == 1))
    n = len(scored)
    base = max(sum(r["label"] for r in scored), n - sum(r["label"] for r in scored))
    assert correct / n >= 0.9
    assert correct > base  # beats the majority-class baseline


def test_score_is_sigmoid_of_dot(feats):
    w = [0.25 * (j + 1) for j in range(DIM + 1)]
    got = logreg_score(feats, w).select("x", "prob").collect()
    for r in got:
        p = 1.0 / (1.0 + np.exp(-np.dot(np.array(r["x"]), np.array(w))))
        assert abs(r["prob"] - p) < 1e-12


def test_empty_features_raises(feats):
    with pytest.raises(ValueError):
        logreg_train(feats.limit(0), dim=DIM, iterations=1)
