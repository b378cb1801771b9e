"""Quality-classifier trainer (operators/classifier.py) vs a plain-numpy
mirror of the SAME quantized-gradient recipe, plus the determinism and
learning-quality properties the registered query relies on."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from fs2_kinesis_firehose_spark.operators.classifier import (
    classifier_eval,
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


def _pairwise_auc(scores, labels):
    """Brute-force AUC: P(score_pos > score_neg) + 0.5·P(tie) over all
    pos×neg pairs — the definition the rank-sum formula must equal."""
    pos = [s for s, y in zip(scores, labels) if y == 1]
    neg = [s for s, y in zip(scores, labels) if y == 0]
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    return wins / (len(pos) * len(neg))


def test_auc_equals_pairwise_definition(feats):
    """Rank-sum AUC over the quantized-score histogram must equal the
    O(n²) pairwise definition computed on the SAME quantized scores
    (including the 0.5-per-tie convention)."""
    w = logreg_train(feats, dim=DIM, iterations=3, lr=4.0)
    row = classifier_eval(feats, w).collect()[0]
    rows = feats.collect()
    qs = [
        round(sum(wj * xj for wj, xj in zip(w, r["x"])) * 4096) for r in rows
    ]
    labels = [r["label"] for r in rows]
    expected = _pairwise_auc(qs, labels)
    assert abs(row["auc"] - expected) < 1e-12
    assert row["n_pos"] == sum(labels)
    assert row["n_neg"] == len(labels) - sum(labels)


def test_auc_extremes(spark):
    """A perfect ranker scores 1.0; an inverted one 0.0; ties-only 0.5."""
    rows = [([1.0, float(y)], y) for y in [0, 0, 0, 1, 1]]
    df = spark.createDataFrame(rows, "x array<double>, label int")
    perfect = classifier_eval(df, [0.0, 5.0]).collect()[0]
    assert perfect["auc"] == 1.0 and perfect["auc_ok"]
    inverted = classifier_eval(df, [0.0, -5.0]).collect()[0]
    assert inverted["auc"] == 0.0 and not inverted["auc_ok"]
    ties = classifier_eval(df, [1.0, 0.0]).collect()[0]
    assert ties["auc"] == 0.5


def test_sql_float_literal_roundtrip(spark):
    """The selectExpr training path embeds weights as ``repr(float)`` SQL
    literals; Spark parses plain decimals as DECIMAL and scientific
    notation as DOUBLE — both must land back on the IDENTICAL double in
    double-context arithmetic, or training would drift from the Column
    path.  Checked over adversarial magnitudes (subnormal-ish, huge,
    negative, long-mantissa).  Known exception, deliberately NOT listed:
    ``-0.0`` parses via DECIMAL (no signed zero) to ``+0.0`` — unreachable
    in the update rule (``w − lr·g/(s·n)`` with exact-integer g never
    yields −0.0) and value-identical through every product/σ anyway."""
    import struct

    vals = [
        0.1, -0.30000000000000004, 1e-300, -1.7976931348623157e308,
        4096.0, 2.220446049250313e-16, 123456789.123456789,
        0.9999999999999999, 5e-324,
    ]
    exprs = [f"cast({v!r} as double) as c{i}" for i, v in enumerate(vals)]
    row = spark.range(1).selectExpr(*exprs).collect()[0]
    for i, v in enumerate(vals):
        got = row[f"c{i}"]
        assert struct.pack("<d", got) == struct.pack("<d", v), (v, got)


def test_eval_is_partitioning_invariant(feats):
    w = logreg_train(feats, dim=DIM, iterations=3, lr=4.0)
    r1 = classifier_eval(feats, w).collect()[0]
    r2 = classifier_eval(feats.repartition(7), w).collect()[0]
    assert r1 == r2  # every column, including the float AUC, bit-identical


def test_known_n_skips_count_and_keeps_weights_bit_identical(feats):
    """`n=` lets the caller skip logreg_train's count() scan (a whole extra
    pass at 100 TB); the update uses the same exact integer, so weights
    must be BIT-identical to the count()-derived run."""
    n = feats.count()
    w_counted = logreg_train(feats, dim=DIM, iterations=3, lr=4.0)
    w_known = logreg_train(feats, dim=DIM, iterations=3, lr=4.0, n=n)
    assert w_known == w_counted
    import pytest

    with pytest.raises(ValueError, match="empty"):
        logreg_train(feats, dim=DIM, iterations=1, n=0)


def test_first_grads_keeps_weights_bit_identical(feats):
    """`first_grads=` lets the caller hand in the w=0 first-iteration
    gradient integers it already computed (quality_classifier_accounting's
    g1_checksum row), skipping iteration 1's full aggregate pass; the same
    exact integers enter the same update arithmetic, so the whole weight
    trajectory must be BIT-identical to the self-computed run."""
    from pyspark.sql import functions as F

    s = float(1 << 12)
    g1 = feats.agg(
        *[
            F.sum(
                F.round(
                    (F.lit(0.5) - F.col("label").cast("double"))
                    * F.element_at(F.col("x"), j + 1)
                    * s
                ).cast("long")
            ).alias(f"g{j}")
            for j in range(DIM + 1)
        ]
    ).collect()[0]
    w_plain = logreg_train(feats, dim=DIM, iterations=3, lr=4.0)
    w_fused = logreg_train(
        feats,
        dim=DIM,
        iterations=3,
        lr=4.0,
        first_grads=[g1[f"g{j}"] for j in range(DIM + 1)],
    )
    assert w_fused == w_plain
    with pytest.raises(ValueError, match="first_grads"):
        logreg_train(feats, dim=DIM, iterations=1, first_grads=[1, 2, 3])
