"""Trained language identification: one-vs-rest logistic regression over
hashed character-n-gram features — the CCNet/fastText role (a small linear
model over char n-grams gates every document), built entirely from the
repo's deterministic trainer (operators/classifier.py).

Why char n-grams: language is a CHARACTER-level phenomenon (articles,
inflection morphology, diacritics, scripts) — the classic Cavnar–Trenkle
n-gram profile insight, and what fastText's lid.176 model uses.  Features
are hashed into ``dim`` buckets with the repo's md5 recipe so the whole
pipeline (featurize → train → predict) is bit-reproducible across engines
and restatable by a DuckDB oracle that replays every gradient integer.

Multiclass = K independent binary models (one-vs-rest) sharing ONE feature
pass; prediction is argmax over margins QUANTIZED to the same 2^12 grid the
trainer uses, with alphabetical tie-break — cross-engine ulp noise in the
dot products cannot flip a prediction.

Scale shape: featurization is one char-position explode + one
conditional-count aggregate (codegen; the explode is ~n_chars rows/doc,
the same cost class as tokenization); training is K × iterations
single-row aggregates; scoring is a codegen projection with all K weight
vectors baked in as literals.  At 100 TB: exactly the fastText-filter
deployment pattern — train on a bounded sample, score at scan speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fs2_kinesis_firehose_spark.operators.classifier import (
    feature_hash_bucket,
    logreg_train,
)

__all__ = ["char_ngram_features", "train_lang_id", "predict_lang"]


def char_ngrams(col, n: int = 3):
    """All character n-grams of a string as array<string> — pure codegen:
    ``transform(sequence(1, length-n+1), i -> substring(text, i, n))``.
    Character (not byte) positions, so non-ASCII scripts hash whole glyphs
    identically across engines (both Spark and DuckDB substring/substr are
    codepoint-based on strings)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        F.length(c) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(c) - F.lit(n - 1)),
            lambda i: c.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def char_ngram_features(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    *,
    n: int = 3,
    dim: int = 64,
    salt: str = "lid",
    count_scale: float = 10.0,
    label_col: str | None = None,
) -> DataFrame:
    """Per-document hashed char-n-gram counts, same shape as
    ``classifier.hashed_features``: ``(key_col, x array<double> len dim+1
    [, label_col])`` with ``x[0]=1`` bias and ``x[1+j] = count(bucket j) /
    count_scale``.  One explode over char positions + one conditional-count
    aggregate — whole-stage codegen, no UDFs, no maps."""
    grams = df.select(
        F.col(key_col),
        *([F.col(label_col)] if label_col else []),
        F.explode(char_ngrams(text_col, n)).alias("_g"),
    ).withColumn("_b", feature_hash_bucket(F.col("_g"), dim, salt))
    group_cols = [key_col] + ([label_col] if label_col else [])
    per_doc = grams.groupBy(*group_cols).agg(
        *[F.count_if(F.col("_b") == j).alias(f"_c{j}") for j in range(dim)]
    )
    x = F.array(
        F.lit(1.0),
        *[
            (F.col(f"_c{j}").cast("double") / F.lit(float(count_scale)))
            for j in range(dim)
        ],
    ).alias("x")
    return per_doc.select(*group_cols, x)


def train_lang_id(
    features: DataFrame,
    classes: list[str],
    *,
    label_col: str = "lang",
    x_col: str = "x",
    dim: int = 64,
    iterations: int = 4,
    lr: float = 4.0,
    scale_bits: int = 12,
    n: int | None = None,
) -> dict[str, list[float]]:
    """One-vs-rest training: K independent binary logistic models over the
    SAME features (one feature pass, cached by the caller), each trained
    with the deterministic integer-quantized gradient loop.  Returns
    ``{class: weights}`` in the given class order."""
    if n is None:
        n = features.count()
    models: dict[str, list[float]] = {}
    for cls in classes:
        binary = features.withColumn(
            "_y", (F.col(label_col) == cls).cast("int")
        )
        models[cls] = logreg_train(
            binary,
            label_col="_y",
            x_col=x_col,
            dim=dim,
            iterations=iterations,
            lr=lr,
            scale_bits=scale_bits,
            n=n,
        )
    return models


def predict_lang(
    features: DataFrame,
    models: dict[str, list[float]],
    *,
    x_col: str = "x",
    pred_col: str = "lang_pred",
    scale_bits: int = 12,
) -> DataFrame:
    """Append ``pred_col`` = argmax-margin class.  Margins are rounded to
    the 2^scale_bits integer grid BEFORE comparison (the trainer/eval
    determinism recipe: the grid is orders of magnitude above cross-engine
    exp/fma ulps), ties break alphabetically — predictions are
    engine-portable, pinned by the DuckDB oracle replay."""
    from fs2_kinesis_firehose_spark.operators.classifier import _dot_w

    s = float(1 << scale_bits)
    best_cls, best_m = None, None
    for cls in sorted(models):  # alphabetical fold: earlier name wins ties
        qm = F.round(_dot_w(F.col(x_col), models[cls]) * s).cast("long")
        if best_cls is None:
            best_cls, best_m = F.lit(cls), qm
        else:
            take = qm > best_m
            best_cls = F.when(take, F.lit(cls)).otherwise(best_cls)
            best_m = F.when(take, qm).otherwise(best_m)
    return features.withColumn(pred_col, best_cls)
