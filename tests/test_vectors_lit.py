"""r14 literal-vector representation pin: ``F.lit(list)`` (one
Literal(ArrayData) node) must be bit-identical to the dim-wide
``CreateArray``-of-scalar-lits it replaced — the values ship with the plan
either way; only the expression-tree size (and driver-side build cost)
changed."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from fs2_kinesis_firehose_spark.functions import vectors as V


def _hexes(rows):
    return [[x.hex() for x in r["v"]] for r in rows]


def test_literal_vector_bit_equals_create_array(spark):
    rng = np.random.default_rng(41)
    vec = [float(x) for x in rng.normal(0, 0.125, 64)]
    df = spark.range(1)
    new = df.select(V.literal_vector(vec).alias("v")).collect()
    old = df.select(F.array(*[F.lit(float(x)) for x in vec]).alias("v")).collect()
    assert _hexes(new) == _hexes(old)


def test_nested_centroid_literal_bit_equals_create_array(spark):
    rng = np.random.default_rng(43)
    cents = rng.normal(0, 0.125, (16, 8))
    df = spark.range(1)
    for idx in (1, 7, 16):
        new = df.select(
            F.element_at(
                F.lit([[float(x) for x in c] for c in cents]), idx
            ).alias("v")
        ).collect()
        old = df.select(
            F.element_at(
                F.array(
                    *[F.array(*[F.lit(float(x)) for x in c]) for c in cents]
                ),
                idx,
            ).alias("v")
        ).collect()
        assert _hexes(new) == _hexes(old)


def test_literal_vector_dot_matches_python_fold(spark):
    """The dim-expanded dot chain over the single-Literal vector still
    constant-folds per term: same result as the Python sequential fold
    (the oracle-parity contract)."""
    rng = np.random.default_rng(47)
    a = [float(x) for x in rng.normal(0, 1, 16)]
    b = [float(x) for x in rng.normal(0, 1, 16)]
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    df = spark.range(1).select(V.literal_vector(a).alias("a"))
    got = df.select(
        V.dot(F.col("a"), V.literal_vector(b), 16).alias("d")
    ).first()["d"]
    assert got.hex() == acc.hex()
