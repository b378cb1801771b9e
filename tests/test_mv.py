"""fold_additive_agg: the additive-MV refresh fold."""

from __future__ import annotations

from pyspark.sql import Row

from fs2_kinesis_firehose_spark.operators.mv import fold_additive_agg


def test_fold_disjoint_overlapping_and_missing_keys(spark):
    view = spark.createDataFrame(
        [Row(k="a", s=10, n=2), Row(k="b", s=5, n=1)]
    )
    delta = spark.createDataFrame(
        [Row(k="b", s=7, n=3), Row(k="c", s=1, n=1)]
    )
    got = {r.k: (r.s, r.n) for r in fold_additive_agg(view, delta, ["k"], ["s", "n"]).collect()}
    assert got == {"a": (10, 2), "b": (12, 4), "c": (1, 1)}


def test_fold_empty_delta_is_identity(spark):
    view = spark.createDataFrame([Row(k="a", s=10, n=2)])
    delta = spark.createDataFrame([], "k string, s bigint, n bigint")
    got = {r.k: (r.s, r.n) for r in fold_additive_agg(view, delta, ["k"], ["s", "n"]).collect()}
    assert got == {"a": (10, 2)}


def test_fold_equals_recompute_on_random_split(spark):
    import random

    rng = random.Random(5)
    rows = [Row(k=f"g{rng.randint(0, 6)}", v=rng.randint(-100, 100)) for _ in range(500)]
    df = spark.createDataFrame(rows)
    from pyspark.sql import functions as F

    def agg(d):
        return d.groupBy("k").agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))

    base, delta = df.where(F.col("v") < 20), df.where(F.col("v") >= 20)
    folded = {r.k: (r.s, r.n) for r in fold_additive_agg(agg(base), agg(delta), ["k"], ["s", "n"]).collect()}
    full = {r.k: (r.s, r.n) for r in agg(df).collect()}
    assert folded == full
