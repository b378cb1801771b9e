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


def test_fold_null_key_in_both_sides_folds_to_one_row(spark):
    """Regression (r8 fix, mv.py eqNullSafe join): a NULL group key present
    in BOTH view and delta must fold into ONE row — a plain equi-join's
    null != null would emit two."""
    view = spark.createDataFrame(
        [(None, 10, 2), ("a", 1, 1)], "k string, s bigint, n bigint"
    )
    delta = spark.createDataFrame([(None, 7, 3)], "k string, s bigint, n bigint")
    out = fold_additive_agg(view, delta, ["k"], ["s", "n"]).collect()
    assert len(out) == 2
    got = {r.k: (r.s, r.n) for r in out}
    assert got == {None: (17, 5), "a": (1, 1)}


def test_fold_null_key_only_in_delta_appears_once(spark):
    view = spark.createDataFrame([("a", 1, 1)], "k string, s bigint, n bigint")
    delta = spark.createDataFrame([(None, 7, 3)], "k string, s bigint, n bigint")
    got = {
        r.k: (r.s, r.n)
        for r in fold_additive_agg(view, delta, ["k"], ["s", "n"]).collect()
    }
    assert got == {"a": (1, 1), None: (7, 3)}


def test_fold_validates_delta_columns_and_rename_collisions(spark):
    import pytest

    view = spark.createDataFrame([("a", 1)], "k string, s bigint")
    missing = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="missing fold columns"):
        fold_additive_agg(view, missing, ["k"], ["s"])
    clash = spark.createDataFrame([("a", 1, "x")], "k string, s bigint, _d_k string")
    with pytest.raises(ValueError, match="_d_"):
        fold_additive_agg(view, clash, ["k"], ["s"])


def test_signed_cdc_delta_retraction_algebra(spark):
    from pyspark.sql import Row

    from fs2_kinesis_firehose_spark.operators.mv import (
        fold_additive_agg,
        signed_cdc_delta,
    )

    view = spark.createDataFrame(
        [Row(g="a", n_rows=2, total=30), Row(g="b", n_rows=1, total=5)]
    )
    changes = spark.createDataFrame(
        [
            Row(g="a", action="removed", old_v=10, new_v=None),   # -1, -10
            Row(g="a", action="changed", old_v=20, new_v=25),     #  0,  +5
            Row(g="b", action="added", old_v=None, new_v=7),      # +1,  +7
        ],
        "g string, action string, old_v long, new_v long",
    )
    delta = signed_cdc_delta(
        changes, ["g"], {"total": ("old_v", "new_v")}, count_col="n_rows"
    )
    out = {r.g: (r.n_rows, r.total)
           for r in fold_additive_agg(view, delta, ["g"], ["n_rows", "total"]).collect()}
    # a: (2-1, 30-10+5) ; b: (1+1, 5+7) — exactly the full recompute
    assert out == {"a": (1, 25), "b": (2, 12)}


def test_signed_cdc_delta_unknown_action_fails_loudly(spark):
    """A change feed speaking a different action vocabulary ('deleted',
    NULL) must error, not silently contribute sign 0 (r12 advisory fix)."""
    import pytest
    from pyspark.sql import Row

    from fs2_kinesis_firehose_spark.operators.mv import signed_cdc_delta

    changes = spark.createDataFrame(
        [Row(g="a", action="deleted", old_v=10, new_v=None)],
        "g string, action string, old_v long, new_v long",
    )
    delta = signed_cdc_delta(changes, ["g"], {"total": ("old_v", "new_v")})
    with pytest.raises(Exception, match="unknown action deleted"):
        delta.collect()

    null_action = spark.createDataFrame(
        [Row(g="a", action=None, old_v=1, new_v=2)],
        "g string, action string, old_v long, new_v long",
    )
    with pytest.raises(Exception, match="unknown action NULL"):
        signed_cdc_delta(null_action, ["g"], {"total": ("old_v", "new_v")}).collect()

    ok = spark.createDataFrame(
        [Row(g="a", action="unchanged", old_v=3, new_v=3)],
        "g string, action string, old_v long, new_v long",
    )
    row = signed_cdc_delta(ok, ["g"], {"total": ("old_v", "new_v")}).collect()[0]
    assert (row.n_rows, row.total) == (0, 0)
