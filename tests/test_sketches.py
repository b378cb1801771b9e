"""Misra–Gries heavy hitters (operators/sketches.py): exactness vs a plain
groupBy ground truth, the no-false-negative sketch guarantee, compress
error bound, and input edge cases."""

from __future__ import annotations

import collections

import numpy as np
import pytest

from fs2_kinesis_firehose_spark.operators import sketches as SK


def _zipf_df(spark, n=20_000, vocab=2_000, seed=7, partitions=8):
    rng = np.random.default_rng(seed)
    items = [f"tok{z}" for z in rng.zipf(1.3, n) % vocab]
    return (
        spark.createDataFrame([(s,) for s in items], "item string")
        .repartition(partitions)
    ), items


def test_heavy_hitters_exact_vs_groupby(spark):
    df, items = _zipf_df(spark)
    phi = 0.01
    got = {r["item"]: r["cnt"] for r in SK.heavy_hitters(df, "item", phi).collect()}
    counts = collections.Counter(items)
    cut = int(np.ceil(phi * len(items)))
    want = {t: c for t, c in counts.items() if c >= cut}
    assert got == want and len(want) > 0


def test_exactness_independent_of_k(spark):
    # Output must not depend on the counter budget (only candidate recall does).
    df, items = _zipf_df(spark, n=5_000, vocab=500, seed=3)
    phi = 0.02
    base = sorted(SK.heavy_hitters(df, "item", phi).collect())
    loose = sorted(SK.heavy_hitters(df, "item", phi, k=10_000).collect())
    tight = sorted(SK.heavy_hitters(df, "item", phi, k=50).collect())
    assert base == loose == tight


def test_summary_error_bound(spark):
    # Each per-partition summary undercounts any item by <= n_p/(k+1).
    rng = np.random.default_rng(5)
    items = [f"t{z}" for z in rng.zipf(1.5, 4_000) % 300]
    df = spark.createDataFrame([(s,) for s in items], "item string").coalesce(1)
    k = 20
    summary = {r["item"]: r["weight"] for r in
               SK.misra_gries_summaries(df, "item", k).collect()}
    assert len(summary) <= k
    truth = collections.Counter(items)
    bound = len(items) / (k + 1)
    for item, c in truth.items():
        assert summary.get(item, 0) <= c  # never overcounts
        assert c - summary.get(item, 0) <= bound  # bounded undercount


def test_no_false_negatives_at_minimum_k(spark):
    df, items = _zipf_df(spark, n=10_000, vocab=1_000, seed=11, partitions=16)
    phi = 0.05
    k_min = int(np.ceil(1 / phi))
    got = {r["item"] for r in SK.heavy_hitters(df, "item", phi, k=k_min).collect()}
    counts = collections.Counter(items)
    cut = int(np.ceil(phi * len(items)))
    assert {t for t, c in counts.items() if c >= cut} == got


def test_nulls_ignored_and_empty_input(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), (None,), ("b",)], "item string"
    )
    got = {r["item"]: r["cnt"] for r in SK.heavy_hitters(df, "item", 0.5).collect()}
    assert got == {"a": 2}  # n=3 non-null, cut=2
    empty = spark.createDataFrame([], "item string")
    assert SK.heavy_hitters(empty, "item", 0.1).count() == 0


def test_caller_supplied_totals_matches_internal(spark):
    import pyspark.sql.functions as F

    df, _ = _zipf_df(spark, n=5_000, vocab=500, seed=9)
    totals = df.where(F.col("item").isNotNull()).agg(F.count("*").alias("n"))
    a = sorted(SK.heavy_hitters(df, "item", 0.02).collect())
    b = sorted(SK.heavy_hitters(df, "item", 0.02, totals=totals).collect())
    assert a == b and len(a) > 0


def test_k_and_phi_validation(spark):
    df = spark.createDataFrame([("a",)], "item string")
    with pytest.raises(ValueError):
        SK.heavy_hitters(df, "item", 0.0)
    with pytest.raises(ValueError):
        SK.heavy_hitters(df, "item", 0.1, k=5)  # < ceil(1/phi)
    with pytest.raises(ValueError):
        SK.misra_gries_summaries(df, "item", 0)


# --- Count-Min sketch ------------------------------------------------------


def test_cm_overestimates_never_undercounts(spark):
    from fs2_kinesis_firehose_spark.operators.sketches import (
        count_min_lookup,
        count_min_table,
    )

    data = [("a",)] * 50 + [("b",)] * 20 + [("c",)] * 5 + [("d",)] * 1
    df = spark.createDataFrame(data, "item string").repartition(5)
    cm = count_min_table(df, "item", width=64, depth=4)
    probes = spark.createDataFrame([("a",), ("b",), ("c",), ("d",)], "item string")
    got = {
        r["item"]: r["cm_est"]
        for r in count_min_lookup(cm, probes, "item", width=64, depth=4).collect()
    }
    true = {"a": 50, "b": 20, "c": 5, "d": 1}
    for k, t in true.items():
        assert got[k] >= t  # one-sided error
    # wide sketch, 4 keys → no collisions: estimates exact
    assert got == true


def test_cm_absent_key_and_determinism(spark):
    from fs2_kinesis_firehose_spark.operators.sketches import (
        count_min_lookup,
        count_min_table,
    )

    df = spark.createDataFrame([(f"k{i}",) for i in range(100)], "item string")
    cm = count_min_table(df, "item", width=4096, depth=4)
    probes = spark.createDataFrame([("nope",)], "item string")
    est = count_min_lookup(cm, probes, "item", width=4096, depth=4).collect()[0]
    assert est["cm_est"] == 0  # 100 keys in 4096 cells: some row misses
    # partitioning-invariant (plain aggregate over deterministic hashes)
    a = sorted(count_min_table(df, "item", width=64, depth=2).collect())
    b = sorted(count_min_table(df.repartition(17), "item", width=64, depth=2).collect())
    assert a == b


def test_cm_mergeable_by_summing(spark):
    import pyspark.sql.functions as F

    from fs2_kinesis_firehose_spark.operators.sketches import count_min_table

    a = spark.createDataFrame([("x",)] * 7 + [("y",)] * 3, "item string")
    b = spark.createDataFrame([("x",)] * 2 + [("z",)] * 4, "item string")
    merged = (
        count_min_table(a, "item", width=32, depth=3)
        .unionByName(count_min_table(b, "item", width=32, depth=3))
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = count_min_table(a.unionByName(b), "item", width=32, depth=3)
    assert sorted(merged.collect()) == sorted(direct.collect())


def test_cm_validation(spark):
    from fs2_kinesis_firehose_spark.operators.sketches import count_min_table

    df = spark.createDataFrame([("a",)], "item string")
    with pytest.raises(ValueError):
        count_min_table(df, "item", width=1, depth=4)
    with pytest.raises(ValueError):
        count_min_table(df, "item", width=64, depth=0)


# ---------------------------------------------------------------------------
# AMS tug-of-war F2 sketch
# ---------------------------------------------------------------------------
def _ams_sign_py(item: str, r: int, salt: str = "ams") -> int:
    import hashlib

    block, pos = divmod(r, 32)
    h = hashlib.md5((item + f"|{salt}{block}").encode()).hexdigest()
    return ((int(h[:8], 16) >> pos) & 1) * 2 - 1


def test_ams_sums_match_python_mirror(spark):
    df, items = _zipf_df(spark, n=3_000, vocab=300, seed=11)
    reps = 40
    row = SK.ams_f2_sketch(df, "item", reps=reps).collect()[0]
    counts = collections.Counter(items)
    for r in range(reps):
        want = sum(c * _ams_sign_py(t, r) for t, c in counts.items())
        assert row[f"s{r}"] == want, r


def test_ams_estimate_unbiased_enough(spark):
    # Fixed hashes → deterministic; assert the median-of-means lands within
    # the 3-sigma envelope (sigma = sqrt(2/per_group) * F2 ≈ 0.35 F2).
    df, items = _zipf_df(spark, n=20_000, vocab=2_000, seed=7)
    counts = collections.Counter(items)
    f2 = sum(c * c for c in counts.values())
    est = SK.ams_f2_estimate(SK.ams_f2_sketch(df, "item", reps=80)).collect()[0]
    assert abs(est["f2_estimate"] / f2 - 1.0) < 1.0
    # median really is the middle group mean
    gs = sorted(est[f"g{g}"] for g in range(5))
    assert est["median_sq_sum"] == gs[2]


def test_ams_mergeable_by_elementwise_sum(spark):
    # Linear sketch: sketch(A ∪ B) == sketch(A) + sketch(B), exactly.
    df, items = _zipf_df(spark, n=4_000, vocab=400, seed=5)
    a = spark.createDataFrame([(s,) for s in items[:2_500]], "item string")
    b = spark.createDataFrame([(s,) for s in items[2_500:]], "item string")
    reps = 32
    whole = SK.ams_f2_sketch(df, "item", reps=reps).collect()[0]
    ra = SK.ams_f2_sketch(a, "item", reps=reps).collect()[0]
    rb = SK.ams_f2_sketch(b, "item", reps=reps).collect()[0]
    for r in range(reps):
        assert whole[f"s{r}"] == ra[f"s{r}"] + rb[f"s{r}"], r


def test_ams_nulls_ignored_and_validation(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",)], "item string")
    row = SK.ams_f2_sketch(df, "item", reps=4).collect()[0]
    for r in range(4):
        assert row[f"s{r}"] in (-2, 2)  # |sum| == count of non-null rows
    with pytest.raises(ValueError):
        SK.ams_f2_sketch(df, "item", reps=0)
    with pytest.raises(ValueError):
        SK.ams_f2_estimate(SK.ams_f2_sketch(df, "item", reps=10), reps=10, groups=4)


def test_mg_merge_compress_matches_dict_reference(spark):
    """Distributed merge-compress == the dict _compress on the summed
    weights (same (k+1)-th-largest threshold, subtract, keep-positive)."""
    import random

    rng = random.Random(3)
    a = {f"w{i}": rng.randint(1, 50) for i in range(40)}
    b = {f"w{i}": rng.randint(1, 50) for i in range(20, 60)}
    k = 25
    da = spark.createDataFrame(list(a.items()), "item string, weight long")
    db = spark.createDataFrame(list(b.items()), "item string, weight long")
    got = {r.item: r.weight for r in SK.mg_merge_compress(da, db, k).collect()}

    summed = dict(a)
    for it, w in b.items():
        summed[it] = summed.get(it, 0) + w
    expect = SK._compress(summed, k)
    assert got == expect
    assert len(got) <= k


def test_mg_merge_compress_no_op_below_k(spark):
    da = spark.createDataFrame([("x", 5), ("y", 3)], "item string, weight long")
    db = spark.createDataFrame([("y", 2), ("z", 1)], "item string, weight long")
    got = {r.item: r.weight for r in SK.mg_merge_compress(da, db, 10).collect()}
    assert got == {"x": 5, "y": 5, "z": 1}

    with pytest.raises(ValueError):
        SK.mg_merge_compress(da, db, 0)


def test_mg_fold_preserves_heavy_hitter_recall(spark):
    """Folding per-chunk summaries through mg_merge_compress must keep
    every item with frequency > n/(k+1) in the final state (the streaming
    candidate-recall guarantee)."""
    df, items = _zipf_df(spark, n=6_000, vocab=500, seed=9)
    k = 60
    chunks = [items[i : i + 1500] for i in range(0, len(items), 1500)]
    state = spark.createDataFrame([], "item string, weight long")
    for ch in chunks:
        cdf = spark.createDataFrame([(s,) for s in ch], "item string")
        state = SK.mg_merge_compress(
            state, SK.misra_gries_summaries(cdf, "item", k), k
        ).localCheckpoint(eager=True)
    survivors = {r.item for r in state.collect()}
    assert state.count() <= k
    from collections import Counter

    counts = Counter(items)
    for it, c in counts.items():
        if c > len(items) / (k + 1):
            assert it in survivors, (it, c)
