"""Distributed Bloom filter (operators/bloom.py): no false negatives,
bounded false positives, prefilter+exact-join equivalence."""

from __future__ import annotations

import pytest

from fs2_kinesis_firehose_spark.operators import bloom as B


@pytest.fixture(scope="module")
def keys_df(spark):
    return spark.createDataFrame(
        [(i,) for i in range(0, 4000, 2)], "k long"
    ).repartition(6)  # evens 0..3998


def test_no_false_negatives(spark, keys_df):
    bm = B.bloom_build(keys_df, "k", n_bits=1 << 16, n_hashes=5)
    probe = spark.createDataFrame([(i,) for i in range(0, 4000, 2)], "k long")
    kept = B.bloom_prefilter(probe, "k", bm, n_bits=1 << 16, n_hashes=5)
    assert kept.count() == probe.count()  # every true key passes


def test_false_positive_rate_bounded(spark, keys_df):
    n_bits, n_hashes = 1 << 16, 5
    bm = B.bloom_build(keys_df, "k", n_bits=n_bits, n_hashes=n_hashes)
    absent = spark.createDataFrame([(i,) for i in range(1, 8000, 2)], "k long")
    fp = B.bloom_prefilter(absent, "k", bm, n_bits=n_bits, n_hashes=n_hashes).count()
    est = B.expected_fpp(2000, n_bits, n_hashes)
    assert fp / 4000 < max(4 * est, 0.02)


def test_prefilter_then_join_equals_plain_join(spark, keys_df):
    import pyspark.sql.functions as F

    fact = spark.createDataFrame(
        [(i % 5000, i) for i in range(20000)], "k long, v long"
    ).repartition(8)
    bm = B.bloom_build(keys_df, "k", n_bits=1 << 16, n_hashes=5)
    pre = B.bloom_prefilter(fact, "k", bm, n_bits=1 << 16, n_hashes=5)
    a = sorted(pre.join(keys_df, "k", "left_semi").collect())
    b = sorted(fact.join(keys_df, "k", "left_semi").collect())
    assert a == b and len(a) > 0
    # NULL keys are dropped by the prefilter contract
    with_null = fact.union(spark.createDataFrame([(None, 1)], "k long, v long"))
    assert B.bloom_prefilter(with_null, "k", bm, n_bits=1 << 16, n_hashes=5).where(
        F.col("k").isNull()
    ).count() == 0


def test_fold_rows_bounded_and_partition_invariant(spark, keys_df):
    # the driver-side fold collects WORD rows, bounded by the bitmap size
    # (n_bits/64) and independent of the task count — the two-level-fold
    # contract that keeps a 10k-task build from choking the driver
    n_bits, n_hashes = 1 << 16, 5
    rows = B._word_rows(keys_df, "k", n_bits=n_bits, n_hashes=n_hashes).count()
    assert rows <= n_bits // 64
    rows48 = B._word_rows(
        keys_df.repartition(48), "k", n_bits=n_bits, n_hashes=n_hashes
    ).count()
    assert rows == rows48  # fold output is the bitmap, not per-partition state
    # and the bitmap itself is bit-identical across partitionings
    bm1 = B.bloom_build(keys_df.coalesce(1), "k", n_bits=n_bits, n_hashes=n_hashes)
    bm48 = B.bloom_build(
        keys_df.repartition(48), "k", n_bits=n_bits, n_hashes=n_hashes
    )
    assert bm1 == bm48


def test_validation(spark, keys_df):
    with pytest.raises(ValueError):
        B.bloom_build(keys_df, "k", n_bits=1001)
    bm = B.bloom_build(keys_df, "k", n_bits=1 << 16)
    with pytest.raises(ValueError):
        B.bloom_prefilter(keys_df, "k", bm, n_bits=1 << 20)
