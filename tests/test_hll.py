"""HyperLogLog register-table sketch (operators/hll.py): merge exactness,
determinism, estimate accuracy, and the linear-counting branch."""

from __future__ import annotations

import math

import pytest

from fs2_kinesis_firehose_spark.operators.hll import (
    hll_estimate,
    hll_merge,
    hll_table,
)


def _regs(df):
    return sorted((r.bucket, r.rho) for r in df.collect())


def test_merge_of_disjoint_halves_equals_full(spark):
    df = spark.range(10_000).selectExpr("CAST(id AS STRING) AS item")
    full = hll_table(df, "item")
    a = hll_table(df.where("CAST(item AS BIGINT) % 2 = 0"), "item")
    b = hll_table(df.where("CAST(item AS BIGINT) % 2 = 1"), "item")
    assert _regs(hll_merge(a, b)) == _regs(full)


def test_merge_of_overlapping_slices_equals_full(spark):
    df = spark.range(5_000).selectExpr("CAST(id AS STRING) AS item")
    full = hll_table(df, "item")
    a = hll_table(df.where("CAST(item AS BIGINT) < 4000"), "item")
    b = hll_table(df.where("CAST(item AS BIGINT) >= 1000"), "item")
    assert _regs(hll_merge(a, b)) == _regs(full)


def test_duplicates_do_not_change_registers(spark):
    df = spark.range(2_000).selectExpr("CAST(id AS STRING) AS item")
    dup = df.unionAll(df).unionAll(df)
    assert _regs(hll_table(dup, "item")) == _regs(hll_table(df, "item"))


def test_estimate_within_3_sigma(spark):
    n = 50_000
    df = spark.range(n).selectExpr("CAST(id AS STRING) AS item")
    est = hll_estimate(hll_table(df, "item")).collect()[0]
    sigma = 1.04 / math.sqrt(4096)
    assert abs(est.estimate / n - 1.0) < 3 * sigma
    # scaled_sum is exact: re-derive the harmonic mean estimate from it
    assert est.scaled_sum > 0 and est.n_nonzero <= 4096


def test_linear_counting_small_range(spark):
    # 30 distinct items → raw estimate far below 2.5m, zeros present:
    # linear counting is near-exact at this range
    df = spark.range(30).selectExpr("CAST(id AS STRING) AS item")
    est = hll_estimate(hll_table(df, "item")).collect()[0]
    assert est.n_nonzero == 30  # no bucket collisions at 30/4096 w.h.p.
    assert abs(est.estimate - 30) < 1.0


def test_nulls_ignored(spark):
    df = spark.createDataFrame([("a",), (None,), ("b",), (None,)], "item string")
    est = hll_estimate(hll_table(df, "item")).collect()[0]
    assert est.n_nonzero == 2


def test_p_out_of_range_rejected(spark):
    df = spark.range(1).selectExpr("CAST(id AS STRING) AS item")
    with pytest.raises(ValueError):
        hll_table(df, "item", p=3)
    with pytest.raises(ValueError):
        hll_estimate(hll_table(df, "item"), p=30)


def test_empty_input_estimates_zero_distinct(spark):
    df = spark.range(0).selectExpr("CAST(id AS STRING) AS item")
    est = hll_estimate(hll_table(df, "item")).collect()[0]
    assert est.n_nonzero == 0
    # all-zero registers → linear counting m*ln(m/m) = 0
    assert est.estimate == 0.0


def test_registers_exact_for_hash_words_at_and_above_2_53(spark):
    """Regression (r8 fix, hll.py:85): the bucket shift must be exact
    integer F.shiftright, not double division — for 60-bit hash words
    >= 2^53 an IEEE `h / m` rounds at 53 bits and can move w across a
    multiple-of-m boundary, desyncing rho.  Pin every register against a
    pure-Python `hv >> p` mirror on items whose hash exceeds 2^53."""
    import hashlib

    p, salt, bits = 12, "hll", 60
    items, mirror = [], {}
    i = 0
    while len(items) < 64:
        s = str(i)
        i += 1
        hv = int(hashlib.md5(f"{s}|{salt}".encode()).hexdigest()[:15], 16)
        if hv < 2**53:  # keep only the hashes the old float path could break
            continue
        items.append(s)
        w = hv >> p
        rho = (bits - p + 1) if w == 0 else (bits - p) - w.bit_length() + 1
        b = hv % (1 << p)
        mirror[b] = max(mirror.get(b, 0), rho)
    df = spark.createDataFrame([(s,) for s in items], "item string")
    assert _regs(hll_table(df, "item", p=p, salt=salt)) == sorted(mirror.items())
