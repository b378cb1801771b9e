"""grouped_lower_median / mad_outlier_stats vs a Python brute force."""

from __future__ import annotations

import random

from pyspark.sql import Row

from fs2_kinesis_firehose_spark.operators.robust import (
    grouped_lower_median,
    mad_outlier_stats,
)


def _lower_median(xs: list[float]) -> float:
    s = sorted(xs)
    return s[(len(s) + 1) // 2 - 1]


def _brute(data: dict[str, list[float]], c: float = 3.0):
    out = {}
    for g, xs in data.items():
        med = _lower_median(xs)
        devs = [abs(x - med) for x in xs]
        mad = _lower_median(devs)
        out[g] = (len(xs), med, mad, sum(1 for d in devs if d > c * mad))
    return out


def _make_df(spark, data):
    rows = [Row(g=g, v=float(x)) for g, xs in data.items() for x in xs]
    return spark.createDataFrame(rows)


def test_grouped_median_odd_even_ties(spark):
    data = {
        "odd": [3.0, 1.0, 2.0],
        "even": [4.0, 1.0, 3.0, 2.0],  # lower median = 2
        "ties": [5.0, 5.0, 5.0, 1.0],
        "single": [7.0],
    }
    got = {
        r.g: r.median
        for r in grouped_lower_median(_make_df(spark, data), "g", "v").collect()
    }
    assert got == {g: _lower_median(xs) for g, xs in data.items()}


def test_mad_outliers_random_matches_bruteforce(spark):
    rng = random.Random(11)
    data = {
        f"g{i}": [round(rng.gauss(0, 1), 3) for _ in range(rng.randint(1, 400))]
        for i in range(6)
    }
    data["spiky"] = [0.0] * 50 + [100.0, -100.0]  # mad 0 => every non-median flagged
    got = {
        r.g: (r.n, r.median, r.mad, r.n_outliers)
        for r in mad_outlier_stats(_make_df(spark, data), "g", "v").collect()
    }
    assert got == _brute(data)


def test_nulls_excluded(spark):
    df = spark.createDataFrame(
        [Row(g="a", v=1.0), Row(g="a", v=None), Row(g="a", v=3.0), Row(g="a", v=2.0)]
    )
    rows = mad_outlier_stats(df, "g", "v").collect()
    assert rows[0].n == 3 and rows[0].median == 2.0
