"""column_stats vs hand-computed values, incl. nulls and type dispatch."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from fs2_kinesis_firehose_spark.operators.stats import column_stats


def test_column_stats_types_and_nulls(spark):
    rows = [
        Row(i=1, s="ab", d=1.5, dt=datetime.date(2020, 1, 2)),
        Row(i=None, s=None, d=2.5, dt=None),
        Row(i=3, s="xyz", d=None, dt=datetime.date(2020, 1, 1)),
        Row(i=3, s="ab", d=2.5, dt=datetime.date(2020, 1, 2)),
    ]
    r = column_stats(spark.createDataFrame(rows)).collect()[0]
    assert r.n_rows == 4
    assert (r.i_nulls, r.i_ndv, r.i_min, r.i_max) == (1, 2, 1, 3)
    assert (r.s_nulls, r.s_ndv, r.s_sumlen) == (1, 2, 7)
    assert (r.d_nulls, r.d_ndv, r.d_min, r.d_max) == (1, 2, 1.5, 2.5)
    assert (r.dt_nulls, r.dt_ndv, r.dt_min, r.dt_max) == (
        1, 2, datetime.date(2020, 1, 1), datetime.date(2020, 1, 2),
    )
    # strings get sumlen, not min/max; no stray columns
    assert "s_min" not in r.asDict() and "i_sumlen" not in r.asDict()


def test_column_stats_subset(spark):
    df = spark.createDataFrame([Row(a=1, b="x")])
    r = column_stats(df, ["a"]).collect()[0]
    assert set(r.asDict()) == {"n_rows", "a_nulls", "a_ndv", "a_min", "a_max"}


def test_key_skew_report_values(spark):
    from fs2_kinesis_firehose_spark.operators.stats import key_skew_report

    rows = [Row(k="a")] * 6 + [Row(k="b")] * 3 + [Row(k="c")]
    r = key_skew_report(spark.createDataFrame(rows), "k", top_n=2).collect()[0]
    assert (r.n_keys, r.n_rows, r.max_rows_per_key) == (3, 10, 6)
    assert r.avg_rows_per_key == round(10 / 3, 6)
    assert r.skew_ratio == round(6 / (10 / 3), 6)
    assert (r.topn_rows, r.topn_share) == (9, 0.9)


def test_key_skew_report_uniform_keys(spark):
    from fs2_kinesis_firehose_spark.operators.stats import key_skew_report

    rows = [Row(k=i % 4) for i in range(8)]
    r = key_skew_report(spark.createDataFrame(rows), "k", top_n=10).collect()[0]
    # perfectly balanced: skew_ratio 1.0, top-N covers everything
    assert r.skew_ratio == 1.0
    assert (r.topn_rows, r.topn_share) == (8, 1.0)
