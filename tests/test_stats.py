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
