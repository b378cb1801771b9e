"""As-of join semantics: <= inclusivity, no-prior-row nulls, carry-forward."""

from __future__ import annotations

import datetime as dt

from fs2_kinesis_firehose_spark.operators.asof import asof_join


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_asof_basic_semantics(spark):
    left = spark.createDataFrame(
        [(1, _ts(9)), (1, _ts(12)), (1, _ts(18)), (2, _ts(12))],
        "k long, t timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 100.0), (1, _ts(12), 120.0), (1, _ts(15), 150.0), (3, _ts(1), 999.0)],
        "k long, rt timestamp, px double",
    )
    out = {
        (r.k, r.t.hour): r.px_asof
        for r in asof_join(
            left, right, key="k", left_time="t", right_time="rt", value_cols=["px"]
        ).collect()
    }
    assert out[(1, 9)] is None  # no right row at or before 09:00
    assert out[(1, 12)] == 120.0  # equal timestamp included (<=)
    assert out[(1, 18)] == 150.0  # most recent prior, not first
    assert out[(2, 12)] is None  # key with no right rows at all


def test_asof_preserves_left_rowcount(spark, sf_smoke):
    from pyspark.sql import functions as F

    from fs2_kinesis_firehose_spark.tables import load_table

    e = load_table(spark, sf_smoke, "events").select(
        "event_id", (F.col("user_id") % 1500).alias("custkey"), "ts"
    )
    o = load_table(spark, sf_smoke, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_orderdate", "o_totalprice"
    )
    joined = asof_join(
        e, o, key="custkey", left_time="ts", right_time="o_orderdate", value_cols=["o_totalprice"]
    )
    assert joined.count() == e.count()  # left join: every left row exactly once


def test_asof_tolerance_nulls_stale_matches_keeps_rows(spark):
    """Numeric axis: matches older than the tolerance are NULLed, the left
    row survives; fresh matches are untouched; rows with no prior match
    stay NULL as before."""
    from pyspark.sql import functions as F

    from fs2_kinesis_firehose_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k", 5), ("k", 50), ("k", 1)], "key string, t long"
    )
    right = spark.createDataFrame([("k", 3, 30.0)], "key string, rt long, v double")
    out = asof_join(
        left, right, key="key", left_time="t", right_time="rt",
        value_cols=["v"], tolerance=F.lit(10),
    )
    got = {r.t: r.v_asof for r in out.collect()}
    assert got == {5: 30.0, 50: None, 1: None}  # fresh / stale / no-prior


def test_asof_tolerance_timestamp_interval(spark):
    from datetime import datetime

    from pyspark.sql import functions as F

    from fs2_kinesis_firehose_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k", datetime(2024, 1, 10)), ("k", datetime(2024, 3, 1))],
        "key string, t timestamp",
    )
    right = spark.createDataFrame(
        [("k", datetime(2024, 1, 1), 7.0)], "key string, rt timestamp, v double"
    )
    out = asof_join(
        left, right, key="key", left_time="t", right_time="rt",
        value_cols=["v"], tolerance=F.expr("INTERVAL 30 DAYS"),
    )
    got = {r.t: r.v_asof for r in out.collect()}
    assert got[datetime(2024, 1, 10)] == 7.0   # 9 days old: fresh
    assert got[datetime(2024, 3, 1)] is None   # 60 days old: stale
