"""Tests for interval join and time-bucket rollup (operators/temporal.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fs2_kinesis_firehose_spark.operators.temporal import (
    interval_join,
    sessionize,
    time_bucket_rollup,
)


def _naive_pairs(points, intervals):
    out = set()
    for pid, p in points:
        for iid, s, e in intervals:
            if s <= p < e:
                out.add((pid, iid))
    return out


def test_interval_join_matches_naive_including_negatives(spark):
    # negative/boundary-heavy domain to exercise exact floor-division
    points = [(i, p) for i, p in enumerate([-25, -20, -11, -10, -1, 0, 1, 9, 10, 15, 29, 30])]
    intervals = [(100, -20, -10), (101, -10, 10), (102, 10, 30), (103, 5, 6), (104, 7, 7)]
    pdf = spark.createDataFrame(points, "pid long, p long")
    idf = spark.createDataFrame(intervals, "iid long, s long, e long")
    got = {
        (r.pid, r.iid)
        for r in interval_join(
            pdf, idf, point_col="p", start_col="s", end_col="e", bucket_width=10
        ).collect()
    }
    assert got == _naive_pairs(points, intervals)  # empty interval 104 matches nothing


def test_interval_join_rejects_bad_width(spark):
    df = spark.createDataFrame([(1, 1)], "a long, b long")
    with pytest.raises(ValueError):
        interval_join(df, df, point_col="a", start_col="a", end_col="b", bucket_width=0)


def test_interval_join_plan_is_equi_not_bnlj(spark):
    pdf = spark.createDataFrame([(1, 5)], "pid long, p long")
    idf = spark.createDataFrame([(9, 0, 10)], "iid long, s long, e long")
    plan = (
        interval_join(pdf, idf, point_col="p", start_col="s", end_col="e", bucket_width=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan


def test_sessionize_gap_splits(spark):
    # user 1: events at t=0,5,8 (gap≤10 → one session), t=100 (new session)
    # user 2: single event
    rows = [(1, 10, 0), (1, 11, 5), (1, 12, 8), (1, 13, 100), (2, 14, 3)]
    df = spark.createDataFrame(rows, "user long, eid long, t long")
    out = {
        r.eid: r.session_id
        for r in sessionize(
            df, ts_col="t", key_col="user", gap=10, order_cols=("eid",)
        ).collect()
    }
    assert out == {10: 1, 11: 1, 12: 1, 13: 2, 14: 1}


def test_sessionize_single_shuffle(spark):
    df = spark.createDataFrame([(1, 10, 0)], "user long, eid long, t long")
    plan = (
        sessionize(df, ts_col="t", key_col="user", gap=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1  # lag + sum share one window


def test_time_bucket_rollup_grains(spark):
    rows = [
        (1, "2024-01-01 10:15:00", 2.0),
        (2, "2024-01-01 10:45:00", 3.0),
        (3, "2024-01-01 11:05:00", 5.0),
        (4, "2024-01-02 00:30:00", 7.0),
    ]
    df = spark.createDataFrame(rows, "id long, ts_s string, v double").select(
        "id", F.to_timestamp("ts_s").alias("ts"), "v"
    )
    out = time_bucket_rollup(
        df, "ts", [F.count(F.lit(1)).alias("n"), F.sum("v").alias("total")]
    )
    got = {(r.grain, r.bucket): (r.n, r.total) for r in out.collect()}
    assert got[("hour", "2024-01-01 10:00:00")] == (2, 5.0)
    assert got[("hour", "2024-01-01 11:00:00")] == (1, 5.0)
    assert got[("day", "2024-01-01 00:00:00")] == (3, 10.0)
    assert got[("day", "2024-01-02 00:00:00")] == (1, 7.0)
    assert len(got) == 5  # 3 hour buckets + 2 day buckets


def test_time_bucket_rollup_single_shuffle(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 10:15:00", 2.0)], "id long, ts_s string, v double"
    ).select(F.to_timestamp("ts_s").alias("ts"), "v")
    plan = (
        time_bucket_rollup(df, "ts", [F.count(F.lit(1)).alias("n")])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # grouping-sets expand feeds ONE exchange (plus AQE reader nodes), not
    # one scan+shuffle per grain
    assert plan.count("Exchange hashpartitioning") == 1


# --- funnel_times ----------------------------------------------------------


def test_funnel_strict_order_and_stall(spark):
    import datetime as dt

    import pytest as _pytest

    from fs2_kinesis_firehose_spark.operators.temporal import funnel_times

    def ts(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    rows = [
        # user 1 converts fully: view@1, click@5, purchase@7
        (1, "view", ts(1)), (1, "click", ts(5)), (1, "purchase", ts(7)),
        # earlier click (before view) must NOT count; later one does
        (2, "click", ts(1)), (2, "view", ts(2)), (2, "click", ts(9)),
        # user 3 stalls after view (purchase before click doesn't count)
        (3, "view", ts(1)), (3, "purchase", ts(2)),
        # user 4: click at the SAME instant as view — strict '>' rejects it
        (4, "view", ts(3)), (4, "click", ts(3)),
        # user 5 never views → absent from output
        (5, "click", ts(1)), (5, "purchase", ts(2)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {r["user_id"]: (r["t1"], r["t2"], r["t3"])
           for r in funnel_times(df, ["view", "click", "purchase"]).collect()}

    def us(s):
        return int(dt.datetime(2024, 1, 1, 0, 0, s, tzinfo=dt.timezone.utc)
                   .timestamp() * 1_000_000)

    assert set(out) == {1, 2, 3, 4}
    assert out[1] == (us(1), us(5), us(7))
    assert out[2] == (us(2), us(9), None)
    assert out[3] == (us(1), None, None)
    assert out[4] == (us(3), None, None)
    with _pytest.raises(ValueError):
        funnel_times(df, ["view"])


def test_hourly_fill_zero_buckets(spark):
    import datetime as dt

    from fs2_kinesis_firehose_spark.operators.temporal import hourly_fill

    def ts(h, m=0):
        return dt.datetime(2024, 1, 1, h, m)

    rows = [
        (1, ts(0, 10)), (1, ts(0, 50)),      # hour 0: 2 events
        (1, ts(3, 5)),                        # hours 1-2: gaps, hour 3: 1
        (2, ts(5)),                           # single event → single bucket
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(r["user_id"], r["bucket"].hour): r["n_events"]
           for r in hourly_fill(df, "user_id", "ts").collect()}
    assert out == {(1, 0): 2, (1, 1): 0, (1, 2): 0, (1, 3): 1, (2, 5): 1}
