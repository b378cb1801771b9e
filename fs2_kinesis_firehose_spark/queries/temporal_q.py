"""Temporal-operator queries: bucketed interval join, hypertable-style
multi-granularity rollup (operators/temporal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fs2_kinesis_firehose_spark.operators.temporal import (
    interval_join,
    sessionize,
    time_bucket_rollup,
)
from fs2_kinesis_firehose_spark.queries import query
from fs2_kinesis_firehose_spark.tables import load_table

_HOUR_US = 3_600_000_000


@query(
    "interval_join_incident_counts",
    oracle=f"""
    WITH iv AS (
        SELECT event_id AS incident_id, epoch_us(ts) AS s
        FROM events WHERE value >= 250
    ),
    pts AS (SELECT epoch_us(ts) AS p, value FROM events)
    SELECT incident_id,
           COUNT(*) AS n_events,
           ROUND(SUM(value) * 100, 0) / 100 AS total_value
    FROM iv JOIN pts ON p >= s AND p < s + {_HOUR_US}
    GROUP BY incident_id
    """,
)
def interval_join_incident_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: each high-value event opens a 1-hour incident window;
    count (and sum value of) all events inside each window.  The operator
    buckets both sides on the hour so the plan is an EQUI hash join (one
    shuffle) instead of the BroadcastNestedLoopJoin a raw theta join
    produces."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(F.unix_micros("ts").alias("p"), F.col("value").alias("pvalue"))
    iv = ev.filter(F.col("value") >= 250).select(
        F.col("event_id").alias("incident_id"),
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(_HOUR_US)).alias("e"),
    )
    joined = interval_join(
        pts, iv, point_col="p", start_col="s", end_col="e", bucket_width=_HOUR_US
    )
    return joined.groupBy("incident_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.round(F.sum("pvalue") * 100, 0) / 100).alias("total_value"),
    )


@query(
    "user_session_stats",
    oracle="""
    WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t FROM events),
    s AS (
        SELECT user_id, event_id, t,
               CASE WHEN LAG(t) OVER w IS NULL
                      OR t - LAG(t) OVER w > 600000000 THEN 1 ELSE 0 END AS is_new
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
    ),
    sess AS (
        SELECT user_id, t,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY t, event_id) AS BIGINT)
                   AS session_id
        FROM s
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           MAX(t) - MIN(t) AS duration_us
    FROM sess
    GROUP BY user_id, session_id
    """,
)
def user_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based batch sessionization (10-minute inactivity gap): session
    count/duration per user.  Single sort+shuffle on user_id (lag + running
    sum share one window partitioning) — the batch analog of the streaming
    session window, and fully oracle-checkable unlike the state-store path."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select("user_id", "event_id", F.unix_micros("ts").alias("t"))
    s = sessionize(e, ts_col="t", key_col="user_id", gap=600_000_000, order_cols=("event_id",))
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("t") - F.min("t")).alias("duration_us"),
    )


@query(
    "hourly_daily_event_rollup",
    oracle="""
    SELECT 'hour' AS grain,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
           COUNT(*) AS n_events,
           ROUND(SUM(value) * 100, 0) / 100 AS total_value
    FROM events GROUP BY 2
    UNION ALL
    SELECT 'day',
           strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S'),
           COUNT(*),
           ROUND(SUM(value) * 100, 0) / 100
    FROM events GROUP BY 2
    """,
)
def hourly_daily_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable continuous-aggregate shape: hour AND day rollups of the
    event stream in ONE shuffle (GROUPING SETS via DataFrame.groupingSets);
    the oracle states the same result as two plain GROUP BYs."""
    ev = load_table(spark, sf_dir, "events")
    return time_bucket_rollup(
        ev,
        "ts",
        [
            F.count(F.lit(1)).alias("n_events"),
            (F.round(F.sum("value") * 100, 0) / 100).alias("total_value"),
        ],
        granularities=("hour", "day"),
    )


@query(
    "event_funnel_times",
    oracle="""
    WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
    s1 AS (
        SELECT user_id, MIN(t) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1
    ),
    s2 AS (
        SELECT e.user_id, MIN(e.t) AS t2
        FROM e JOIN s1 ON e.user_id = s1.user_id AND e.t > s1.t1
        WHERE e.event_type = 'click'
        GROUP BY 1
    ),
    s3 AS (
        SELECT e.user_id, MIN(e.t) AS t3
        FROM e JOIN s2 ON e.user_id = s2.user_id AND e.t > s2.t2
        WHERE e.event_type = 'purchase'
        GROUP BY 1
    )
    SELECT s1.user_id, s1.t1, s2.t2, s3.t3
    FROM s1
    LEFT JOIN s2 ON s1.user_id = s2.user_id
    LEFT JOIN s3 ON s1.user_id = s3.user_id
    """,
)
def event_funnel_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase conversion cascade per user: earliest
    completion of each step strictly after the previous one (epoch-µs
    longs, NULL once the funnel stalls).  Joins-and-aggregates on ONE key —
    no windows, no Python (operators/temporal.py:funnel_times)."""
    from fs2_kinesis_firehose_spark.operators.temporal import funnel_times

    ev = load_table(spark, sf_dir, "events")
    return funnel_times(ev, ["view", "click", "purchase"], key_col="user_id")


@query(
    "hourly_gap_report",
    oracle="""
    WITH base AS (
        SELECT user_id, date_trunc('hour', ts) AS bucket, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    grid AS (
        SELECT user_id,
               unnest([b0 + to_hours(CAST(i AS BIGINT))
                       FOR i IN range(0, date_diff('hour', b0, b1) + 1)]) AS bucket
        FROM (SELECT user_id, MIN(bucket) AS b0, MAX(bucket) AS b1
              FROM base GROUP BY 1)
    ),
    filled AS (
        SELECT g.user_id, g.bucket, COALESCE(b.n, 0) AS n
        FROM grid g LEFT JOIN base b USING (user_id, bucket)
    ),
    flagged AS (
        SELECT user_id, bucket, n,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY bucket) AS rn_all,
               CASE WHEN n = 0 THEN
                   ROW_NUMBER() OVER (PARTITION BY user_id, (n = 0) ORDER BY bucket)
               END AS rn_zero
        FROM filled
    ),
    runs AS (
        SELECT user_id, COUNT(*) AS run_len
        FROM flagged WHERE n = 0
        GROUP BY user_id, rn_all - rn_zero
    )
    SELECT f.user_id,
           COUNT(*) AS n_hours,
           COUNT(*) FILTER (n = 0) AS n_gap_hours,
           COALESCE(MAX(r.longest), 0) AS longest_gap
    FROM filled f
    LEFT JOIN (SELECT user_id, MAX(run_len) AS longest FROM runs GROUP BY 1) r
      USING (user_id)
    GROUP BY f.user_id
    """,
)
def hourly_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity-coverage audit per user: zero-fill the hourly series between
    each user's first and last event (operators/temporal.py:hourly_fill),
    then classic gaps-and-islands (rn_all − rn_zero) for the longest silent
    streak.  The dense grid is generated from per-key min/max of the
    AGGREGATED series — grid size is span-bounded, independent of raw event
    count."""
    from pyspark.sql.window import Window

    from fs2_kinesis_firehose_spark.operators.temporal import hourly_fill

    ev = load_table(spark, sf_dir, "events")
    filled = hourly_fill(ev, "user_id", "ts")
    w_all = Window.partitionBy("user_id").orderBy("bucket")
    w_zero = Window.partitionBy("user_id", F.col("n_events") == 0).orderBy("bucket")
    flagged = filled.select(
        "user_id",
        "n_events",
        F.row_number().over(w_all).alias("rn_all"),
        F.when(F.col("n_events") == 0, F.row_number().over(w_zero)).alias("rn_zero"),
    )
    runs = (
        flagged.where(F.col("n_events") == 0)
        .groupBy("user_id", (F.col("rn_all") - F.col("rn_zero")).alias("_island"))
        .agg(F.count(F.lit(1)).alias("run_len"))
        .groupBy("user_id")
        .agg(F.max("run_len").alias("longest"))
    )
    return (
        filled.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.count(F.when(F.col("n_events") == 0, 1)).alias("n_gap_hours"),
        )
        .join(runs, "user_id", "left")
        .select(
            "user_id",
            "n_hours",
            "n_gap_hours",
            F.coalesce(F.col("longest"), F.lit(0)).alias("longest_gap"),
        )
    )


@query(
    "cohort_retention_matrix",
    # Weeks are Monday-truncated in BOTH engines (Spark date_trunc('week')
    # and DuckDB date_trunc('week')), session timezone UTC, so the
    # day-difference is always an exact multiple of 7 and the integer cast
    # is lossless cross-engine.
    oracle="""
    WITH f AS (
        SELECT user_id, MIN(date_trunc('week', ts)) AS cw
        FROM events GROUP BY user_id
    ),
    a AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
    )
    SELECT strftime(f.cw, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', f.cw, a.w) / 7 AS BIGINT) AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM a JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
)
def cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort retention: users bucketed by first-seen week, counted
    in every later week they return — the (cohort, offset) activity matrix
    every product/engagement dashboard is built on.  Two aggregates + one
    key join, all on user_id (AQE broadcasts the cohort table when small);
    no window, no self-join of the event stream."""
    ev = load_table(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    first = ev.groupBy("user_id").agg(F.min(wk).alias("cw"))
    act = ev.select("user_id", wk.alias("w")).distinct()
    return (
        act.join(first, "user_id")
        .groupBy(
            F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.col("w"), F.col("cw")) / 7).cast("long").alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )
