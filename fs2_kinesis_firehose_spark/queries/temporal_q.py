"""Temporal-operator queries: bucketed interval join, hypertable-style
multi-granularity rollup (operators/temporal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fs2_kinesis_firehose_spark.operators.temporal import interval_join, time_bucket_rollup
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
