"""Structured Streaming queries exercised through the correctness harness.

Each callable replays a fixture parquet through ``readStream`` (file source,
``availableNow`` trigger) into a memory sink and returns the materialized
result — the REAL streaming engine (state store, watermarks, session
merging) runs, while the final answer stays DuckDB-oracle-able.

Aggregations use ``complete`` output mode so every window is flushed at
stream end (append mode would hold back windows the watermark hasn't passed
— that late-data behavior is pytest-covered in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fs2_kinesis_firehose_spark.queries import query
from fs2_kinesis_firehose_spark.streaming.replay import replay_parquet, run_to_memory
from fs2_kinesis_firehose_spark.streaming.windows import (
    session_counts,
    sliding_value_stats,
    stream_dedup,
    tumbling_counts,
)
from fs2_kinesis_firehose_spark.tables import load_table


@query(
    "streaming_tumbling_counts",
    oracle="""
    SELECT strftime(make_timestamp(CAST(FLOOR(epoch(ts) / 600) * 600 AS BIGINT) * 1000000),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling event-time windows per event_type, via the real
    streaming engine (windows align to epoch, same as the oracle's floor)."""
    stream = replay_parquet(spark, sf_dir, "events")
    return run_to_memory(tumbling_counts(stream), output_mode="complete")


@query(
    "streaming_sliding_stats",
    oracle="""
    WITH offsets AS (SELECT UNNEST([0, 600]) AS off)
    SELECT strftime(make_timestamp(
               (CAST(FLOOR((epoch(ts) - off) / 1200) AS BIGINT) * 1200 + off) * 1000000),
               '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n_events,
           ROUND(SUM(value) * 100) / (100 * COUNT(*)) AS avg_value
    FROM events, offsets
    WHERE epoch(ts) >= CAST(FLOOR((epoch(ts) - off) / 1200) AS BIGINT) * 1200 + off
    GROUP BY 1
    """,
)
def streaming_sliding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-minute windows sliding by 10 — every event lands in exactly 2
    windows; the oracle enumerates both slide phases."""
    stream = replay_parquet(spark, sf_dir, "events")
    return run_to_memory(sliding_value_stats(stream), output_mode="complete")


@query(
    "streaming_session_counts",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w >= INTERVAL 5 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    islands AS (
        SELECT user_id, ts,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM marked
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events
    FROM islands
    GROUP BY user_id, sess_id
    """,
)
def streaming_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (5-minute gap) per user via the streaming session
    state; the oracle is the classic gaps-and-islands rewrite.  A new session
    starts when the gap is ≥ the timeout (Spark session end is exclusive)."""
    stream = replay_parquet(spark, sf_dir, "events")
    return run_to_memory(session_counts(stream), output_mode="complete")


@query(
    "streaming_dedup_counts",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def streaming_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The source is replayed TWICE (duplicate delivery, the at-least-once
    reality of A8-style retries); streaming dropDuplicates restores
    exactly-once counts — so the oracle is the plain single-copy counts."""
    stream = replay_parquet(spark, sf_dir, "events", copies=2)
    deduped = run_to_memory(stream_dedup(stream, watermark=None), output_mode="append")
    return deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))


@query(
    "streaming_static_join_revenue",
    oracle="""
    SELECT n.n_name,
           COUNT(*) AS n_events,
           ROUND(SUM(e.value), 2) AS total_value
    FROM events e
    JOIN nation n ON e.user_id % 25 = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def streaming_static_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: unbounded events enriched with a broadcast static
    dimension inside the streaming plan, then aggregated."""
    stream = replay_parquet(spark, sf_dir, "events")
    nation = load_table(spark, sf_dir, "nation")
    joined = stream.join(
        F.broadcast(nation), stream.user_id % 25 == nation.n_nationkey
    )
    agg = joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    return run_to_memory(agg, output_mode="complete")


@query(
    "streaming_stream_stream_join",
    oracle="""
    SELECT p.user_id,
           p.event_id AS trigger_id,
           c.event_id AS touch_id
    FROM events p
    JOIN events c
      ON p.event_type = 'purchase' AND c.event_type = 'click'
     AND p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts <= p.ts
    """,
)
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM inner join (attribution): purchases matched to same-user
    clicks in the 10 minutes before them.  Both sides are unbounded streaming
    readers with watermarks; the time-range predicate bounds the join state
    to O(users × window).  Full replay makes the emitted matches equal the
    batch join, which the oracle states."""
    from fs2_kinesis_firehose_spark.streaming.joins import attribution_join

    s1 = replay_parquet(spark, sf_dir, "events")
    s2 = replay_parquet(spark, sf_dir, "events")  # self-join needs 2 readers
    return run_to_memory(attribution_join(s1, s2), output_mode="append")


@query(
    "streaming_stateful_user_stats",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY user_id
    """,
)
def streaming_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom per-key streaming state via applyInPandasWithState: with a
    single-file replay (one micro-batch) the final state equals the batch
    aggregate, which the oracle checks; multi-batch accumulation semantics
    are pytest-covered (tests/test_streaming.py)."""
    from fs2_kinesis_firehose_spark.streaming.stateful import running_user_stats

    stream = replay_parquet(spark, sf_dir, "events")
    return run_to_memory(running_user_stats(stream), output_mode="update")
