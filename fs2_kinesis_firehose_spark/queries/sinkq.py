"""Tier A — Firehose-sink delivery accounting through the correctness harness.

Runs the REAL produce pipe (serialize → frame → ≤500 slicing → put with
retry) against the in-memory fake client, then returns delivery totals whose
arithmetic a SQL oracle can reproduce (request count = ceil(n/500) at
parallelism=1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fs2_kinesis_firehose_spark.firehose.client import fake_client_factory
from fs2_kinesis_firehose_spark.firehose.serializers import serialize_and_frame
from fs2_kinesis_firehose_spark.firehose.settings import ProducerSettings
from fs2_kinesis_firehose_spark.firehose.sink import produce_acks
from fs2_kinesis_firehose_spark.queries import query
from fs2_kinesis_firehose_spark.tables import load_table


@query(
    "firehose_delivery_accounting",
    oracle="""
    SELECT CAST(CEIL(COUNT(*) / 500.0) AS BIGINT) AS n_requests,
           COUNT(*) AS n_records,
           CAST(0 AS BIGINT) AS failed_records
    FROM events
    """,
)
def firehose_delivery_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → JSON+newline framing → produce pipe (parallelism=1 makes the
    request count exactly ceil(n/500), the reference's A2 batch bound)."""
    events = load_table(spark, sf_dir, "events")
    framed = serialize_and_frame(events.select("event_id", "event_type"), "json", b"\n")
    settings = ProducerSettings(stream_name="accounting", parallelism=1)
    acks = produce_acks(framed, settings, fake_client_factory())
    return acks.agg(
        F.count(F.lit(1)).alias("n_requests"),
        F.sum("n_records").alias("n_records"),
        F.sum("failed_records").alias("failed_records"),
    )


@query(
    "kinesis_roundtrip_counts",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def kinesis_roundtrip_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full write+read loop: events → JSON framing → produce pipe → spool →
    ``format("kinesis_spool")`` READ (shard = spool file, seq = byte offset)
    → JSON parse → aggregate.  The oracle is the plain per-type counts, so a
    hash-match proves byte-exact round-trip fidelity of the sink+source pair
    — the read path the reference lacks.

    EAGER by necessity (unlike every other registry entry): the read side
    needs the spool populated, so construction runs the produce job.  The
    spool path is DETERMINISTIC per sf_dir under one managed tmp root and is
    wiped before each delivery — repeated catalog sweeps/bench passes reuse
    the same directory instead of leaking a fresh mkdtemp per invocation."""
    import hashlib
    import shutil
    import tempfile
    from pathlib import Path

    from fs2_kinesis_firehose_spark.sources import register_kinesis_spool_source

    spool_dir = (
        Path(tempfile.gettempdir())
        / "fs2spark-spools"
        / f"roundtrip-{hashlib.sha256(sf_dir.encode()).hexdigest()[:12]}"
    )
    if spool_dir.exists():
        shutil.rmtree(spool_dir)
    spool_dir.mkdir(parents=True)
    spool = str(spool_dir)
    events = load_table(spark, sf_dir, "events")
    framed = serialize_and_frame(events.select("event_id", "event_type"), "json", b"\n")
    # parallelism=8: the A5 in-flight bound is a tunable, and 2 writer tasks
    # serialize the whole table at larger SFs (the sf1 smoke was
    # overhead-bound at 2).  The oracle (per-type counts) is
    # parallelism-invariant; more spool shards also widen the read side.
    settings = ProducerSettings(stream_name="roundtrip", parallelism=8)
    # deliver (eager: the read below needs the spool populated)
    produce_acks(framed, settings, fake_client_factory(spool_dir=spool)).count()

    register_kinesis_spool_source(spark)
    back = spark.read.format("kinesis_spool").option("spoolDir", spool).load()
    parsed = back.select(
        F.get_json_object(F.col("value").cast("string"), "$.event_type").alias("event_type")
    )
    return parsed.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))
