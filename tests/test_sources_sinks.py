"""Tier B sources/sinks row: rate streaming source, parquet streaming sink,
memory sink (used throughout), console excluded (side-effect only)."""

from __future__ import annotations

from fs2_kinesis_firehose_spark.streaming.replay import replay_parquet


def test_rate_source_produces_rows(spark):
    stream = spark.readStream.format("rate").option("rowsPerSecond", "500").load()
    q = (
        stream.writeStream.format("memory")
        .queryName("rate_mem")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        import time

        deadline = time.time() + 20
        while time.time() < deadline and spark.table("rate_mem").count() == 0:
            time.sleep(0.5)
        assert spark.table("rate_mem").count() > 0
        assert set(spark.table("rate_mem").columns) == {"timestamp", "value"}
    finally:
        q.stop()


def test_console_sink_runs(spark, sf_smoke):
    stream = replay_parquet(spark, sf_smoke, "events")
    q = (
        stream.select("event_id")
        .writeStream.format("console")
        .option("numRows", "1")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert q.lastProgress is not None


def test_parquet_streaming_sink_roundtrip(spark, sf_smoke, tmp_path):
    out = str(tmp_path / "out")
    stream = replay_parquet(spark, sf_smoke, "events")
    q = (
        stream.select("event_id", "event_type", "value")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from fs2_kinesis_firehose_spark.tables import load_table

    written = spark.read.parquet(out)
    assert written.count() == load_table(spark, sf_smoke, "events").count()
    assert set(written.columns) == {"event_id", "event_type", "value"}


def test_idempotent_parquet_sink_replay_safe(spark, tmp_path):
    """Replaying the SAME batch id must overwrite its own partition, not
    append a duplicate — at-least-once + idempotent sink = exactly-once."""
    from fs2_kinesis_firehose_spark.streaming.sinks import idempotent_parquet_sink

    out = str(tmp_path / "out")
    sink = idempotent_parquet_sink(out)
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    b1 = spark.createDataFrame([(3, "c")], "id long, v string")
    sink(b0, 0)
    sink(b0, 0)  # replay of batch 0 (failure-recovery path)
    sink(b1, 1)
    got = sorted((r.id, r.v) for r in spark.read.parquet(out).collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]


def test_idempotent_sink_wired_into_streaming_query(spark, sf_smoke, tmp_path):
    from fs2_kinesis_firehose_spark.streaming.replay import replay_parquet
    from fs2_kinesis_firehose_spark.streaming.sinks import idempotent_parquet_sink

    out = str(tmp_path / "out")
    stream = replay_parquet(spark, sf_smoke, "events")
    q = (
        stream.select("event_id", "event_type")
        .writeStream.foreachBatch(idempotent_parquet_sink(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n = spark.read.parquet(out).count()
    from fs2_kinesis_firehose_spark.tables import load_table

    assert n == load_table(spark, sf_smoke, "events").count()
