"""Streaming progress capture (streaming/progress.py): listener wiring,
row-count accounting, and the rollup summary."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from fs2_kinesis_firehose_spark.streaming.progress import (
    ProgressCapture,
    throughput_summary,
)
from fs2_kinesis_firehose_spark.streaming.replay import replay_parquet, run_to_memory


def _drain_listener_bus(spark, cap, want_rows, timeout_s=20.0) -> None:
    # listener events are delivered asynchronously after the query finishes
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        if cap.rows and sum(r["num_input_rows"] for r in cap.rows) >= want_rows:
            return
        time.sleep(0.2)


def test_progress_capture_accounts_all_input_rows(spark, sf_smoke):
    with ProgressCapture(spark) as cap:
        stream = replay_parquet(spark, sf_smoke, "events")
        counts = stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
        result = run_to_memory(counts, output_mode="complete")
        total = result.agg(F.sum("n")).collect()[0][0]
        _drain_listener_bus(spark, cap, total)
    assert cap.rows, "no progress events captured"
    assert sum(r["num_input_rows"] for r in cap.rows) == total
    assert all(r["batch_id"] >= 0 for r in cap.rows)
    assert all(r["trigger_execution_ms"] >= 0 for r in cap.rows)
    # a shuffle agg runs stateful: state rows must be reported
    assert max(r["state_rows_total"] for r in cap.rows) > 0


def test_progress_df_and_summary(spark, sf_smoke):
    with ProgressCapture(spark) as cap:
        stream = replay_parquet(spark, sf_smoke, "events")
        dedup = stream.select("event_id").dropDuplicates(["event_id"])
        result = run_to_memory(dedup)
        n = result.count()
        _drain_listener_bus(spark, cap, n)
    pdf = cap.to_df(spark)
    assert pdf.schema["num_input_rows"].dataType.typeName() == "long"
    summary = throughput_summary(pdf)
    row = summary.collect()[0]
    assert row["total_rows"] == n
    assert row["n_batches"] >= 1


def test_capture_empty_is_schema_stable(spark):
    cap = ProgressCapture(spark)
    df = cap.to_df(spark)
    assert df.count() == 0
    assert "state_rows_total" in df.columns
