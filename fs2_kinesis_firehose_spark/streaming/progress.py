"""Streaming observability: query-progress capture as a DataFrame.

The reference library's ack stream is its only runtime signal
(`firehose.scala:69` — one `PutRecordBatchResult` per request).  A Spark
engine has a much richer built-in channel: every micro-batch emits a
``StreamingQueryProgress`` event (rows/sec, batch duration, watermark,
state-store rows).  This module turns that event stream into a queryable
DataFrame so pipeline health lives in the same engine as the pipelines —
the Spark-first replacement for bolting a metrics sidecar onto the job.

Listener callbacks run on the driver and only append tiny dicts (one per
micro-batch), so capture overhead is negligible at any data scale: progress
volume grows with batch COUNT, never with data size.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PROGRESS_SCHEMA = StructType(
    [
        StructField("query_id", StringType()),
        StructField("run_id", StringType()),
        StructField("query_name", StringType()),
        StructField("batch_id", LongType()),
        StructField("timestamp", StringType()),
        StructField("num_input_rows", LongType()),
        StructField("input_rows_per_second", DoubleType()),
        StructField("processed_rows_per_second", DoubleType()),
        StructField("trigger_execution_ms", LongType()),
        StructField("add_batch_ms", LongType()),
        StructField("state_rows_total", LongType()),
        StructField("state_rows_updated", LongType()),
        StructField("watermark", StringType()),
    ]
)


def _flatten(progress: Any) -> dict[str, Any]:
    """One row per micro-batch from a StreamingQueryProgress (via its json
    form — stable public surface across Spark versions)."""
    p = json.loads(progress.json) if hasattr(progress, "json") else dict(progress)
    durations = p.get("durationMs", {}) or {}
    states = p.get("stateOperators", []) or []
    return {
        "query_id": str(p.get("id")),
        "run_id": str(p.get("runId")),
        "query_name": p.get("name"),
        "batch_id": int(p.get("batchId", -1)),
        "timestamp": p.get("timestamp"),
        "num_input_rows": int(p.get("numInputRows", 0)),
        "input_rows_per_second": float(p.get("inputRowsPerSecond") or 0.0),
        "processed_rows_per_second": float(p.get("processedRowsPerSecond") or 0.0),
        "trigger_execution_ms": int(durations.get("triggerExecution", 0)),
        "add_batch_ms": int(durations.get("addBatch", 0)),
        "state_rows_total": int(sum(s.get("numRowsTotal", 0) for s in states)),
        "state_rows_updated": int(sum(s.get("numRowsUpdated", 0) for s in states)),
        "watermark": (p.get("eventTime") or {}).get("watermark"),
    }


class ProgressCapture(StreamingQueryListener):
    """Accumulates per-micro-batch progress rows; driver-side, bounded by
    batch count.  Use as a context manager::

        with ProgressCapture(spark) as cap:
            ... run streaming queries ...
        cap.to_df(spark).show()
    """

    def __init__(self, spark: SparkSession) -> None:
        self._spark = spark
        self.rows: list[dict[str, Any]] = []
        self.terminated: list[str] = []

    # StreamingQueryListener interface -------------------------------------
    def onQueryStarted(self, event: Any) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event: Any) -> None:  # noqa: N802
        self.rows.append(_flatten(event.progress))

    def onQueryIdle(self, event: Any) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event: Any) -> None:  # noqa: N802
        self.terminated.append(str(event.id))

    # lifecycle ------------------------------------------------------------
    def __enter__(self) -> "ProgressCapture":
        self._spark.streams.addListener(self)
        return self

    def __exit__(self, *exc: Any) -> None:
        self._spark.streams.removeListener(self)

    def to_df(self, spark: SparkSession | None = None) -> DataFrame:
        """The captured progress as a DataFrame (empty-safe, fixed schema)."""
        s = spark or self._spark
        return s.createDataFrame(self.rows, PROGRESS_SCHEMA)


def throughput_summary(progress_df: DataFrame) -> DataFrame:
    """Per-query rollup: batches, rows, mean rows/sec, p95-ish max batch ms,
    last state size — the one-glance health table."""
    from pyspark.sql import functions as F

    return progress_df.groupBy("query_id", "query_name").agg(
        F.count(F.lit(1)).alias("n_batches"),
        F.sum("num_input_rows").alias("total_rows"),
        F.round(F.avg("processed_rows_per_second"), 1).alias("avg_rows_per_sec"),
        F.max("trigger_execution_ms").alias("max_batch_ms"),
        F.max("state_rows_total").alias("state_rows_total"),
    )
