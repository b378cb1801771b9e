"""Deterministic file-source replay of fixture tables + memory-sink runner.

File streaming sources need a directory; fixtures are single parquet files —
``replay_parquet`` stages copies into a temp dir (optionally N copies to
synthesize duplicate deliveries) and returns the streaming DataFrame with the
same column types as ``tables.load_table`` (events.ts long-nanos → timestamp).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fs2_kinesis_firehose_spark.tables import ensure_session_confs, table_path


def replay_parquet(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    *,
    copies: int = 1,
    staging_dir: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    src = table_path(sf_dir, name)
    ensure_session_confs(spark)
    staging = staging_dir or os.path.join(
        tempfile.gettempdir(), f"replay-{name}-{uuid.uuid4().hex[:8]}"
    )
    os.makedirs(staging, exist_ok=True)
    # a table is either one parquet file (the driver fixture layout) or a
    # directory of part files (anything Spark itself wrote, e.g. the sf1
    # scale fixture) — stage every data file flat under a per-copy prefix
    if os.path.isdir(src):
        parts = sorted(
            e.path for e in os.scandir(src) if e.is_file() and e.name.endswith(".parquet")
        )
    else:
        parts = [src]
    for i in range(copies):
        for j, part in enumerate(parts):
            dst = os.path.join(staging, f"{name}-{i}-{j}.parquet")
            if not os.path.exists(dst):
                shutil.copy(part, dst)
    schema = spark.read.parquet(src).schema  # raw footer schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(staging)
    if name == "events":
        # Same normalization as tables.load_table: parquet TIMESTAMP(NANOS)
        # surfaces as long (≤4.0 nanosAsLong) or TIMESTAMP_NTZ (4.1+); either
        # way downstream watermarks/windows get microsecond TimestampType.
        from pyspark.sql.types import LongType, TimestampNTZType

        ts_type = schema["ts"].dataType
        if isinstance(ts_type, LongType):
            stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def replay_phased(
    spark: SparkSession,
    frames: list[DataFrame],
    *,
    staging_dir: str | None = None,
) -> DataFrame:
    """Stage each batch DataFrame as ONE parquet file and stream them back
    as ORDERED micro-batches (``maxFilesPerTrigger=1``; the file source
    lists by (mtime, path) and each staged file gets a strictly increasing
    mtime) — the deterministic way to exercise cross-batch watermark
    semantics: batch k+1 sees the watermark advanced by batch k.

    All frames must share a schema.  Returns the streaming DataFrame."""
    import time

    staging = staging_dir or os.path.join(
        tempfile.gettempdir(), f"replay-phased-{uuid.uuid4().hex[:8]}"
    )
    os.makedirs(staging, exist_ok=True)
    base = time.time()
    for k, frame in enumerate(frames):
        tmp = os.path.join(staging, f"_stage_{k}")
        frame.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(
            e.path
            for e in os.scandir(tmp)
            if e.is_file() and e.name.endswith(".parquet")
        )
        dst = os.path.join(staging, f"phase-{k:02d}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(tmp)
        os.utime(dst, (base + k, base + k))  # strict replay order
    schema = spark.read.parquet(os.path.join(staging, "phase-00.parquet")).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
    )


def run_to_memory_with_progress(
    stream_df: DataFrame, *, output_mode: str = "append"
) -> tuple[DataFrame, list]:
    """Like :func:`run_to_memory`, but also returns the query's recorded
    progress objects so callers can account for engine-side observability
    metrics (e.g. ``stateOperators[].numRowsDroppedByWatermark``)."""
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
        progress = list(q.recentProgress)
    finally:
        if q.isActive:
            q.stop()
    return stream_df.sparkSession.table(name), progress


def run_to_memory(stream_df: DataFrame, *, output_mode: str = "append") -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into a memory
    sink; return the materialized result as a batch DataFrame.

    availableNow processes everything currently in the source then stops —
    the deterministic way to exercise real streaming operators in tests and
    the correctness harness."""
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        if q.isActive:
            q.stop()
    return stream_df.sparkSession.table(name)
