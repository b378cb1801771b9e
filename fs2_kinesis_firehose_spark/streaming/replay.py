"""Deterministic file-source replay of fixture tables + memory-sink runner.

File streaming sources need a directory; fixtures are single parquet files —
``replay_parquet`` stages copies into a temp dir (optionally N copies to
synthesize duplicate deliveries) and returns the streaming DataFrame with the
same column types as ``tables.load_table`` (events.ts long-nanos → timestamp).
"""

from __future__ import annotations

import math
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fs2_kinesis_firehose_spark.tables import ensure_session_confs, table_path

# Staging dirs created by replay_parquet/replay_phased WITHOUT an explicit
# ``staging_dir``: every run_to_memory* call removes whatever is registered
# once its query has terminated (the staged copies are only read while the
# query runs).  Before this, a full bench run leaked hundreds of
# /tmp/replay-* dirs (observed: 362), the known dirty-tmp noise source for
# the /tmp-I/O-sensitive bench lines (PLANS.md noise protocol).
_EPHEMERAL_STAGING: list[str] = []

# Stateful-shuffle sizing constant: state partitions = ceil(sqrt(bytes /
# this)).  Why sqrt (measured, r15): a micro-batch pays a FIXED cost k per
# state-store instance (commit/delta-write/bookkeeping, measured 30-250 ms
# per instance per batch even when nearly empty — and contention makes it
# superlinear in the instance count) plus DIVISIBLE compute c*B/p, so wall
# time c*B/p + k*p is minimized at p* = sqrt(c*B/k).  With the measured
# c ≈ 1 s/MB (single-threaded stateful-agg compute at this row width) and
# k ≈ 30-60 ms this constant puts p within ~2x of the per-shape optimum
# across every measured shape (windowed agg, update-mode agg, stream-stream
# LeftOuter with 4 stores/partition): at 2 MB input the sweep gave
# p=4-8 ≈ best everywhere, while the previous core-count constant (32)
# cost 1.4-3x the optimum — worst on the join (6.4 s vs 1.9-2.1 s).
# Unlike batch exchanges, the stateful exchange is INVISIBLE to AQE (the
# state partition count is pinned into the checkpoint at batch 0 and can
# never be coalesced), so right-sizing must happen at query start, derived
# from input size — not from the local core count.  The session
# shuffle-partition setting stays the UPPER bound, so a cluster configured
# with thousands of shuffle partitions keeps them once the input is large
# enough to need them (the cap binds from ~130 MB/batch at the local 32,
# ~260 GB/batch at a cluster's 2000).
_STATE_PARTITION_SQRT_BYTES = 64 * 1024


def _source_bytes(src: str) -> int:
    """Total bytes of a fixture table: one parquet file or a directory of
    part files (matches the staging logic in replay_parquet)."""
    if os.path.isdir(src):
        return sum(
            e.stat().st_size
            for e in os.scandir(src)
            if e.is_file() and e.name.endswith(".parquet")
        )
    return os.path.getsize(src)


def sized_state_partitions(
    spark: SparkSession, sf_dir: str, *names: str, copies: int = 1
) -> int:
    """Scale-adaptive stateful-shuffle sizing for an availableNow replay
    reading ``names`` (each staged ``copies`` times):
    ``clamp(ceil(sqrt(input_bytes / 64KB)), 1, session shuffle partitions)``
    — the fixed-cost-per-store vs divisible-compute optimum (see the
    ``_STATE_PARTITION_SQRT_BYTES`` cost model).

    ``spark.fs2kf.streaming.statePartitions`` overrides the derivation for
    deployments that size state partitions explicitly (state-store count is
    sticky per checkpoint, so production picks it for the stream's LIFETIME
    peak, not its first batch)."""
    override = spark.conf.get("spark.fs2kf.streaming.statePartitions", None)
    if override:
        return max(1, int(override))
    conf = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        cap = int(conf)
    except ValueError:  # e.g. "auto" on some platforms
        cap = spark.sparkContext.defaultParallelism
    n_bytes = sum(_source_bytes(table_path(sf_dir, n)) for n in names) * copies
    derived = math.isqrt(max(0, n_bytes - 1) // _STATE_PARTITION_SQRT_BYTES) + 1
    return max(1, min(cap, derived))


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
    staging = staging_dir
    if staging is None:
        staging = os.path.join(
            tempfile.gettempdir(), f"replay-{name}-{uuid.uuid4().hex[:8]}"
        )
        _EPHEMERAL_STAGING.append(staging)
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

    staging = staging_dir
    if staging is None:
        staging = os.path.join(
            tempfile.gettempdir(), f"replay-phased-{uuid.uuid4().hex[:8]}"
        )
        _EPHEMERAL_STAGING.append(staging)
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


class scoped_state_partitions:
    """Context manager pinning ``spark.sql.shuffle.partitions`` for the
    duration of ONE availableNow streaming run (the conf is what fixes the
    stateful operator's state-store count at batch 0 — see
    ``sized_state_partitions``).  Restores the previous value afterwards;
    ``None`` partitions = no-op."""

    def __init__(self, spark: SparkSession, partitions: int | None):
        self._spark = spark
        self._n = partitions
        self._prev: str | None = None

    def __enter__(self):
        if self._n is not None:
            self._prev = self._spark.conf.get("spark.sql.shuffle.partitions")
            self._spark.conf.set("spark.sql.shuffle.partitions", str(self._n))
        return self

    def __exit__(self, *exc):
        if self._prev is not None:
            self._spark.conf.set("spark.sql.shuffle.partitions", self._prev)
        return False


def _drain_ephemeral_staging() -> None:
    """Remove every auto-created staging dir (their queries have finished:
    run_to_memory* is sequential in every query/test path)."""
    while _EPHEMERAL_STAGING:
        shutil.rmtree(_EPHEMERAL_STAGING.pop(), ignore_errors=True)


def run_to_memory_with_progress(
    stream_df: DataFrame,
    *,
    output_mode: str = "append",
    state_partitions: int | None = None,
) -> tuple[DataFrame, list]:
    """Like :func:`run_to_memory`, but also returns the query's recorded
    progress objects so callers can account for engine-side observability
    metrics (e.g. ``stateOperators[].numRowsDroppedByWatermark``)."""
    name = f"mem_{uuid.uuid4().hex[:12]}"
    spark = stream_df.sparkSession
    with scoped_state_partitions(spark, state_partitions):
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
            _drain_ephemeral_staging()
    return spark.table(name), progress


def run_to_memory(
    stream_df: DataFrame,
    *,
    output_mode: str = "append",
    state_partitions: int | None = None,
) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into a memory
    sink; return the materialized result as a batch DataFrame.

    availableNow processes everything currently in the source then stops —
    the deterministic way to exercise real streaming operators in tests and
    the correctness harness.

    ``state_partitions``: pins the stateful operator's state-store count
    for this run (see ``sized_state_partitions``); the session conf is
    restored afterwards."""
    name = f"mem_{uuid.uuid4().hex[:12]}"
    spark = stream_df.sparkSession
    with scoped_state_partitions(spark, state_partitions):
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
            _drain_ephemeral_staging()
    return spark.table(name)
