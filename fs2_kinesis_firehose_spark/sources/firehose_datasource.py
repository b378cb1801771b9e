"""Firehose as a first-class Spark data source (Spark 4 Python DataSource API).

Gives the reference's produce pipe (firehose.scala:67-80) the same surface as
the built-in Kafka sink::

    register_firehose_source(spark)
    framed.write.format("firehose").option("streamName", "s").save()        # batch
    stream.writeStream.format("firehose").option("streamName", "s").start() # streaming

Contract (mirrors the Kafka sink): the DataFrame must have a single ``value``
column (binary or string) — use ``firehose.serializers.serialize_and_frame``
to serialize+frame arbitrary rows.  Each executor partition slices its rows
into ≤500-record requests (A2's count bound) and delivers with
shrink-to-failed retry (A8, Firehose.scala:70-105 semantics); commit messages
aggregate per-partition delivery accounting back on the driver.

Options: ``streamName`` (required), ``batchSize`` (≤500), ``maxRetries``,
``baseBackoffMs``, ``separator`` (appended if the upstream didn't frame),
``spoolDir`` (use the in-memory fake client, spooling for observation —
tests/CI), region/endpoint passthrough for the real boto3 client.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)

from fs2_kinesis_firehose_spark.firehose.retry import put_batch_with_retry
from fs2_kinesis_firehose_spark.firehose.settings import (
    MAX_BATCH_BYTES,
    MAX_BATCH_SIZE,
    MAX_RECORD_BYTES,
    RetryPolicy,
)


@dataclass
class FirehoseCommitMessage(WriterCommitMessage):
    partition_id: int
    n_requests: int
    n_records: int
    failed_records: int


def _build_client(options: dict[str, str]) -> Any:
    if options.get("spooldir"):
        from fs2_kinesis_firehose_spark.firehose.client import FakeFirehose

        return FakeFirehose(spool_dir=options["spooldir"])
    try:  # pragma: no cover - boto3 absent in CI
        import boto3  # type: ignore[import-not-found]
    except ImportError as e:
        raise RuntimeError(
            "boto3 not installed; pass .option('spoolDir', ...) to use the fake client"
        ) from e
    kwargs: dict[str, Any] = {}
    if options.get("region"):
        kwargs["region_name"] = options["region"]
    if options.get("endpoint"):
        kwargs["endpoint_url"] = options["endpoint"]
    return boto3.client("firehose", **kwargs)  # pragma: no cover


class _WriterCore:
    """Shared executor-side write loop for batch and streaming writers."""

    def __init__(self, options: dict[str, str]) -> None:
        # normalize option keys (Spark lowercases DataSource option names)
        self.options = {k.lower(): v for k, v in options.items()}
        if not self.options.get("streamname"):
            raise ValueError("firehose source requires .option('streamName', ...)")
        self.stream_name = self.options["streamname"]
        self.batch_size = int(self.options.get("batchsize", MAX_BATCH_SIZE))
        if not (0 < self.batch_size <= MAX_BATCH_SIZE):
            raise ValueError(f"batchSize must be in (0, {MAX_BATCH_SIZE}]")
        # AWS byte quotas (lowerable for tests, never raisable past AWS)
        self.max_batch_bytes = int(self.options.get("maxbatchbytes", MAX_BATCH_BYTES))
        self.max_record_bytes = int(self.options.get("maxrecordbytes", MAX_RECORD_BYTES))
        if not (0 < self.max_batch_bytes <= MAX_BATCH_BYTES):
            raise ValueError(f"maxBatchBytes must be in (0, {MAX_BATCH_BYTES}]")
        if not (0 < self.max_record_bytes <= MAX_RECORD_BYTES):
            raise ValueError(f"maxRecordBytes must be in (0, {MAX_RECORD_BYTES}]")
        # a single accepted record must never overflow a request
        self.max_record_bytes = min(self.max_record_bytes, self.max_batch_bytes)
        self.retry = RetryPolicy(
            max_retries=int(self.options.get("maxretries", 6)),
            base_backoff_s=float(self.options.get("basebackoffms", 500)) / 1000.0,
        )
        self.separator = self.options.get("separator", "").encode()

    def write(self, iterator: Iterator[Any]) -> FirehoseCommitMessage:
        from pyspark import TaskContext

        from fs2_kinesis_firehose_spark.firehose.batching import slice_requests

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else -1
        client = _build_client(self.options)
        n_requests = n_records = failed = 0

        def payloads() -> Iterator[bytes]:
            for row in iterator:
                v = row["value"]
                payload = v.encode() if isinstance(v, str) else bytes(v)
                if self.separator:
                    payload += self.separator
                yield payload

        for buf, _bytes in slice_requests(
            payloads(),
            batch_size=self.batch_size,
            max_batch_bytes=self.max_batch_bytes,
            max_record_bytes=self.max_record_bytes,
        ):
            resp = put_batch_with_retry(
                client, self.stream_name, [{"Data": p} for p in buf], self.retry
            )
            n_requests += 1
            n_records += len(buf)
            failed += int(resp.get("FailedPutCount", 0))
        return FirehoseCommitMessage(
            partition_id=pid, n_requests=n_requests, n_records=n_records, failed_records=failed
        )


class FirehoseBatchWriter(DataSourceWriter):
    def __init__(self, options: dict[str, str]) -> None:
        self.core = _WriterCore(options)

    def write(self, iterator: Iterator[Any]) -> FirehoseCommitMessage:
        return self.core.write(iterator)

    def commit(self, messages: list[FirehoseCommitMessage]) -> None:  # driver-side
        total_failed = sum(m.failed_records for m in messages if m)
        if total_failed:
            raise RuntimeError(f"firehose delivery incomplete: {total_failed} records failed")


class FirehoseStreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict[str, str]) -> None:
        self.core = _WriterCore(options)

    def write(self, iterator: Iterator[Any]) -> FirehoseCommitMessage:
        return self.core.write(iterator)

    def commit(self, messages: list[FirehoseCommitMessage], batchId: int) -> None:
        total_failed = sum(m.failed_records for m in messages if m)
        if total_failed:
            raise RuntimeError(
                f"firehose delivery incomplete in batch {batchId}: {total_failed} failed"
            )

    def abort(self, messages: list[FirehoseCommitMessage], batchId: int) -> None:
        # at-least-once: delivered records of an aborted batch may duplicate
        # (same contract as the reference's retry, SURVEY.md §7 hard-part 3)
        pass


class FirehoseDataSource(DataSource):
    """``format("firehose")`` — write-only (Firehose is write-only by nature;
    SURVEY.md §2: the reference never reads a stream)."""

    @classmethod
    def name(cls) -> str:
        return "firehose"

    def schema(self) -> str:
        return "value binary"

    def writer(self, schema: Any, overwrite: bool) -> FirehoseBatchWriter:
        self._check_schema(schema)
        return FirehoseBatchWriter(self.options)

    def streamWriter(self, schema: Any, overwrite: bool) -> FirehoseStreamWriter:
        self._check_schema(schema)
        return FirehoseStreamWriter(self.options)

    @staticmethod
    def _check_schema(schema: Any) -> None:
        names = [f.name for f in schema.fields]
        if names != ["value"]:
            raise ValueError(
                f"firehose sink expects exactly one 'value' column (binary/string), got {names}; "
                "use serialize_and_frame() upstream"
            )


def register_firehose_source(spark) -> None:
    spark.dataSource.register(FirehoseDataSource)
