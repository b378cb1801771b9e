"""The produce pipe: serialize → frame → batch(count) → bounded-parallel put
with shrink-to-failed retry → ack stream (firehose.scala:67-80 on Spark).

Execution-model mapping (SURVEY.md §1.3, §3 EP1):

- fs2 ``groupWithin(batchSize, timeWindow)``  → streaming trigger gives the
  TIME bound; the 500-record COUNT bound is re-imposed inside the sink by
  slicing each partition iterator (Spark triggers are time-only — SURVEY.md §7
  hard-part 1).
- ``mapAsync(parallelism)``                   → the put-stage task count
  bounds in-flight requests; ordered mode (the default at the reference's
  parallelism=1, available at ANY parallelism) reproduces mapAsync's
  order-preserving ack stream exactly — coalesce(1) at parallelism 1,
  pre-shuffle (src_part, req_idx) request stamps + a stamp sort at
  parallelism > 1.  ``ordered=False`` keeps only within-partition order.
- blocking-pool isolation (Firehose.scala:65) → puts run inside partition
  functions on executors; the driver never blocks on AWS I/O.
- ack stream (``Pipe[F, T, PutRecordBatchResult]``) → ``produce_acks`` returns
  a DataFrame of per-request ack rows; consuming it executes the puts (lazy,
  like pulling the fs2 stream).

At 100 TB scale the sink is embarrassingly parallel: no shuffle other than the
optional ``repartition(parallelism)``, no driver collect, per-executor client
singletons, and per-partition batching keeps memory at O(batch_size).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from fs2_kinesis_firehose_spark.firehose.batching import slice_requests
from fs2_kinesis_firehose_spark.firehose.client import ClientFactory
from fs2_kinesis_firehose_spark.firehose.retry import put_batch_with_retry
from fs2_kinesis_firehose_spark.firehose.serializers import serialize_and_frame
from fs2_kinesis_firehose_spark.firehose.settings import ProducerSettings

ACK_SCHEMA = StructType(
    [
        StructField("partition_id", IntegerType(), False),
        StructField("request_index", LongType(), False),
        StructField("n_records", LongType(), False),
        StructField("failed_records", LongType(), False),
        StructField("attempts", LongType(), False),
        StructField("request_bytes", LongType(), False),
        StructField("stream_name", StringType(), False),
    ]
)

# per-executor-process client singleton (A22: client lifecycle — the Resource
# analog; built once per Python worker, reused across partitions)
_CLIENT_CACHE: dict[Any, Any] = {}


def _factory_key(factory: ClientFactory) -> Any:
    """Stable cache key for a client factory.

    Spark unpickles a FRESH factory object per task, so object identity can't
    key a per-process singleton (and CPython reuses id() after GC — two
    different factories could alias a slot and deliver to the wrong
    endpoint).  Contract: factories expose their configuration as a
    ``kwargs`` attribute (both built-in factories do); the key is
    (type, sorted kwargs).  Arbitrary callables fall back to their
    cloudpickle bytes — stable across unpickling, unlike id()."""
    kw = getattr(factory, "kwargs", None)
    if kw is not None:
        return (type(factory).__module__, type(factory).__qualname__,
                repr(sorted(kw.items())))
    try:
        from pyspark import cloudpickle

        return ("pickled", cloudpickle.dumps(factory))
    except Exception as e:
        # never fall back to id(): CPython reuses addresses after GC, so two
        # factories could alias one slot and deliver to the wrong endpoint —
        # the exact bug stable keying exists to prevent
        raise TypeError(
            "client factory must expose a `kwargs` attribute or be "
            "cloudpickle-able to key the per-executor client cache"
        ) from e


def _executor_client(factory: ClientFactory) -> Any:
    key = _factory_key(factory)
    client = _CLIENT_CACHE.get(key)
    if client is None:
        client = factory()
        _CLIENT_CACHE[key] = client
    return client


def produce_acks(
    framed: DataFrame,
    settings: ProducerSettings,
    client_factory: ClientFactory,
    *,
    ordered: bool | None = None,
) -> DataFrame:
    """Batch-mode produce over a ``value: binary`` DataFrame → ack DataFrame.

    The returned DataFrame is lazy; an action on it performs the puts — the
    direct analog of the reference's ack ``Pipe`` output (firehose.scala:69).

    Arrow-batched ``mapInPandas`` (not an RDD map): payload bytes cross the
    JVM→Python boundary as Arrow buffers instead of per-row pickles (~10×
    on wide batches); the slicing carries a remainder buffer across Arrow
    batches so request boundaries are exact within a partition.

    Request slicing enforces BOTH AWS quota axes (A2's count bound + the byte
    bounds): ≤ ``batch_size`` records AND ≤ ``max_batch_bytes`` per request —
    a record that would overflow the byte bound flushes the buffer first; a
    single record over ``max_record_bytes`` raises (the real service would
    reject it on every retry, so failing fast on the executor is strictly
    better).

    ``ordered`` mirrors the reference's order-preserving ``mapAsync``
    (firehose.scala:41).  Default (``None``): ordered exactly when
    ``parallelism == 1`` — the reference's default configuration
    (ProducerSettings.scala:80 sets parallelism 1, and mapAsync at 1 is
    globally sequential and order-preserving), so a user porting default
    settings gets identical ack ordering with zero extra cost (the
    unordered path would funnel through one partition anyway; the ordered
    path does the same WITHOUT a shuffle).

    Ordered at ``parallelism == 1`` uses an order-preserving
    ``coalesce(1)``: the single task consumes input partitions in
    source-index order, so requests are cut from the globally sequential
    record stream exactly as the reference's ``groupWithin`` does, and the
    ack rows come out already ordered.  (At parallelism=1 the upstream
    projection — serialization/framing — runs inside that single task
    rather than parallel behind a repartition shuffle; measured NET-FASTER
    here (sf1: 5.2 s → 4.0 s — skipping the payload-bytes shuffle outweighs
    the lost framing parallelism), but CPU-heavy serializers on
    many-partition inputs may prefer ``ordered=False``.)

    Ordered at ``parallelism > 1`` (exact at ANY parallelism, matching
    ``mapAsync(n)``): requests are cut PER SOURCE PARTITION at framing
    time — a first ``mapInPandas`` over the un-shuffled input slices each
    source partition into requests and stamps every request with
    ``(source_partition_id, request_index)`` — then the request rows
    round-robin-shuffle into exactly ``parallelism`` put tasks (the
    in-flight bound), and the ack DataFrame is globally sorted by the
    stamp.  Because the stamp is captured BEFORE any shuffle, the ack
    sequence equals request-formation order regardless of how the
    scheduler groups or scrambles partitions — no reliance on coalesce
    contiguity (the r9 locality caveat is gone).  Like ``mapAsync``, puts
    COMPLETE concurrently; it is the ack STREAM that is ordered.  Framing
    runs at full source parallelism.  Semantic note: request boundaries
    never span source partitions (each source partition flushes its
    remainder as a partial request — the same partial batches
    ``groupWithin``'s time bound produces), so ``n_requests`` is
    Σ_p ceil(rows_p / batch_size) rather than the single-stream
    ceil(Σ rows / batch_size); at parallelism=1 the single-stream cut is
    preserved exactly.
    """
    if "value" not in framed.columns:
        raise ValueError("produce expects a framed DataFrame with a 'value' column")
    if ordered is None:
        ordered = settings.parallelism == 1  # ProducerSettings.scala:80 default
    if ordered and settings.parallelism > 1:
        return _produce_acks_stamped(framed, settings, client_factory)
    if ordered:
        # order-preserving concurrency bound: coalesce merges whole input
        # partitions in index order, never splits or interleaves them
        partitioned = framed.select("value").coalesce(settings.parallelism)
    else:
        partitioned = framed.select("value").repartition(settings.parallelism)

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import pandas as pd
        from pyspark import TaskContext

        ctx = TaskContext.get()
        partition_id = ctx.partitionId() if ctx is not None else -1
        client = _executor_client(client_factory)
        acks: list[dict] = []

        payloads = (bytes(v) for pdf in batches for v in pdf["value"])
        for request_index, (buf, buf_bytes) in enumerate(
            slice_requests(
                payloads,
                batch_size=settings.batch_size,
                max_batch_bytes=settings.max_batch_bytes,
                max_record_bytes=settings.max_record_bytes,
            )
        ):
            records = [{"Data": p} for p in buf]
            resp = put_batch_with_retry(client, settings.stream_name, records, settings.retry)
            acks.append(
                {
                    "partition_id": partition_id,
                    "request_index": request_index,
                    "n_records": len(records),
                    "failed_records": int(resp.get("FailedPutCount", 0)),
                    "attempts": int(resp.get("Attempts", 1)),
                    "request_bytes": buf_bytes,
                    "stream_name": settings.stream_name,
                }
            )
        yield pd.DataFrame(
            acks,
            columns=[f.name for f in ACK_SCHEMA.fields],
        )

    acks_df = partitioned.mapInPandas(run, ACK_SCHEMA)
    if ordered:
        # NOT orderBy: a global sort range-samples its input, which would
        # execute the put pipeline a second time (duplicate delivery!).
        # Ack rows are request-count-sized, so one round-robin shuffle to a
        # single partition + an in-partition sort is both safe and cheap.
        acks_df = acks_df.repartition(1).sortWithinPartitions(
            "partition_id", "request_index"
        )
    return acks_df


# request rows between the cut stage and the put stage of the stamped path
_REQUEST_SCHEMA = StructType(
    [
        StructField("src_part", IntegerType(), False),
        StructField("req_idx", LongType(), False),
        StructField("payloads", ArrayType(BinaryType(), False), False),
        StructField("request_bytes", LongType(), False),
    ]
)


def _produce_acks_stamped(
    framed: DataFrame,
    settings: ProducerSettings,
    client_factory: ClientFactory,
) -> DataFrame:
    """Exact-order produce at parallelism > 1 (see ``produce_acks``).

    Stage 1 (source parallelism): slice each SOURCE partition into
    requests, stamping ``(src_part, req_idx)`` — the stamp is captured in
    the pre-shuffle stage, so it reflects true source order no matter how
    later stages schedule.  Stage 2 (``parallelism`` tasks, the in-flight
    bound): round-robin shuffle of the request rows, then the actual puts.
    Stage 3: one request-count-sized shuffle to sort acks by stamp.  The
    payload bytes cross one shuffle (same as the unordered repartition
    path); framing stays fully parallel."""

    def cut(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import pandas as pd
        from pyspark import TaskContext

        ctx = TaskContext.get()
        src_part = ctx.partitionId() if ctx is not None else -1
        cols = [f.name for f in _REQUEST_SCHEMA.fields]
        payloads = (bytes(v) for pdf in batches for v in pdf["value"])
        # yield ONE frame per request: peak task memory stays proportional
        # to max_batch_bytes, never to the source partition size (the
        # streaming contract slice_requests gives the other paths)
        for req_idx, (buf, buf_bytes) in enumerate(
            slice_requests(
                payloads,
                batch_size=settings.batch_size,
                max_batch_bytes=settings.max_batch_bytes,
                max_record_bytes=settings.max_record_bytes,
            )
        ):
            yield pd.DataFrame(
                [
                    {
                        "src_part": src_part,
                        "req_idx": req_idx,
                        "payloads": list(buf),
                        "request_bytes": buf_bytes,
                    }
                ],
                columns=cols,
            )

    requests = (
        framed.select("value")
        .mapInPandas(cut, _REQUEST_SCHEMA)
        .repartition(settings.parallelism)
    )

    def put(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import pandas as pd

        client = _executor_client(client_factory)
        acks: list[dict] = []
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                records = [{"Data": bytes(p)} for p in row.payloads]
                resp = put_batch_with_retry(
                    client, settings.stream_name, records, settings.retry
                )
                acks.append(
                    {
                        "partition_id": int(row.src_part),
                        "request_index": int(row.req_idx),
                        "n_records": len(records),
                        "failed_records": int(resp.get("FailedPutCount", 0)),
                        "attempts": int(resp.get("Attempts", 1)),
                        "request_bytes": int(row.request_bytes),
                        "stream_name": settings.stream_name,
                    }
                )
        yield pd.DataFrame(acks, columns=[f.name for f in ACK_SCHEMA.fields])

    # same no-orderBy rationale as produce_acks: a global sort would
    # range-sample (and so re-run) the put pipeline
    return (
        requests.mapInPandas(put, ACK_SCHEMA)
        .repartition(1)
        .sortWithinPartitions("partition_id", "request_index")
    )


def write_batch(
    df: DataFrame,
    settings: ProducerSettings,
    client_factory: ClientFactory,
    serializer: str = "json",
) -> DataFrame:
    """One-shot typed batch put (FirehoseOps.batchPut analog,
    FirehoseOps.scala:48-54) — serialize+frame then deliver.

    Returns the LAZY ack DataFrame (one row per ≤500-record request): an
    action on it performs the puts.  No driver materialization — at 100 TB /
    1 KB records the ack stream is ~2×10⁸ rows; aggregate or sink it
    cluster-side (e.g. ``acks.groupBy().agg(F.sum("failed_records"))``)."""
    framed = serialize_and_frame(df, serializer, settings.separator)
    return produce_acks(framed, settings, client_factory)


def write_one(
    obj: bytes | str,
    settings: ProducerSettings,
    client_factory: ClientFactory,
    charset: str = "UTF-8",
) -> dict[str, Any]:
    """Typed single put (FirehoseOps.put analog, FirehoseOps.scala:42-46).

    Driver-side, no cluster involvement — one record, one request."""
    payload = obj.encode(charset) if isinstance(obj, str) else bytes(obj)
    payload += settings.separator
    client = client_factory()
    return client.put_record(
        DeliveryStreamName=settings.stream_name, Record={"Data": payload}
    )


def produce(
    stream_df: DataFrame,
    settings: ProducerSettings,
    client_factory: ClientFactory,
    serializer: str = "json",
    checkpoint_dir: str | None = None,
    query_name: str = "firehose_produce",
):
    """The streaming produce pipe (firehose.scala:67-80 analog).

    ``stream_df`` is a streaming DataFrame; each micro-batch (time bound =
    trigger interval ≈ groupWithin's timeWindow) is serialized, framed,
    split into ≤500-record requests and delivered with retry at bounded
    parallelism.  Returns the StreamingQuery handle.
    """
    if not stream_df.isStreaming:
        raise ValueError("produce expects a streaming DataFrame; use write_batch for batch")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        framed = serialize_and_frame(batch_df, serializer, settings.separator)
        # puts run on executors; only a ONE-ROW aggregated summary reaches the
        # driver (never the per-request ack rows — unbounded at scale)
        acks = produce_acks(framed, settings, client_factory)
        acks.groupBy().agg(
            F.count(F.lit(1)).alias("n_requests"),
            F.sum("failed_records").alias("failed_records"),
        ).collect()

    writer = (
        stream_df.writeStream.foreachBatch(sink)
        .queryName(query_name)
        .trigger(processingTime=f"{settings.time_window_s} seconds")
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
