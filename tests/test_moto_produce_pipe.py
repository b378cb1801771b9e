"""End-to-end produce pipe against moto's emulated Firehose SERVICE.

``test_moto_smoke.py`` covers the boto3 protocol driver-side (in-process
``mock_aws``); this is the missing modality from the reference's test matrix
(FirehoseTest.scala:35-38 boots LocalStack; :58-78 drives a single put plus a
500 x 1 KB batch through the pipe): the puts here run inside EXECUTOR Python
workers, which an in-process mock cannot reach, so moto runs in server mode
(``ThreadedMotoServer``) and executors connect over real HTTP with an
``endpoint_url`` client factory — the same wire path a production cluster
takes.

Skipped automatically when moto/boto3 (or moto's server extra) are absent.
"""

from __future__ import annotations

import gzip

import pytest

moto = pytest.importorskip("moto")
boto3 = pytest.importorskip("boto3")
pytest.importorskip("moto.server")

from pyspark.sql import functions as F

from fs2_kinesis_firehose_spark.firehose import admin
from fs2_kinesis_firehose_spark.firehose.client import boto3_client_factory
from fs2_kinesis_firehose_spark.firehose.settings import ProducerSettings
from fs2_kinesis_firehose_spark.firehose.sink import produce, produce_acks, write_one
from fs2_kinesis_firehose_spark.streaming.replay import replay_parquet

_CREDS = dict(
    region_name="us-east-1",
    aws_access_key_id="testing",
    aws_secret_access_key="testing",
)
_S3_DEST = {
    "RoleARN": "arn:aws:iam::123456789012:role/firehose-role",
    "BucketARN": "arn:aws:s3:::pipe-bucket",
}


@pytest.fixture(scope="module")
def moto_endpoint():
    from moto.server import ThreadedMotoServer

    server = ThreadedMotoServer(port=0)
    server.start()
    host, port = server.get_host_and_port()
    yield f"http://{host}:{port}"
    server.stop()


@pytest.fixture()
def pipe_env(moto_endpoint):
    factory = boto3_client_factory(endpoint_url=moto_endpoint, **_CREDS)
    s3 = boto3.client("s3", endpoint_url=moto_endpoint, **_CREDS)
    s3.create_bucket(Bucket="pipe-bucket")
    admin.create_stream(factory(), "pipe", S3DestinationConfiguration=_S3_DEST)
    yield factory, s3
    admin.delete_stream(factory(), "pipe")
    for o in s3.list_objects_v2(Bucket="pipe-bucket").get("Contents", []):
        s3.delete_object(Bucket="pipe-bucket", Key=o["Key"])
    s3.delete_bucket(Bucket="pipe-bucket")


def _delivered(s3) -> bytes:
    body = b""
    for o in s3.list_objects_v2(Bucket="pipe-bucket").get("Contents", []):
        raw = s3.get_object(Bucket="pipe-bucket", Key=o["Key"])["Body"].read()
        # moto may gzip depending on destination config version
        body += gzip.decompress(raw) if raw[:2] == b"\x1f\x8b" else raw
    return body


def test_single_put_reaches_service(pipe_env):
    factory, s3 = pipe_env
    write_one(
        b"single-record",
        ProducerSettings(stream_name="pipe", separator=b"\n"),
        factory,
    )
    assert b"single-record\n" in _delivered(s3)


def test_batch_500x1kb_through_executor_pipe(spark, pipe_env):
    # FirehoseTest.scala:58-78's 500 x 1 KB batch, but through the REAL
    # distributed path: executor workers put over HTTP to the moto server
    factory, s3 = pipe_env
    payload = "x" * 1000
    df = spark.range(500).select(
        F.concat(F.format_string("rec-%03d:", F.col("id")), F.lit(payload + "\n"))
        .cast("binary")
        .alias("value")
    )
    acks = produce_acks(
        df, ProducerSettings(stream_name="pipe", parallelism=4), factory
    ).collect()
    assert sum(a.n_records for a in acks) == 500
    assert all(a.failed_records == 0 for a in acks)
    body = _delivered(s3)
    assert all(f"rec-{i:03d}:".encode() in body for i in (0, 250, 499))


def test_streaming_produce_foreachbatch(spark, sf_smoke, pipe_env, tmp_path):
    # the full streaming pipe (firehose.scala:67-80): file stream → serialize
    # → frame → slice → put, against the emulated service
    factory, s3 = pipe_env
    events = replay_parquet(
        spark, sf_smoke, "events", staging_dir=str(tmp_path / "stream-src")
    ).select("event_id", "event_type")
    q = produce(
        events,
        ProducerSettings(stream_name="pipe", parallelism=2),
        factory,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()
    n = spark.read.parquet(f"{sf_smoke}/events.parquet").count()
    body = _delivered(s3)
    assert body.count(b'"event_id"') >= n
