"""Smoke test of the REAL boto3 client path against moto's emulated Firehose.

Everything else in the suite runs against FakeFirehose; this proves the
boto3-shaped contract (client factory, retry wrapper, admin 404 handling,
batch put) holds against an actual AWS-API implementation.  Driver-side only:
moto's mock is process-local, so executor-distributed paths keep using the
fake (SURVEY.md §7 hard-part 5 allows this to stay non-gating).

Skipped automatically when moto/boto3 are absent.
"""

from __future__ import annotations

import os

import pytest

moto = pytest.importorskip("moto")
boto3 = pytest.importorskip("boto3")

from fs2_kinesis_firehose_spark.firehose import admin
from fs2_kinesis_firehose_spark.firehose.client import boto3_client_factory
from fs2_kinesis_firehose_spark.firehose.retry import put_batch_with_retry
from fs2_kinesis_firehose_spark.firehose.settings import RetryPolicy


@pytest.fixture()
def moto_client():
    os.environ.setdefault("AWS_ACCESS_KEY_ID", "testing")
    os.environ.setdefault("AWS_SECRET_ACCESS_KEY", "testing")
    with moto.mock_aws():
        yield boto3_client_factory(region_name="us-east-1")()


_S3_DEST = {
    "RoleARN": "arn:aws:iam::123456789012:role/firehose-role",
    "BucketARN": "arn:aws:s3:::smoke-bucket",
}


def test_admin_lifecycle_and_404_contract(moto_client):
    c = moto_client
    # 404 contract BEFORE the stream exists: None, not an exception
    assert admin.describe_stream(c, "absent") is None
    assert admin.delete_stream(c, "absent") is None

    with admin.delivery_stream(
        c, "smoke", S3DestinationConfiguration=_S3_DEST
    ) as created:
        assert "DeliveryStreamARN" in created
        desc = admin.describe_stream(c, "smoke")
        assert desc["DeliveryStreamDescription"]["DeliveryStreamName"] == "smoke"
        assert "smoke" in admin.list_streams(c)
        admin.tag_stream(c, "smoke", {"env": "test"})
        tags = admin.list_tags(c, "smoke")
        assert {"Key": "env", "Value": "test"} in tags
        admin.untag_stream(c, "smoke", ["env"])
    # bracketed exit deleted it
    assert admin.describe_stream(c, "smoke") is None


def test_put_record_batch_through_retry_wrapper(moto_client):
    c = moto_client
    # moto really delivers to the S3 destination — the bucket must exist
    boto3.client("s3", region_name="us-east-1").create_bucket(Bucket="smoke-bucket")
    admin.create_stream(
        c, "smoke-put", S3DestinationConfiguration=_S3_DEST
    )
    records = [{"Data": f"rec-{i}\n".encode()} for i in range(25)]
    resp = put_batch_with_retry(c, "smoke-put", records, RetryPolicy(max_retries=1))
    assert int(resp.get("FailedPutCount", 0)) == 0
    assert len(resp["RequestResponses"]) == 25
    assert all("RecordId" in r for r in resp["RequestResponses"])
