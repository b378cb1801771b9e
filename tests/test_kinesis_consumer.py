"""Kinesis get_records consumer (sources/kinesis_consumer.py).

FakeKinesis (directory-backed, executor-visible) drives the distributed
read path; moto proves the identical fetch logic against an actual
AWS-API Kinesis implementation, driver-side (moto's mock is
process-local, same boundary as the Firehose moto smoke).
"""

from __future__ import annotations

import pytest

from fs2_kinesis_firehose_spark.sources.kinesis_consumer import (
    FakeKinesis,
    fetch_shard,
    read_kinesis,
)


@pytest.fixture()
def fake_stream(tmp_path):
    fk = FakeKinesis(str(tmp_path), n_shards=3)
    for i in range(60):
        fk.put_record(StreamName="s", Data=f"payload-{i}".encode(), PartitionKey=f"user{i % 7}")
    return fk


def _factory(tmp_path, n_shards=3):
    class F:
        def __init__(self, root):
            self.root = root

        def __call__(self):
            return FakeKinesis(self.root, n_shards=n_shards)

    return F(str(tmp_path))


def test_read_all_shards_through_spark(spark, tmp_path, fake_stream):
    out = read_kinesis(spark, "s", _factory(tmp_path)).collect()
    assert len(out) == 60
    assert {bytes(r["data"]).decode() for r in out} == {f"payload-{i}" for i in range(60)}
    # same partition key -> same shard (the Kinesis contract)
    by_key: dict[str, set] = {}
    for r in out:
        by_key.setdefault(r["partition_key"], set()).add(r["shard_id"])
    assert all(len(s) == 1 for s in by_key.values())


def test_order_preserved_within_shard(spark, tmp_path, fake_stream):
    out = read_kinesis(spark, "s", _factory(tmp_path)).collect()
    by_shard: dict[str, list[str]] = {}
    for r in out:
        by_shard.setdefault(r["shard_id"], []).append(r["sequence_number"])
    for seqs in by_shard.values():
        assert seqs == sorted(seqs)


def test_resume_after_sequence_number(spark, tmp_path, fake_stream):
    first = read_kinesis(spark, "s", _factory(tmp_path)).collect()
    ledger: dict[str, str] = {}
    for r in first:
        ledger[r["shard_id"]] = max(ledger.get(r["shard_id"], ""), r["sequence_number"])
    # nothing new -> resume yields zero records
    again = read_kinesis(spark, "s", _factory(tmp_path), start_after=ledger).collect()
    assert again == []
    # new records after the ledger -> only those come back
    fk = FakeKinesis(str(tmp_path), n_shards=3)
    fk.put_record(StreamName="s", Data=b"late-1", PartitionKey="user0")
    fk.put_record(StreamName="s", Data=b"late-2", PartitionKey="user3")
    tail = read_kinesis(spark, "s", _factory(tmp_path), start_after=ledger).collect()
    assert sorted(bytes(r["data"]).decode() for r in tail) == ["late-1", "late-2"]


def test_small_limit_pages_through(spark, tmp_path, fake_stream):
    out = read_kinesis(spark, "s", _factory(tmp_path), limit_per_call=7).collect()
    assert len(out) == 60


def test_moto_get_records_protocol():
    """The SAME fetch_shard loop against moto's real-API Kinesis."""
    moto = pytest.importorskip("moto")
    boto3 = pytest.importorskip("boto3")
    import os

    os.environ.setdefault("AWS_ACCESS_KEY_ID", "testing")
    os.environ.setdefault("AWS_SECRET_ACCESS_KEY", "testing")
    with moto.mock_aws():
        client = boto3.client("kinesis", region_name="us-east-1")
        client.create_stream(StreamName="ms", ShardCount=2)
        for i in range(25):
            client.put_record(StreamName="ms", Data=f"m-{i}".encode(), PartitionKey=f"k{i}")
        shards = [s["ShardId"] for s in client.list_shards(StreamName="ms")["Shards"]]
        got = []
        for shard_id in shards:
            got.extend(
                bytes(r["Data"]).decode()
                for r in fetch_shard(client, "ms", shard_id, limit_per_call=10)
            )
        assert sorted(got) == sorted(f"m-{i}" for i in range(25))
