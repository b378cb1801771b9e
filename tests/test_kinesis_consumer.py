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
            for page in fetch_shard(client, "ms", shard_id, limit_per_call=10):
                got.extend(bytes(r["Data"]).decode() for r in page)
        assert sorted(got) == sorted(f"m-{i}" for i in range(25))


class _Err(Exception):
    def __init__(self, code):
        super().__init__(code)
        self.response = {"Error": {"Code": code}}


def test_expired_iterator_resumes_after_last_record(tmp_path):
    """An ExpiredIteratorException mid-shard re-establishes the iterator
    AFTER the last delivered record — no loss, no duplicates."""
    fk = FakeKinesis(str(tmp_path), n_shards=1)
    for i in range(10):
        fk.put_record(StreamName="s", Data=f"r-{i}".encode(), PartitionKey="k")

    class Flaky(FakeKinesis):
        calls = 0

        def get_records(self, ShardIterator, Limit=10_000):
            Flaky.calls += 1
            if Flaky.calls == 2:
                raise _Err("ExpiredIteratorException")
            return super().get_records(ShardIterator, Limit)

    client = Flaky(str(tmp_path), n_shards=1)
    got = [
        bytes(r["Data"]).decode()
        for page in fetch_shard(client, "s", "shardId-000000000000", limit_per_call=4)
        for r in page
    ]
    assert got == [f"r-{i}" for i in range(10)]


def test_throttling_backs_off_then_succeeds(tmp_path):
    fk = FakeKinesis(str(tmp_path), n_shards=1)
    for i in range(5):
        fk.put_record(StreamName="s", Data=f"t-{i}".encode(), PartitionKey="k")

    class Throttly(FakeKinesis):
        calls = 0

        def get_records(self, ShardIterator, Limit=10_000):
            Throttly.calls += 1
            if Throttly.calls <= 2:
                raise _Err("ProvisionedThroughputExceededException")
            return super().get_records(ShardIterator, Limit)

    client = Throttly(str(tmp_path), n_shards=1)
    got = [
        bytes(r["Data"]).decode()
        for page in fetch_shard(client, "s", "shardId-000000000000")
        for r in page
    ]
    assert got == [f"t-{i}" for i in range(5)]


def test_one_partition_per_shard(spark, tmp_path, fake_stream):
    """The shard DataFrame pins exactly one shard per partition (hash
    repartition would collide shards and serialize their reads)."""
    from fs2_kinesis_firehose_spark.sources.kinesis_consumer import read_kinesis  # noqa: F401

    pairs = [(f"shardId-{i:012d}", None) for i in range(3)]
    rdd = spark.sparkContext.parallelize(pairs, len(pairs))
    sizes = rdd.glom().map(len).collect()
    assert sizes == [1, 1, 1]
