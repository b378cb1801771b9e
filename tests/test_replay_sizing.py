"""r15 streaming machinery: input-sized state partitions + staging cleanup.

Pins the three internals the r15 optimization round changed in
``streaming/replay.py``:

- ``sized_state_partitions``: sqrt-of-bytes derivation, conf override,
  clamp to the session shuffle-partition cap, floor of 1.
- ``scoped_state_partitions``: the conf is pinned only for the run and
  RESTORED afterwards (also on error).
- auto-created replay staging dirs are removed once their query has run
  (the /tmp/replay-* leak was the known dirty-tmp bench-noise source);
  caller-owned ``staging_dir``s are left alone.
- the ``state_partitions`` argument actually lands as the stateful
  operator's state-store count (engine-reported numShufflePartitions).
"""

from __future__ import annotations

import os

import pytest

from fs2_kinesis_firehose_spark.streaming import replay as R
from fs2_kinesis_firehose_spark.streaming.windows import tumbling_counts

SF = "/root/testdata/sf0.001"


def test_sized_state_partitions_derivation(spark):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        one = R.sized_state_partitions(spark, SF, "events")
        # monotone in copies, never below 1, never above the session cap
        three = R.sized_state_partitions(spark, SF, "events", copies=3)
        assert 1 <= one <= three <= 32
        # tiny fixture → far below the cap
        assert one < 32
        # cap clamps: with a 2-partition session the derivation can't exceed it
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        big = R.sized_state_partitions(spark, SF, "events", copies=3)
        assert 1 <= big <= 2
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_sized_state_partitions_override(spark):
    # (the non-integer "auto" shuffle-partitions fallback in
    # sized_state_partitions stays as defensive code only: Spark 4.1's
    # conf.set validates the value as an int, so it cannot be simulated
    # through a real session here)
    try:
        spark.conf.set("spark.fs2kf.streaming.statePartitions", "13")
        assert R.sized_state_partitions(spark, SF, "events") == 13
    finally:
        spark.conf.unset("spark.fs2kf.streaming.statePartitions")


def test_scoped_state_partitions_restores_conf(spark):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    with R.scoped_state_partitions(spark, 3):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "3"
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    with pytest.raises(RuntimeError):
        with R.scoped_state_partitions(spark, 3):
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    # None = no-op
    with R.scoped_state_partitions(spark, None):
        assert spark.conf.get("spark.sql.shuffle.partitions") == prev


def test_auto_staging_removed_after_run(spark):
    stream = R.replay_parquet(spark, SF, "events")
    assert R._EPHEMERAL_STAGING, "auto staging should be registered"
    staging = R._EPHEMERAL_STAGING[-1]
    assert os.path.isdir(staging)
    out = R.run_to_memory(tumbling_counts(stream), output_mode="complete")
    assert out.count() > 0
    assert not os.path.exists(staging)
    assert not R._EPHEMERAL_STAGING


def test_explicit_staging_dir_preserved(spark, tmp_path):
    staging = str(tmp_path / "mine")
    stream = R.replay_parquet(spark, SF, "events", staging_dir=staging)
    R.run_to_memory(tumbling_counts(stream), output_mode="complete")
    assert os.path.isdir(staging), "caller-owned staging must not be deleted"


def test_state_partitions_pin_store_count(spark):
    stream = R.replay_parquet(spark, SF, "events")
    _, progress = R.run_to_memory_with_progress(
        tumbling_counts(stream), output_mode="complete", state_partitions=2
    )
    parts = {
        int(so.numShufflePartitions)
        for p in progress
        for so in p.stateOperators
        if so.numShufflePartitions is not None
    }
    assert parts == {2}


def test_stateful_results_partition_count_invariant(spark):
    def rows(n):
        stream = R.replay_parquet(spark, SF, "events")
        out = R.run_to_memory(
            tumbling_counts(stream), output_mode="complete", state_partitions=n
        )
        return sorted(tuple(r) for r in out.collect())

    assert rows(1) == rows(4)
