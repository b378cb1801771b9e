"""Snapshot upsert (operators/upsert.py): per-key rules, version resolution,
schema validation."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from fs2_kinesis_firehose_spark.operators.upsert import upsert_snapshot


@pytest.fixture()
def snap(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, amt double",
    )


def test_insert_update_delete_unchanged(spark, snap):
    changes = spark.createDataFrame(
        [(2, "B", 22.0, False), (3, None, 0.0, True), (9, "z", 90.0, False)],
        "id long, name string, amt double, is_delete boolean",
    )
    out = upsert_snapshot(snap, changes, "id", delete_col="is_delete",
                          action_col="action")
    got = {r["id"]: (r["name"], r["amt"], r["action"]) for r in out.collect()}
    assert got == {
        1: ("a", 10.0, "unchanged"),
        2: ("B", 22.0, "updated"),
        9: ("z", 90.0, "inserted"),
    }
    # schema preserved when no audit column requested
    out2 = upsert_snapshot(snap, changes, "id", delete_col="is_delete")
    assert out2.columns == snap.columns


def test_version_latest_wins(spark, snap):
    changes = spark.createDataFrame(
        [(2, "old", 21.0, 1), (2, "new", 22.0, 5), (9, "z", 90.0, 1)],
        "id long, name string, amt double, v int",
    )
    out = upsert_snapshot(snap, changes, "id", version_col="v")
    got = {r["id"]: (r["name"], r["amt"]) for r in out.collect()}
    assert got[2] == ("new", 22.0) and got[9] == ("z", 90.0) and len(got) == 4


def test_missing_columns_rejected(spark, snap):
    bad = spark.createDataFrame([(1, "x")], "id long, name string")
    with pytest.raises(ValueError, match="amt"):
        upsert_snapshot(snap, bad, "id")


def test_determinism_under_repartition(spark, snap):
    changes = spark.createDataFrame(
        [(i, f"n{i}", float(i), False) for i in range(0, 200, 2)],
        "id long, name string, amt double, is_delete boolean",
    )
    a = sorted(upsert_snapshot(snap, changes, "id", delete_col="is_delete").collect())
    b = sorted(
        upsert_snapshot(
            snap.repartition(7), changes.repartition(5), "id", delete_col="is_delete"
        ).collect()
    )
    assert a == b


# --- scd2_apply ------------------------------------------------------------


@pytest.fixture()
def hist0(spark):
    return spark.createDataFrame(
        [(1, "a", 0, None), (2, "b", 0, None), (3, "c", 0, 5)],  # key 3 closed@5
        "id long, val string, valid_from long, valid_to long",
    )


def test_scd2_change_close_and_open(spark, hist0):
    from fs2_kinesis_firehose_spark.operators.upsert import scd2_apply

    changes = spark.createDataFrame(
        [(1, "A", 10), (9, "z", 10)], "id long, val string, change_ts long"
    )
    out = scd2_apply(hist0, changes, "id", "change_ts")
    rows = {(r["id"], r["val"], r["valid_from"], r["valid_to"]) for r in out.collect()}
    assert rows == {
        (1, "a", 0, 10),    # closed at change ts
        (1, "A", 10, None), # new current
        (2, "b", 0, None),  # untouched current
        (3, "c", 0, 5),     # closed history never touched
        (9, "z", 10, None), # brand-new key
    }


def test_scd2_noop_change_creates_no_version(spark, hist0):
    from fs2_kinesis_firehose_spark.operators.upsert import scd2_apply

    noop = spark.createDataFrame([(2, "b", 10)], "id long, val string, change_ts long")
    out = scd2_apply(hist0, noop, "id", "change_ts")
    assert sorted(out.collect()) == sorted(hist0.collect())


def test_scd2_chained_batches(spark, hist0):
    from fs2_kinesis_firehose_spark.operators.upsert import scd2_apply

    b1 = spark.createDataFrame([(1, "A", 10)], "id long, val string, change_ts long")
    b2 = spark.createDataFrame([(1, "AA", 20)], "id long, val string, change_ts long")
    out = scd2_apply(scd2_apply(hist0, b1, "id", "change_ts"), b2, "id", "change_ts")
    one = sorted(
        (r["val"], r["valid_from"], r["valid_to"])
        for r in out.where("id = 1").collect()
    )
    assert one == [("A", 10, 20), ("AA", 20, None), ("a", 0, 10)]


def test_scd2_multi_tick_chain_in_one_batch(spark, hist0):
    # TWO ticks for one key in a single batch: the in-batch chain must
    # close each version at the next tick, matching chained single-tick
    # applies exactly
    from fs2_kinesis_firehose_spark.operators.upsert import scd2_apply

    batch = spark.createDataFrame(
        [(1, "A", 10), (1, "AA", 20)], "id long, val string, change_ts long"
    )
    out = scd2_apply(hist0, batch, "id", "change_ts")
    one = sorted(
        (r["val"], r["valid_from"], r["valid_to"])
        for r in out.where("id = 1").collect()
    )
    assert one == [("A", 10, 20), ("AA", 20, None), ("a", 0, 10)]
    # and equals the chained two-batch application
    b1 = spark.createDataFrame([(1, "A", 10)], "id long, val string, change_ts long")
    b2 = spark.createDataFrame([(1, "AA", 20)], "id long, val string, change_ts long")
    chained = scd2_apply(scd2_apply(hist0, b1, "id", "change_ts"), b2, "id", "change_ts")
    assert sorted(out.collect()) == sorted(chained.collect())


def test_scd2_multi_tick_noop_links_suppressed(spark, hist0):
    from fs2_kinesis_firehose_spark.operators.upsert import scd2_apply

    # leading resend of the current version (no-op) followed by a real
    # change: current closes at the REAL change's ts; and an in-batch
    # duplicate run (B@30 after B@20) adds no version
    batch = spark.createDataFrame(
        [(1, "a", 10), (1, "B", 20), (1, "B", 30)],
        "id long, val string, change_ts long",
    )
    out = scd2_apply(hist0, batch, "id", "change_ts")
    one = sorted(
        (r["val"], r["valid_from"], r["valid_to"])
        for r in out.where("id = 1").collect()
    )
    assert one == [("B", 20, None), ("a", 0, 20)]
    # value returning to an earlier state IS a new version (run-boundary,
    # not set-membership, semantics)
    back = spark.createDataFrame(
        [(2, "x", 10), (2, "b", 20)], "id long, val string, change_ts long"
    )
    two = sorted(
        (r["val"], r["valid_from"], r["valid_to"])
        for r in scd2_apply(hist0, back, "id", "change_ts").where("id = 2").collect()
    )
    assert two == [("b", 0, 10), ("b", 20, None), ("x", 10, 20)]


def test_scd2_null_key_current_rows_pass_through(spark):
    # lossless contract: a NULL-key CURRENT row cannot match any change and
    # must survive the apply unchanged (regression: it used to vanish)
    from fs2_kinesis_firehose_spark.operators.upsert import scd2_apply

    hist = spark.createDataFrame(
        [(None, "orphan", 0, None), (None, "closed", 0, 5), (1, "a", 0, None)],
        "id long, val string, valid_from long, valid_to long",
    )
    changes = spark.createDataFrame(
        [(1, "A", 10)], "id long, val string, change_ts long"
    )
    out = scd2_apply(hist, changes, "id", "change_ts")
    null_rows = sorted(
        (r["val"], r["valid_from"], r["valid_to"])
        for r in out.where("id IS NULL").collect()
    )
    assert null_rows == [("closed", 0, 5), ("orphan", 0, None)]


def test_scd2_missing_columns_rejected(spark, hist0):
    from fs2_kinesis_firehose_spark.operators.upsert import scd2_apply

    bad = spark.createDataFrame([(1, 10)], "id long, change_ts long")
    with pytest.raises(ValueError, match="val"):
        scd2_apply(hist0, bad, "id", "change_ts")


def test_null_key_changes_dropped(spark, snap):
    # a dirty CDC row with a NULL key must not produce a phantom output row
    changes = spark.createDataFrame(
        [(None, "x", 1.0, False), (2, "B", 22.0, False)],
        "id long, name string, amt double, is_delete boolean",
    )
    out = upsert_snapshot(snap, changes, "id", delete_col="is_delete")
    assert out.where("id IS NULL").count() == 0
    assert out.count() == 3  # 1 unchanged ×2 + 1 updated


def test_scd2_single_tick_fast_path_matches_chain_path(spark, hist0):
    """single_tick=True (codegen fast path) must produce the identical
    history as the chain path on any 1-tick-per-key batch — change, no-op
    resend, new key, NULL-key change, NULL-key current row, all at once."""
    from fs2_kinesis_firehose_spark.operators.upsert import scd2_apply

    hist = hist0.unionByName(
        spark.createDataFrame(
            [(None, "nk", 0, None)],
            "id long, val string, valid_from long, valid_to long",
        )
    )
    changes = spark.createDataFrame(
        [(1, "A", 10), (2, "b", 10), (9, "z", 10), (None, "drop", 10)],
        "id long, val string, change_ts long",
    )
    slow = scd2_apply(hist, changes, "id", "change_ts")
    fast = scd2_apply(hist, changes, "id", "change_ts", single_tick=True)
    key = lambda r: (
        repr(r["id"]), r["val"], r["valid_from"], repr(r["valid_to"])
    )
    assert sorted(map(key, slow.collect())) == sorted(map(key, fast.collect()))


def test_scd2_single_tick_chained_batches(spark, hist0):
    from fs2_kinesis_firehose_spark.operators.upsert import scd2_apply

    b1 = spark.createDataFrame([(1, "A", 10)], "id long, val string, change_ts long")
    b2 = spark.createDataFrame([(1, "AA", 20)], "id long, val string, change_ts long")
    out = scd2_apply(
        scd2_apply(hist0, b1, "id", "change_ts", single_tick=True),
        b2, "id", "change_ts", single_tick=True,
    )
    one = sorted(
        (r["val"], r["valid_from"], r["valid_to"])
        for r in out.where("id = 1").collect()
    )
    assert one == [("A", 10, 20), ("AA", 20, None), ("a", 0, 10)]


def test_snapshot_diff_classifies_and_emits_new_side(spark):
    from fs2_kinesis_firehose_spark.operators.upsert import snapshot_diff

    old = spark.createDataFrame(
        [Row(k=1, v="a", w=1.0), Row(k=2, v="b", w=2.0), Row(k=3, v="c", w=3.0)]
    )
    new = spark.createDataFrame(
        [Row(k=1, v="a", w=1.0), Row(k=2, v="B", w=2.0), Row(k=4, v="d", w=4.0)]
    )
    out = {r.k: r for r in snapshot_diff(old, new, "k").collect()}
    assert out[1].action == "unchanged"
    assert out[2].action == "changed" and out[2].v == "B"  # new side wins
    assert out[3].action == "removed" and out[3].v == "c"  # old side kept
    assert out[4].action == "added" and out[4].w == 4.0
    assert set(snapshot_diff(old, new, "k").columns) == {"k", "v", "w", "action"}


def test_snapshot_diff_null_safe_compare(spark):
    from fs2_kinesis_firehose_spark.operators.upsert import snapshot_diff

    schema = "k long, v string"
    old = spark.createDataFrame([(1, None), (2, None), (3, "x")], schema)
    new = spark.createDataFrame([(1, None), (2, "y"), (3, None)], schema)
    out = {r.k: r.action for r in snapshot_diff(old, new, "k").collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "changed"}


def test_snapshot_diff_recovers_upsert_effect(spark):
    from fs2_kinesis_firehose_spark.operators.upsert import (
        snapshot_diff,
        upsert_snapshot,
    )

    snap = spark.createDataFrame(
        [Row(k=1, v=10), Row(k=2, v=20), Row(k=3, v=30)]
    )
    changes = spark.createDataFrame(
        [
            Row(k=2, v=21, is_delete=False),   # update
            Row(k=3, v=30, is_delete=True),    # delete
            Row(k=4, v=40, is_delete=False),   # insert
        ]
    )
    merged = upsert_snapshot(snap, changes, "k", delete_col="is_delete")
    out = {r.k: r.action for r in snapshot_diff(snap, merged, "k").collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_snapshot_diff_missing_compare_col_raises(spark):
    import pytest

    from fs2_kinesis_firehose_spark.operators.upsert import snapshot_diff

    old = spark.createDataFrame([Row(k=1, v=1, extra=1)])
    new = spark.createDataFrame([Row(k=1, v=1)])
    with pytest.raises(ValueError, match="extra"):
        snapshot_diff(old, new, "k")


def test_snapshot_diff_null_keys_pair_and_classify_by_presence(spark):
    """Side membership uses presence flags, not key nullness: a NULL-keyed
    old-only row is 'removed' (not 'added'), and NULL keys on both sides
    pair via the null-safe join (r12 advisory fix)."""
    from fs2_kinesis_firehose_spark.operators.upsert import snapshot_diff

    schema = "k long, v string"
    old = spark.createDataFrame([(None, "x"), (1, "a")], schema)
    new = spark.createDataFrame([(None, "y"), (2, "b")], schema)
    out = {(r.k, r.action) for r in snapshot_diff(old, new, "k").collect()}
    assert out == {(None, "changed"), (1, "removed"), (2, "added")}

    old2 = spark.createDataFrame([(None, "only-old")], schema)
    new2 = spark.createDataFrame([(5, "n")], schema)
    out2 = {(r.k, r.action, r.v) for r in snapshot_diff(old2, new2, "k").collect()}
    assert out2 == {(None, "removed", "only-old"), (5, "added", "n")}


def test_scd2_point_in_time_join_reads_version_in_force(spark):
    from fs2_kinesis_firehose_spark.operators.upsert import scd2_point_in_time_join

    hist = spark.createDataFrame(
        [
            Row(k=1, v="a", valid_from=0, valid_to=1000),
            Row(k=1, v="b", valid_from=1000, valid_to=None),
            Row(k=2, v="z", valid_from=500, valid_to=None),
        ]
    )
    facts = spark.createDataFrame(
        [Row(k=1, ts=0), Row(k=1, ts=999), Row(k=1, ts=1000), Row(k=2, ts=100), Row(k=2, ts=600)]
    )
    out = {(r.k, r.ts): r.v for r in scd2_point_in_time_join(hist, facts, "k", "ts").collect()}
    # boundary semantics: from inclusive, to exclusive; open version = NULL to
    assert out == {(1, 0): "a", (1, 999): "a", (1, 1000): "b", (2, 600): "z"}
    # (2, 100) predates key 2's first version → dropped (inner join)


def test_scd2_point_in_time_join_column_clash_raises(spark):
    import pytest

    from fs2_kinesis_firehose_spark.operators.upsert import scd2_point_in_time_join

    hist = spark.createDataFrame(
        [(1, "a", 0, None)], "k long, v string, valid_from long, valid_to long"
    )
    facts = spark.createDataFrame([Row(k=1, ts=0, v="fact-side")])
    with pytest.raises(ValueError, match="clash"):
        scd2_point_in_time_join(hist, facts, "k", "ts")
