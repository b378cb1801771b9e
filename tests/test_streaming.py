"""Streaming semantics tests: watermark late-data behavior, incremental
multi-batch processing, session merging — the paths the complete-mode oracle
queries can't show."""

from __future__ import annotations

import datetime as dt
import shutil

from pyspark.sql import functions as F

from fs2_kinesis_firehose_spark.streaming.replay import replay_parquet, run_to_memory
from fs2_kinesis_firehose_spark.streaming.windows import stream_dedup, tumbling_counts
from fs2_kinesis_firehose_spark.tables import load_table


def test_replay_matches_batch_read(spark, sf_smoke):
    stream = replay_parquet(spark, sf_smoke, "events")
    out = run_to_memory(stream.select("event_id"), output_mode="append")
    assert out.count() == load_table(spark, sf_smoke, "events").count()


def test_incremental_micro_batches(spark, sf_smoke, tmp_path):
    """maxFilesPerTrigger=1 over 3 file copies → ≥3 micro-batches; dedup
    across batches still yields exactly-once."""
    stream = replay_parquet(
        spark, sf_smoke, "events", copies=3,
        staging_dir=str(tmp_path / "replay"), max_files_per_trigger=1,
    )
    deduped = run_to_memory(
        stream_dedup(stream, watermark=None).select("event_id"), output_mode="append"
    )
    n = load_table(spark, sf_smoke, "events").count()
    assert deduped.count() == n


def _write_batch_parquet(spark, rows, path):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).coalesce(1).write.mode("append").parquet(path)


def test_watermark_drops_late_rows(spark, tmp_path):
    """Late data is dropped once its window has been evicted: batch 2 advances
    the watermark past the 10:00 window (emitting it); the too-late row in
    batch 4 must not re-open or re-emit it.  (A late row arriving in the SAME
    batch that evicts the window still merges — the watermark is an eviction
    lower bound, so the extra batch in between is what makes the drop
    deterministic.)"""
    import time

    src = str(tmp_path / "src")
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    def ev(i, minutes):
        return (i, t0 + dt.timedelta(minutes=minutes), 1, "click", 1.0)

    for batch in ([ev(1, 0), ev(2, 5)], [ev(3, 60)], [ev(5, 70)], [ev(4, 2)]):
        _write_batch_parquet(spark, batch, src)
        time.sleep(1.1)  # distinct mod-times → deterministic file order

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.date_format("win.start", "HH:mm").alias("w"), "n")
    )
    out = run_to_memory(agg, output_mode="append")
    got = {(r.w, r.n) for r in out.collect()}
    # the 10:00 window closed with exactly 2 events; the late event_id=4
    # never reopened it (no (10:00, 3) and no second 10:00 row)
    assert ("10:00", 2) in got
    assert ("10:00", 3) not in got
    assert ("10:00", 1) not in got


def test_two_watermarks_late_filter_lags_eviction(spark, tmp_path):
    """Spark keeps TWO per-batch watermark values: eviction uses the current
    one, but LATE-ROW FILTERING uses the previous batch's — so a straggler
    arriving in the very next batch after the advance still merges, and only
    a straggler arriving TWO batches later is dropped.  This is the contract
    streaming_late_data_accounting's three-phase replay depends on."""
    from fs2_kinesis_firehose_spark.streaming.replay import (
        replay_phased,
        run_to_memory_with_progress,
    )

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    mk = lambda *rows: spark.createDataFrame(  # noqa: E731
        [(i, t0 + dt.timedelta(minutes=m)) for i, m in rows], "id long, ts timestamp"
    )
    agg_of = lambda s: (  # noqa: E731
        s.withWatermark("ts", "5 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # 2 phases: advance then straggle — NOT dropped (late filter lagged)
    two = replay_phased(
        spark, [mk((1, 0), (2, 60)), mk((3, 2))], staging_dir=str(tmp_path / "two")
    )
    _, prog2 = run_to_memory_with_progress(agg_of(two), output_mode="append")
    dropped2 = sum(
        int(so.numRowsDroppedByWatermark) for p in prog2 for so in p.stateOperators
    )
    assert dropped2 == 0

    # 3 phases: advance, anything, straggle — dropped
    three = replay_phased(
        spark,
        [mk((1, 0), (2, 60)), mk((4, 61)), mk((3, 2))],
        staging_dir=str(tmp_path / "three"),
    )
    sink3, prog3 = run_to_memory_with_progress(agg_of(three), output_mode="append")
    dropped3 = sum(
        int(so.numRowsDroppedByWatermark) for p in prog3 for so in p.stateOperators
    )
    assert dropped3 > 0
    # and the dropped straggler's window stays closed at its original count
    got = {
        (r.start.strftime("%H:%M"), r.n)
        for r in sink3.select("w.start", "n").collect()
    }
    assert ("10:00", 1) in got and ("10:00", 2) not in got


def test_dedup_within_watermark_state_expiry(spark, tmp_path):
    """dropDuplicatesWithinWatermark is the bounded-state dedup, and the
    bound cuts BOTH ways once a key's state ages out (watermark > ts +
    delay): an over-LATE duplicate (old event time, below the watermark)
    is dropped by the late-row filter, while a FRESH-timestamped reuse of
    the expired key is RE-ADMITTED — the honest trade that keeps state
    finite at 100 TB/day.  Three-phase replay (the two-watermark lag means
    expiry needs two batches to bite, same as the late-data test above)."""
    from fs2_kinesis_firehose_spark.streaming.replay import (
        replay_phased,
        run_to_memory_with_progress,
    )
    from fs2_kinesis_firehose_spark.streaming.windows import stream_dedup

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    mk = lambda *rows: spark.createDataFrame(  # noqa: E731
        [(k, t0 + dt.timedelta(minutes=m)) for k, m in rows],
        "event_id long, ts timestamp",
    )
    # phase 0: key 1 plus an in-batch duplicate, and a far-future row that
    # advances the watermark (11:30) way past key 1's state lifetime
    # (10:00 + 30 min); phase 1: anything (lag batch); phase 2: one LATE
    # duplicate of key 1 (10:01 < watermark → dropped) and one FRESH
    # reuse (12:30 ≥ watermark, state expired → re-admitted)
    stream = replay_phased(
        spark,
        [mk((1, 0), (1, 0), (9, 120)), mk((8, 121)), mk((1, 1), (1, 150))],
        staging_dir=str(tmp_path / "phases"),
    )
    out, _ = run_to_memory_with_progress(
        stream_dedup(stream, watermark="30 minutes"), output_mode="append"
    )
    per_key = {
        r.event_id: r.n
        for r in out.groupBy("event_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_key == {1: 2, 8: 1, 9: 1}


def test_dedup_within_watermark_drops_live_state_duplicate(spark, tmp_path):
    """Counter-case: a duplicate arriving in a later batch while the key's
    state is still live (watermark has NOT passed ts + delay) is dropped."""
    from fs2_kinesis_firehose_spark.streaming.replay import (
        replay_phased,
        run_to_memory_with_progress,
    )
    from fs2_kinesis_firehose_spark.streaming.windows import stream_dedup

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    mk = lambda *rows: spark.createDataFrame(  # noqa: E731
        [(k, t0 + dt.timedelta(minutes=m)) for k, m in rows],
        "event_id long, ts timestamp",
    )
    stream = replay_phased(
        spark,
        [mk((1, 0), (9, 5)), mk((8, 6)), mk((1, 0))],  # watermark stays < 10:00
        staging_dir=str(tmp_path / "phases"),
    )
    out, _ = run_to_memory_with_progress(
        stream_dedup(stream, watermark="30 minutes"), output_mode="append"
    )
    per_key = {
        r.event_id: r.n
        for r in out.groupBy("event_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_key == {1: 1, 8: 1, 9: 1}


def test_tumbling_counts_schema(spark, sf_smoke):
    stream = replay_parquet(spark, sf_smoke, "events")
    out = run_to_memory(tumbling_counts(stream), output_mode="complete")
    assert set(out.columns) == {"window_start", "event_type", "n_events", "sum_value"}
    assert out.count() > 0


def test_rocksdb_state_store_tumbling_counts(spark, sf_smoke, tmp_path):
    """The 100-TB streaming-state path: RocksDB state store (spillable,
    off-heap) instead of the default in-memory HDFS-backed provider, which
    OOMs at large key cardinality.  Same query, same results — the provider
    is a config, not a semantics change."""
    from fs2_kinesis_firehose_spark.streaming.replay import replay_parquet, run_to_memory
    from fs2_kinesis_firehose_spark.streaming.windows import tumbling_counts

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = replay_parquet(spark, sf_smoke, "events")
        got = run_to_memory(tumbling_counts(stream), output_mode="complete")
        rocks_rows = {tuple(r) for r in got.collect()}
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)
    stream2 = replay_parquet(spark, sf_smoke, "events")
    default_rows = {
        tuple(r) for r in run_to_memory(tumbling_counts(stream2), output_mode="complete").collect()
    }
    assert rocks_rows == default_rows
    assert len(rocks_rows) > 0


def test_incremental_neardup_matches_batch_ground_truth(spark, sf_smoke):
    """The streamed incoming-vs-corpus dup counts must equal the batch
    exact-Jaccard pair set restricted to (even corpus, odd incoming)."""
    import fs2_kinesis_firehose_spark.queries as q
    from fs2_kinesis_firehose_spark.operators import dedup as D
    from fs2_kinesis_firehose_spark.tables import load_table

    q.load_all()
    got = {
        r["doc_id"]: r["n_corpus_dups"]
        for r in q.QUERIES["streaming_incremental_neardup"](spark, sf_smoke).collect()
    }
    docs = load_table(spark, sf_smoke, "documents")
    pairs = D.ngram_jaccard_pairs(docs, "text", "doc_id", shingle_n=3, threshold=0.7)
    want: dict[int, int] = {}
    for r in pairs.collect():
        for corpus, inc in ((r["key1"], r["key2"]), (r["key2"], r["key1"])):
            if corpus % 2 == 0 and inc % 2 == 1:
                want[inc] = want.get(inc, 0) + 1
    assert got == want


def test_stream_stream_left_outer_emits_null_on_timeout(spark, tmp_path):
    """LEFT OUTER stream-stream join (attribution-with-absence): a trigger
    with no qualifying touch emits (trigger_id, NULL) only after its join
    state times out — the watermark must pass the last instant a match
    could arrive, and eviction uses the PREVIOUS batch's watermark (the
    same two-watermark lag the dedup/late-data tests pin), hence the
    three-phase replay.  Matched rows emit immediately; unmatched triggers
    still inside the state lifetime at query end never emit (the honest
    streaming contract: absence is only provable once time has passed)."""
    from fs2_kinesis_firehose_spark.streaming.joins import attribution_join
    from fs2_kinesis_firehose_spark.streaming.replay import (
        replay_phased,
        run_to_memory_with_progress,
    )

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    mk = lambda *rows: spark.createDataFrame(  # noqa: E731
        [
            (uid, t0 + dt.timedelta(minutes=m), eid, et)
            for uid, m, eid, et in rows
        ],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    # phase 0: user 1 purchase@10:00 with click@9:55 (match); user 2
    # purchase@10:00 with NO click (the absence under test).
    # phase 1: far-future advancer pair on non-matching users (purchase
    # for the trigger side's watermark, click for the touch side's) —
    # watermark lands at 12:00 - 30min = 11:30 > 10:00, so user 2's state
    # is now evictable.
    # phase 2: another advancer batch — eviction in THIS batch uses phase
    # 1's 11:30 watermark and finally emits the NULL row.
    phases = [
        mk((1, -5, 100, "click"), (1, 0, 1, "purchase"), (2, 0, 2, "purchase")),
        mk((9, 120, 900, "purchase"), (8, 120, 800, "click")),
        mk((7, 150, 700, "purchase"), (6, 150, 600, "click")),
    ]
    left = replay_phased(spark, phases, staging_dir=str(tmp_path / "l"))
    right = replay_phased(spark, phases, staging_dir=str(tmp_path / "r"))
    out, _ = run_to_memory_with_progress(
        attribution_join(left, right, how="left_outer"), output_mode="append"
    )
    rows = {(r.user_id, r.trigger_id, r.touch_id) for r in out.collect()}
    assert (1, 1, 100) in rows  # the match emits with its touch
    assert (2, 2, None) in rows  # the timed-out absence emits NULL
    # advancer purchases (12:00/12:30) are still within their state
    # lifetime at query end — no premature NULLs for them
    assert not {r for r in rows if r[0] in (7, 9)}


def test_stream_stream_left_outer_matches_inner_plus_absences(spark, sf_smoke):
    """On a full single-batch replay the left-outer output is exactly the
    batch inner-join rows PLUS one NULL row per unmatched trigger whose
    event time is below the final global watermark (the end-of-batch
    no-data finalization evicts and emits those); unmatched triggers still
    inside the watermark horizon are held, not emitted."""
    import datetime as _dt

    from fs2_kinesis_firehose_spark.streaming.joins import attribution_join

    s1 = replay_parquet(spark, sf_smoke, "events")
    s2 = replay_parquet(spark, sf_smoke, "events")
    outer = run_to_memory(
        attribution_join(s1, s2, how="left_outer"), output_mode="append"
    )
    got = {(r.user_id, r.trigger_id, r.touch_id) for r in outer.collect()}

    ev = load_table(spark, sf_smoke, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u"), F.col("ts").alias("pts"), F.col("event_id").alias("pid")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts"), F.col("event_id").alias("cid")
    )
    inner = p.join(
        c, F.expr("u = cu AND cts >= pts - interval 10 minutes AND cts <= pts")
    )
    want = {(r.u, r.pid, r.cid) for r in inner.collect()}
    # global watermark = min over both sides' (max event time - delay)
    maxp = p.agg(F.max("pts")).collect()[0][0]
    maxc = c.agg(F.max("cts")).collect()[0][0]
    wm = min(maxp, maxc) - _dt.timedelta(minutes=30)
    matched = {t for _, t, _ in want}
    want |= {
        (r.u, r.pid, None)
        for r in p.filter(F.col("pts") < F.lit(wm)).collect()
        if r.pid not in matched
    }
    assert got == want
