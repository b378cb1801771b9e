#!/usr/bin/env python
"""Break down WHERE an availableNow streaming run spends its time (r15
optimization round: the streaming micro-batch fixed cost is the largest
addressable block per the r14 verdict).

For each rep the script runs the tumbling-counts shape (replay_parquet ->
window agg -> memory sink) three ways:
  tmp   - checkpointLocation on the system tmpdir (disk-backed /tmp)
  shm   - checkpointLocation on /dev/shm (tmpfs)
  none  - no explicit checkpoint (Spark's temp checkpoint, java.io.tmpdir)

and prints wall time split into stage (file staging), build (plan), and
run (start->awaitTermination), plus the engine's own per-batch durationMs
breakdown (triggerExecution / queryPlanning / walCommit / addBatch /
commitOffsets / getBatch / latestOffset) from recentProgress.

Usage: PYTHONPATH=/root/repo python scripts/profile_streaming.py [--sf DIR]
"""
from __future__ import annotations

import argparse
import shutil
import time
import uuid

ap = argparse.ArgumentParser()
ap.add_argument("--sf", default="/root/testdata/sf0.1")
ap.add_argument("--reps", type=int, default=3)
args = ap.parse_args()

from fs2_kinesis_firehose_spark.session import get_spark  # noqa: E402
from fs2_kinesis_firehose_spark.streaming.replay import replay_parquet  # noqa: E402
from fs2_kinesis_firehose_spark.streaming.windows import tumbling_counts  # noqa: E402

spark = get_spark("profile-streaming")
spark.range(1_000_000).selectExpr("sum(id)").collect()


def one(ckpt_base: str | None) -> tuple[float, float, float, list]:
    t0 = time.perf_counter()
    stream = replay_parquet(spark, args.sf, "events")
    t_stage = time.perf_counter() - t0
    agg = tumbling_counts(stream)
    name = f"mem_{uuid.uuid4().hex[:12]}"
    w = agg.writeStream.format("memory").queryName(name).outputMode("complete")
    ckpt = None
    if ckpt_base is not None:
        ckpt = f"{ckpt_base}/ckpt-{uuid.uuid4().hex[:8]}"
        w = w.option("checkpointLocation", ckpt)
    t1 = time.perf_counter()
    q = w.trigger(availableNow=True).start()
    q.awaitTermination()
    prog = list(q.recentProgress)
    if q.isActive:
        q.stop()
    t_run = time.perf_counter() - t1
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    if ckpt:
        shutil.rmtree(ckpt, ignore_errors=True)
    return t_stage, t1 - t0 - t_stage, t_run, prog


# warm the plan/codegen/python paths once
one(None)

for label, base in [("none", None), ("tmp", "/tmp/prof-ckpt"), ("shm", "/dev/shm/prof-ckpt")]:
    for rep in range(args.reps):
        t_stage, t_build, t_run, prog = one(base)
        total = t_stage + t_build + t_run
        batches = []
        for p in prog:
            d = p["durationMs"] if isinstance(p, dict) else p.durationMs
            batches.append(d)
        print(f"{label} rep{rep}: total={total:.3f}s stage={t_stage:.3f} "
              f"build={t_build:.3f} run={t_run:.3f} batches={len(batches)}")
        for i, d in enumerate(batches):
            print(f"    batch{i}: " + " ".join(f"{k}={v}" for k, v in sorted(d.items())))
