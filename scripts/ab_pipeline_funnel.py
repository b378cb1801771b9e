#!/usr/bin/env python
"""Same-box A/B of pipeline_dedup_delivery_accounting's delivery-leg funnel:
ordered coalesce(1) vs unordered repartition(1) (r11 verdict "What's wrong"
#1 — the applied ordered=False funnel measured SLOWER in both recorded
benches despite the r10 quiet-box A/B that justified it).

Protocol: one bare driver-like session, warm both variants once at sf0.001,
then ALTERNATE variants for --reps timed runs each at the target sf (catalog
cache cleared between runs, same as bench.py), report per-variant min/median.
Alternation cancels slow box drift; min-of-N cancels GC/compaction spikes.

Usage:
  PYTHONPATH=/root/repo python scripts/ab_pipeline_funnel.py \
      [--sf /root/testdata/sf0.1] [--reps 3]
"""
from __future__ import annotations

import argparse
import statistics
import time

from pyspark.sql import SparkSession

ap = argparse.ArgumentParser()
ap.add_argument("--sf", default="/root/testdata/sf0.1")
ap.add_argument("--reps", type=int, default=3)
args = ap.parse_args()

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

import fs2_kinesis_firehose_spark.queries.sinkq as sinkq  # noqa: E402

q = sinkq.pipeline_dedup_delivery_accounting


def run(ordered: bool, sf: str) -> float:
    sinkq._PIPELINE_DELIVERY_ORDERED = ordered
    spark.catalog.clearCache()
    t0 = time.monotonic()
    q(spark, sf).collect()
    return time.monotonic() - t0


# warm both plans (codegen, parquet footers) at tiny sf
for o in (True, False):
    run(o, "/root/testdata/sf0.001")

times: dict[bool, list[float]] = {True: [], False: []}
for rep in range(args.reps):
    for o in (True, False):
        t = run(o, args.sf)
        times[o].append(t)
        print(f"rep {rep} ordered={o}: {t:.2f}s", flush=True)

for o in (True, False):
    ts = times[o]
    print(
        f"ordered={o}: min={min(ts):.2f}s median={statistics.median(ts):.2f}s "
        f"all={[round(t, 2) for t in ts]}"
    )
