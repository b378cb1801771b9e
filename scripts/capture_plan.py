#!/usr/bin/env python
"""Capture explain("formatted") for named queries WITHOUT timed passes.

Builds each query's DataFrame at the given sf and writes the formatted
physical plan to ``<plans>/<query>_<tag>.txt``.  Build-only: nothing is
materialized through a sink, so this is cheap for batch queries (streaming
queries still execute their pipeline at build time — their returned frame
is the sink read-back, which is what gets captured, same as the r14
streaming_ann_serving_topk_before capture).

Usage:
  PYTHONPATH=/root/repo python scripts/capture_plan.py \
      [--sf /root/testdata/sf0.1] [--plans plans/r14] --tag after q1 q2 ...
"""
from __future__ import annotations

import argparse
import os

ap = argparse.ArgumentParser()
ap.add_argument("--sf", default="/root/testdata/sf0.1")
ap.add_argument("--plans", default="plans/r14")
ap.add_argument("--tag", required=True)
ap.add_argument("names", nargs="+")
args = ap.parse_args()

from fs2_kinesis_firehose_spark.session import get_spark  # noqa: E402

spark = get_spark("capture-plan")
import fs2_kinesis_firehose_spark.queries as q  # noqa: E402

q.load_all()
os.makedirs(args.plans, exist_ok=True)
for name in args.names:
    df = q.QUERIES[name](spark, args.sf)
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(args.plans, f"{name}_{args.tag}.txt")
    with open(path, "w") as fh:
        fh.write(txt)
    print(f"wrote {path} ({len(txt.splitlines())} lines)", flush=True)
