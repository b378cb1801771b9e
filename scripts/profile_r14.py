#!/usr/bin/env python
"""r14 optimization-round profiler: solo timing + job/stage counts +
explain("formatted") capture for named queries.

Usage:
  PYTHONPATH=/root/repo python scripts/profile_r14.py \
      [--sf /root/testdata/sf0.1] [--reps 3] [--plans plans/r14] \
      [--tag before] query1 query2 ...

Per query: warm once at sf0.001 (plan compile + worker spinup), then
``reps`` timed noop-sink passes at the target sf (cache cleared + gc
between passes, min kept), job/stage counts from the LAST pass via a job
group (streaming foreachBatch jobs run on other threads and are not
group-tagged — wall time still covers them).  With --plans/--tag the
returned DataFrame's explain("formatted") is written to
``<plans>/<query>_<tag>.txt``.
"""
from __future__ import annotations

import argparse
import gc
import os
import time

ap = argparse.ArgumentParser()
ap.add_argument("--sf", default="/root/testdata/sf0.1")
ap.add_argument("--reps", type=int, default=3)
ap.add_argument("--plans", default=None)
ap.add_argument("--tag", default=None)
ap.add_argument("--no-warm", action="store_true")
ap.add_argument("names", nargs="+")
args = ap.parse_args()

from fs2_kinesis_firehose_spark.session import get_spark  # noqa: E402

spark = get_spark("profile-r14")
import fs2_kinesis_firehose_spark.queries as q  # noqa: E402

q.load_all()
sc = spark.sparkContext
tracker = sc.statusTracker()


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


spark.range(1_000_000).selectExpr("sum(id)").collect()
results = {}
for name in args.names:
    fn = q.QUERIES[name]
    if not args.no_warm:
        try:
            materialize(fn(spark, "/root/testdata/sf0.001"))
        except Exception as exc:
            print(f"  warm {name} failed: {exc}", flush=True)
    best, last_df = None, None
    jobs = stages = tasks = 0
    for rep in range(args.reps):
        spark.catalog.clearCache()
        gc.collect()
        group = f"prof-{name}-{rep}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        df = fn(spark, args.sf)
        t_build = time.perf_counter() - t0
        materialize(df)
        dt = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        if best is None or dt < best:
            best = dt
            last_df = df
            jids = tracker.getJobIdsForGroup(group)
            jobs = len(jids)
            stages = tasks = 0
            for j in jids:
                ji = tracker.getJobInfo(j)
                if ji is None:
                    continue
                stages += len(ji.stageIds)
                for s in ji.stageIds:
                    si = tracker.getStageInfo(s)
                    if si is not None:
                        tasks += si.numTasks
        print(
            f"  {name} rep{rep}: {dt:.3f}s (build {t_build:.3f}s)", flush=True
        )
    results[name] = (best, jobs, stages, tasks)
    print(
        f"{name}: min {best:.3f}s  jobs={jobs} stages={stages} tasks={tasks}",
        flush=True,
    )
    if args.plans and args.tag and last_df is not None:
        os.makedirs(args.plans, exist_ok=True)
        path = os.path.join(args.plans, f"{name}_{args.tag}.txt")
        # the same internal DataFrame.explain() prints through
        txt = last_df._sc._jvm.PythonSQLUtils.explainString(
            last_df._jdf.queryExecution(), "formatted"
        )
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"  wrote {path}", flush=True)

print("\n=== summary ===")
for name, (best, jobs, stages, tasks) in results.items():
    print(f"{name:45s} {best:7.3f}s jobs={jobs:3d} stages={stages:3d} tasks={tasks}")
