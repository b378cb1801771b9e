#!/usr/bin/env python
"""Full-catalog driver-mirror sweep: every registered query compared
against its DuckDB oracle at sf0.01 in a BARE session (default 1 GiB
driver heap, local[8]) — exactly what the grading driver runs.  The
definitive pre-round gate; ~12-15 min.

Usage: python scripts/sweep.py   # from the repo root (repo must be on sys.path)
"""
import sys

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
import fs2_kinesis_firehose_spark.queries as q  # noqa: E402
from fs2_kinesis_firehose_spark.oracle import compare_query  # noqa: E402

q.load_all()
bad = []
for name in sorted(q.QUERIES):
    try:
        if name in q.ORACLES:
            ok = compare_query(spark, name).match
        else:
            q.QUERIES[name](spark, "/root/testdata/sf0.01").count()
            ok = True
    except Exception as exc:
        ok = False
        print(name, "EXC", type(exc).__name__, str(exc)[:120], flush=True)
    print(("PASS" if ok else "FAIL"), name, flush=True)
    if not ok:
        bad.append(name)
print("SWEEP DONE; failures:", bad, flush=True)
sys.exit(1 if bad else 0)
