#!/usr/bin/env python
"""Synthesize /tmp/sf1: a 10x replica of the sf0.1 fixture for the scale
smoke (BENCH_sf1.json).  Diagnostic data, NOT a correctness fixture.

- TPC-H facts get disjoint key spaces per replica (offset 1e9; events/users
  1e12); nation/region stay fixed (TPC-H semantics: dimensions don't scale).
- Document text is perturbed per replica (every 3rd word tagged with the
  replica id) so replicas are NOT near-duplicates — keeps the dedup
  workload's candidate structure linear instead of quadratic in replication.
- Embedding components are circularly rotated per replica so replica vectors
  decorrelate (cross-replica cosine ~ random).

Usage: python scripts/gen_sf1.py   # then SPARK_GRAFT_SF_DIR=/tmp/sf1 python bench.py
"""
import time

from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
SRC, DST, REPS = "/root/testdata/sf0.1", "/tmp/sf1", 10
rep = F.col("rep")
K = 1_000_000_000  # TPC-H key offset per replica
E = 1_000_000_000_000  # event/user offset per replica


def replicate(table, keycols, offset=K, extra=None, n_out_files=8):
    df = spark.read.parquet(f"{SRC}/{table}.parquet")
    df = df.crossJoin(spark.range(REPS).select(F.col("id").alias("rep")))
    for c in keycols:
        df = df.withColumn(c, F.col(c) + rep * offset)
    if extra is not None:
        df = extra(df)
    df.drop("rep").repartition(n_out_files).write.mode("overwrite").parquet(
        f"{DST}/{table}.parquet"
    )
    print(table, "done")


def perturb_text(df):
    words = F.split(F.trim("text"), r"\s+")
    mutated = F.array_join(
        F.zip_with(
            words,
            F.sequence(F.lit(0), F.size(words) - 1),
            lambda w, i: F.when(
                (i % 3 == 0) & (rep > 0), F.concat(F.lit("r"), rep.cast("string"), w)
            ).otherwise(w),
        ),
        " ",
    )
    return df.withColumn("text", mutated).withColumn("n_chars", F.length("text"))


def rotate_vec(df):
    e = F.col("embedding")
    d = F.size(e)
    rot = F.concat(
        F.slice(e, (rep % d).cast("int") + 1, 10_000), F.slice(e, 1, (rep % d).cast("int"))
    )
    return df.withColumn("embedding", F.when(rep > 0, rot).otherwise(e))


if __name__ == "__main__":
    t0 = time.time()
    for t in ("region", "nation"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )
    replicate("customer", ["c_custkey"])
    replicate("supplier", ["s_suppkey"])
    replicate("part", ["p_partkey"])
    replicate("orders", ["o_orderkey", "o_custkey"])
    replicate("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"], n_out_files=32)
    replicate("events", ["event_id", "user_id"], offset=E)
    replicate("documents", ["doc_id"], extra=perturb_text)
    replicate("embeddings", ["vec_id"], extra=rotate_vec)
    print(f"ALL DONE in {time.time() - t0:.0f}s")
