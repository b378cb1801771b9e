"""Idempotent foreachBatch sink: exactly-once file output over an
at-least-once engine.

Structured Streaming guarantees foreachBatch is called with a monotonically
increasing ``batch_id``, but a failure after a partial write replays the
SAME batch — a plain append would duplicate it.  Writing each micro-batch
into its own ``_batch_id`` partition with DYNAMIC partition overwrite makes
the replay overwrite exactly its own partition and nothing else: the write
becomes idempotent, so at-least-once delivery + idempotent sink =
exactly-once file output (the standard Spark recipe; same role as the
reference's at-least-once caveat in SURVEY §7 hard-part 3, solved on the
sink side)."""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def idempotent_parquet_sink(path: str) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` function writing each micro-batch to
    ``path/_batch_id=N`` with dynamic partition overwrite (replay-safe)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(path)
        )

    return sink
