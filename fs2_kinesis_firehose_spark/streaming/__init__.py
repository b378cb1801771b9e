"""Structured Streaming surface: replay sources, event-time windows,
watermarks, session windows, streaming dedup, stream-static joins.

The reference's only streaming notion is processing-time ``groupWithin``
batching (firehose.scala:71) — realized in ``firehose.sink``.  Everything
here is the event-time surface the north star adds (SURVEY.md §2 Tier B
"streaming" row).
"""

from fs2_kinesis_firehose_spark.streaming.progress import (
    ProgressCapture,
    throughput_summary,
)
from fs2_kinesis_firehose_spark.streaming.replay import replay_parquet, run_to_memory
from fs2_kinesis_firehose_spark.streaming.windows import (
    session_counts,
    sliding_value_stats,
    stream_dedup,
    tumbling_counts,
)

__all__ = [
    "ProgressCapture",
    "throughput_summary",
    "replay_parquet",
    "run_to_memory",
    "session_counts",
    "sliding_value_stats",
    "stream_dedup",
    "tumbling_counts",
]
