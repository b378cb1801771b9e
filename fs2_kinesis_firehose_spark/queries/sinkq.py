"""Tier A — Firehose-sink correctness queries (delivery accounting).

Registered incrementally; implementations live in
``fs2_kinesis_firehose_spark.firehose``.
"""

from __future__ import annotations
