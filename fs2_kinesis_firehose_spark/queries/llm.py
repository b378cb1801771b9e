"""Tier C — LLM-data-pipeline queries (dedup, similarity, text analysis).

Registered incrementally; implementations live in
``fs2_kinesis_firehose_spark.operators``.
"""

from __future__ import annotations
