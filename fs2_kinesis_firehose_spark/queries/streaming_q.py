"""Structured Streaming queries exercised through the correctness harness.

Each callable replays a fixture parquet through ``readStream`` with an
``availableNow`` trigger into a memory sink, then returns the materialized
batch result — so event-time windowing/watermark semantics run the *real*
streaming engine while remaining DuckDB-oracle-able.
"""

from __future__ import annotations
