"""PySpark-native analytics engine with the streaming-delivery capabilities of
``zakolenko/fs2-kinesis-firehose`` (reference: /root/reference, read-only), plus
the relational and LLM-data-pipeline surface mandated by the project north star.

Layout
------
- ``session``    — SparkSession factory tuned for local[32] testing / cluster scale.
- ``tables``     — fixture table loaders (TESTDATA.md parquet tables).
- ``firehose``   — Tier A: the reference's produce-pipe capabilities on Structured
                   Streaming (serialize → frame → batch ≤500 → bounded-parallel put
                   → shrink-to-failed retry) + 404-tolerant control plane.
- ``queries``    — Tier B/C query catalog registered for the driver harness
                   (``__spark_entry__.py``) with DuckDB oracle SQL twins.
- ``operators``  — Tier C: dedup (exact/MinHash-LSH/SimHash/Jaccard/embedding),
                   similarity search (brute-force + LSH ANN), text analysis,
                   multimodal column plumbing.
- ``streaming``  — event-time windows, watermarks, session windows, replay helpers,
                   groupWithin-analog batching.
"""

from fs2_kinesis_firehose_spark.session import get_spark
from fs2_kinesis_firehose_spark.tables import TABLE_NAMES, load_table, load_tables

__all__ = ["get_spark", "load_table", "load_tables", "TABLE_NAMES"]
__version__ = "0.1.0"
