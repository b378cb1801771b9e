"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``fs2_kinesis_firehose_spark``; this module is a thin
adapter over its query registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import fs2_kinesis_firehose_spark.queries as q
from fs2_kinesis_firehose_spark.tables import SMOKE_SF_DIR


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (revenue_by_nation) on /root/testdata/sf0.001."""
    q.load_all()
    return q.QUERIES["revenue_by_nation"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q.load_all()
    return dict(q.QUERIES)


def oracle_sql() -> dict[str, str]:
    q.load_all()
    return dict(q.ORACLES)
