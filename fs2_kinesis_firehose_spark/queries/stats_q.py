"""ANALYZE-style statistics collection (late round 7).

``analyze_orders_stats`` materializes the CBO-input statistics row for the
orders table (operators/stats.py) — exact null counts, NDVs, min/max
bounds, string byte widths — as one wide natively-typed row the oracle
restates aggregate-for-aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fs2_kinesis_firehose_spark.operators.stats import column_stats
from fs2_kinesis_firehose_spark.queries import query
from fs2_kinesis_firehose_spark.tables import load_table


@query(
    "analyze_orders_stats",
    oracle="""
    SELECT
      COUNT(*) AS n_rows,
      CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_orderkey_nulls,
      COUNT(DISTINCT o_orderkey) AS o_orderkey_ndv,
      MIN(o_orderkey) AS o_orderkey_min,
      MAX(o_orderkey) AS o_orderkey_max,
      CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_custkey_nulls,
      COUNT(DISTINCT o_custkey) AS o_custkey_ndv,
      MIN(o_custkey) AS o_custkey_min,
      MAX(o_custkey) AS o_custkey_max,
      CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_orderstatus_nulls,
      COUNT(DISTINCT o_orderstatus) AS o_orderstatus_ndv,
      CAST(SUM(LENGTH(o_orderstatus)) AS BIGINT) AS o_orderstatus_sumlen,
      CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_totalprice_nulls,
      COUNT(DISTINCT o_totalprice) AS o_totalprice_ndv,
      MIN(o_totalprice) AS o_totalprice_min,
      MAX(o_totalprice) AS o_totalprice_max,
      CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_orderdate_nulls,
      COUNT(DISTINCT o_orderdate) AS o_orderdate_ndv,
      MIN(o_orderdate) AS o_orderdate_min,
      MAX(o_orderdate) AS o_orderdate_max,
      CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_orderpriority_nulls,
      COUNT(DISTINCT o_orderpriority) AS o_orderpriority_ndv,
      CAST(SUM(LENGTH(o_orderpriority)) AS BIGINT) AS o_orderpriority_sumlen
    FROM orders
    """,
)
def analyze_orders_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return column_stats(orders)
