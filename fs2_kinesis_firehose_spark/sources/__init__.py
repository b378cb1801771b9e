"""Custom Spark data sources (Spark 4 ``pyspark.sql.datasource`` API)."""

from fs2_kinesis_firehose_spark.sources.firehose_datasource import (
    FirehoseDataSource,
    register_firehose_source,
)

__all__ = ["FirehoseDataSource", "register_firehose_source"]
