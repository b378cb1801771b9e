"""Custom Spark data sources (Spark 4 ``pyspark.sql.datasource`` API)."""

from fs2_kinesis_firehose_spark.sources.firehose_datasource import (
    FirehoseDataSource,
    register_firehose_source,
)
from fs2_kinesis_firehose_spark.sources.kinesis_spool_source import (
    KinesisSpoolDataSource,
    register_kinesis_spool_source,
)

__all__ = [
    "FirehoseDataSource",
    "register_firehose_source",
    "KinesisSpoolDataSource",
    "register_kinesis_spool_source",
]
