"""Tier A — the reference's Firehose producer/control-plane capabilities,
re-expressed on Spark (SURVEY.md §2 Tier A, §7 Phase 3).

Reference parity map (cites into /root/reference):

- ``settings.ProducerSettings``   ← ProducerSettings.scala:25-85
- ``serializers``                 ← Serializer.scala:24-33, RecordOps.scala:26,
                                    separator framing firehose.scala:59
- ``retry.put_batch_with_retry``  ← Firehose.scala:70-105 (shrink-to-failed)
- ``sink.produce`` / ``produce_acks`` / ``write_batch`` / ``write_one``
                                  ← firehose.scala:44-80 (the produce pipe),
                                    FirehoseOps.scala:42-54
- ``admin`` (+ ``delivery_stream``) ← Firehose.scala:36-56 control plane,
                                    ErrorUtils.scala:26-34 (handle404),
                                    FirehoseOps.scala:32-40 (streamAsResource)
- ``client.FakeFirehose``         ← the failure-injecting test double the
                                    reference lacks (SURVEY.md §5)
"""

from fs2_kinesis_firehose_spark.firehose.client import (
    FakeFirehose,
    ResourceNotFoundError,
)
from fs2_kinesis_firehose_spark.firehose.retry import put_batch_with_retry
from fs2_kinesis_firehose_spark.firehose.settings import ProducerSettings
from fs2_kinesis_firehose_spark.firehose.sink import (
    produce,
    produce_acks,
    write_batch,
    write_one,
)

__all__ = [
    "FakeFirehose",
    "ProducerSettings",
    "ResourceNotFoundError",
    "produce",
    "produce_acks",
    "put_batch_with_retry",
    "write_batch",
    "write_one",
]
