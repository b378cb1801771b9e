"""Physical-plan inspection helpers (scale hygiene checks)."""

from fs2_kinesis_firehose_spark.plans.explain import (
    assert_plan_contains,
    assert_plan_lacks,
    explain_str,
)

__all__ = ["explain_str", "assert_plan_contains", "assert_plan_lacks"]
