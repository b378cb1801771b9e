"""Observation metrics: aggregates computed by the same job as the action."""

from __future__ import annotations

from pyspark.sql import functions as F

from fs2_kinesis_firehose_spark.plans.observe import observe, observed_write


def test_observe_piggybacks_on_action(spark):
    df = spark.createDataFrame([(1, 2.0), (2, None), (3, 4.0)], "id long, v double")
    observed, obs = observe(
        df, "m", F.count(F.lit(1)).alias("n"), F.sum(F.isnull("v").cast("int")).alias("nulls")
    )
    assert observed.count() == 3
    assert obs.get == {"n": 3, "nulls": 1}


def test_observed_write_returns_metrics_without_second_scan(spark, tmp_path):
    df = spark.range(100).withColumn("flag", (F.col("id") % 4 == 0).cast("int"))
    metrics = observed_write(
        df,
        str(tmp_path / "out"),
        extra_metrics={"n_flagged": F.sum("flag")},
    )
    assert metrics == {"n_rows": 100, "n_flagged": 25}
    assert spark.read.parquet(str(tmp_path / "out")).count() == 100
