"""Bucketed-table co-located join: the mechanism that removes the shuffle
from repeated big-fact joins at 100 TB (north-star 'bucketing for co-located
joins').  Both sides are written bucketBy(join_key) with equal bucket counts;
the sort-merge join then reads bucket-aligned splits with NO Exchange."""

from __future__ import annotations

import pytest

from fs2_kinesis_firehose_spark.tables import load_table


@pytest.fixture()
def bucket_db(spark, tmp_path):
    db = "bucketdb_test"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{tmp_path}/warehouse'")
    yield db
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_bucketed_join_has_no_exchange(spark, sf_smoke, bucket_db):
    orders = load_table(spark, sf_smoke, "orders").select("o_orderkey", "o_totalprice")
    lineitem = load_table(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable(f"{bucket_db}.orders_b")
    )
    (
        lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable(f"{bucket_db}.lineitem_b")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        o = spark.table(f"{bucket_db}.orders_b")
        l = spark.table(f"{bucket_db}.lineitem_b")
        joined = o.join(l, o.o_orderkey == l.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # bucket-aligned: zero shuffle
        # and it computes the right thing
        po = load_table(spark, sf_smoke, "orders")
        pl = load_table(spark, sf_smoke, "lineitem")
        expected = po.join(pl, po.o_orderkey == pl.l_orderkey).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
