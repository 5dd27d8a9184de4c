"""Bucketed co-located joins: pre-bucketing both sides of a recurring join
on its key removes the per-query shuffle entirely — the 100 TB pattern for
fact-to-fact joins run many times (SURVEY §2.3 / task brief).
"""

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    spark.sql("DROP DATABASE IF EXISTS plk_bkt CASCADE")
    spark.sql(f"CREATE DATABASE plk_bkt LOCATION '{tmp_path}/wh'")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("plk_bkt.orders_b")
    )
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("plk_bkt.lineitem_b")
    )
    yield "plk_bkt"
    spark.sql("DROP DATABASE IF EXISTS plk_bkt CASCADE")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        j = (
            spark.table("plk_bkt.lineitem_b")
            .join(
                spark.table("plk_bkt.orders_b"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        # the join itself must consume bucketed scans directly — the only
        # allowed exchange is the one for the final groupBy key
        join_part = plan.split("HashAggregate")[-1]
        assert "Exchange" not in join_part, join_part[:2000]
        # and the result must equal the plain (shuffled) join
        plain = (
            spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
            .join(
                spark.read.parquet("/root/testdata/sf0.001/orders.parquet"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, j.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
