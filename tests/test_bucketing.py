"""Bucketed tables: co-located joins with zero shuffle (the 100 TB join
strategy for repeatedly-joined fact tables)."""

import uuid

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    suffix = uuid.uuid4().hex[:6]
    li_name, o_name = f"li_b_{suffix}", f"o_b_{suffix}"
    (
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable(li_name)
    )
    (
        o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable(o_name)
    )
    yield li_name, o_name
    spark.sql(f"DROP TABLE IF EXISTS {li_name}")
    spark.sql(f"DROP TABLE IF EXISTS {o_name}")


def test_bucketed_join_no_shuffle(spark, bucketed):
    from apache_arrow_spark.plans.inspect import plan_string

    li_name, o_name = bucketed
    li = spark.table(li_name)
    o = spark.table(o_name)
    joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
    plan = plan_string(joined, "simple")
    # the join itself must not shuffle either side (bucket co-location);
    # the only exchange allowed is for the final aggregation
    join_part = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan


def test_bucketed_join_correct(spark, sf_dir, bucketed):
    li_name, o_name = bucketed
    li = spark.table(li_name)
    o = spark.table(o_name)
    got = li.join(o, li.l_orderkey == o.o_orderkey).count()
    plain = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{sf_dir}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert got == plain
