"""Bucketed-layout join: the plan must be exchange-free."""

from __future__ import annotations

from aws_lakehouse_spark.registry import load_all

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_join_plan_has_no_shuffle(spark):
    df = load_all()["join_bucketed_colocated"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # bucketed scan + merge hint: no Exchange anywhere — neither for
    # the join nor for the group-by on the same key
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan


def test_bucketed_join_values_match_plain_join(spark):
    import pyspark.sql.functions as F

    df = load_all()["join_bucketed_colocated"].fn(spark, SF_DIR)
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    expect = (
        orders.join(
            customer, orders.o_custkey == customer.c_custkey
        )
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
            F.round(F.max("c_acctbal"), 2).alias("acctbal"),
        )
    )
    assert df.exceptAll(expect).count() == 0
    assert expect.exceptAll(df).count() == 0
