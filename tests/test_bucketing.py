"""Bucketed co-located join: the shuffle is paid at write time, not per
query — the join plan must contain no Exchange."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from hiv_data_integration_spark.io.bucketing import colocated_join, write_bucketed

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    suffix = uuid.uuid4().hex[:8]
    li_t, ord_t = f"li_b_{suffix}", f"ord_b_{suffix}"
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    write_bucketed(li, li_t, 8, ["l_orderkey"], str(tmp_path / "li"), ["l_orderkey"])
    write_bucketed(
        orders, ord_t, 8, ["l_orderkey"], str(tmp_path / "ord"), ["l_orderkey"]
    )
    yield li_t, ord_t
    spark.sql(f"DROP TABLE IF EXISTS {li_t}")
    spark.sql(f"DROP TABLE IF EXISTS {ord_t}")


def test_colocated_join_has_no_exchange(spark, bucketed_tables):
    li_t, ord_t = bucketed_tables
    # disable broadcast so the bucketed sort-merge path is what gets planned
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, li_t, ord_t, ["l_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_colocated_join_matches_plain_join(spark, bucketed_tables):
    li_t, ord_t = bucketed_tables
    joined = colocated_join(spark, li_t, ord_t, ["l_orderkey"])
    got = (
        joined.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderpriority")
        .collect()
    )
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    want = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderpriority")
        .collect()
    )
    assert got == want
