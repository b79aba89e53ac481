"""Bucketing must eliminate the join-time shuffle: the same join costs
two Exchanges unbucketed and zero when both sides are co-bucketed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lab5_lakehouse_etl_spark.lakehouse import bucketed as B
from lab5_lakehouse_etl_spark.plans import explain_str, shuffle_count
from lab5_lakehouse_etl_spark.session import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = load_table(spark, SF_DIR, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    B.write_bucketed(orders, "b_orders", "o_orderkey", 8)
    B.write_bucketed(li, "b_lineitem", "o_orderkey", 8)
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # disable broadcast so the plan shape is SMJ, which is what a
    # fact-fact join uses at scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = B.bucketed_join(spark, lt, rt, "o_orderkey")
        assert shuffle_count(joined) == 0
        assert "SortMergeJoin" in explain_str(joined)

        # identical join over the raw (unbucketed) parquet shuffles both sides
        orders = load_table(spark, SF_DIR, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        li = load_table(spark, SF_DIR, "lineitem").select(
            F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
        )
        assert shuffle_count(orders.join(li, "o_orderkey")) == 2
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    lt, _ = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        agg = (
            spark.table(lt)
            .groupBy("o_orderkey")
            .agg(F.sum("o_totalprice").alias("s"))
        )
        assert shuffle_count(agg) == 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_result_matches_plain(spark, bucketed_tables):
    lt, rt = bucketed_tables
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = load_table(spark, SF_DIR, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    plain = orders.join(li, "o_orderkey")
    buck = B.bucketed_join(spark, lt, rt, "o_orderkey").select(*plain.columns)
    assert sorted(map(tuple, buck.collect())) == sorted(map(tuple, plain.collect()))
