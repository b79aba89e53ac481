"""Skew operators must be result-transparent: salted plans produce
exactly the unsalted output."""

from __future__ import annotations

from pyspark.sql import functions as F

from lab5_lakehouse_etl_spark.operators import skew
from lab5_lakehouse_etl_spark.session import load_table
from tests.conftest import SF_DIR


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_salted_join_matches_plain_join(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderstatus")
    plain = li.join(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey"
    )
    salted = skew.salted_join(
        li, orders.withColumnRenamed("o_orderkey", "l_orderkey"), ["l_orderkey"]
    )
    assert _rows(salted.select(*plain.columns)) == _rows(plain)


def test_salted_join_left_outer(spark):
    orders = load_table(spark, SF_DIR, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_mktsegment")
    plain = orders.join(
        cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", "left"
    )
    salted = skew.salted_join(
        orders,
        cust.withColumnRenamed("c_custkey", "o_custkey"),
        ["o_custkey"],
        how="left",
    )
    assert _rows(salted.select(*plain.columns)) == _rows(plain)


def test_salted_agg_matches_plain_agg(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    plain = (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
            F.max("l_shipdate").alias("max_ship"),
        )
    )
    salted = skew.salted_agg(
        li.withColumn("one", F.lit(1)),
        ["l_returnflag"],
        {
            "sum_qty": ("l_quantity", "sum"),
            "n": ("one", "count"),
            "max_ship": ("l_shipdate", "max"),
        },
    ).withColumn("sum_qty", F.round("sum_qty", 2))
    assert _rows(salted.select(*plain.columns)) == _rows(plain)


def test_salted_agg_balances_hot_key(spark):
    # one pathological key owning ~all rows: the salted partial phase
    # must spread its state across n_salts distinct groups
    df = spark.range(10_000).select(
        F.lit(42).alias("k"), F.col("id").cast("double").alias("v")
    )
    salted = df.withColumn(
        skew.SALT,
        F.pmod(F.xxhash64("k", F.monotonically_increasing_id()), F.lit(8)),
    )
    groups = salted.groupBy("k", skew.SALT).count().collect()
    assert len(groups) == 8  # hot key split across every salt bucket
    sizes = [g["count"] for g in groups]
    assert max(sizes) < 10_000 * 0.25  # no bucket owns the key


def test_declared_skew_queries_match_unsalted(spark):
    from lab5_lakehouse_etl_spark import queries as Q

    Q.load_all()
    agg = Q.QUERIES["q_skew_salted_agg"](spark, SF_DIR)
    ev = load_table(spark, SF_DIR, "events")
    # same output convention as the declared query: decimal
    # ACCUMULATION (order-insensitive sum) but round(double, 2) output
    # — DECIMAL may not reach declared outputs (driver hash asymmetry,
    # see tests/conftest.py)
    plain = (
        ev.select("user_id", F.col("value").cast("decimal(18,6)").alias("value"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value").cast("double"), 2).alias("sum_value"),
        )
    )
    assert _rows(agg) == _rows(plain)


def test_salt_cols_spreads_duplicate_hot_rows(spark):
    # r10 advice: byte-identical hot rows collapse onto one salt under
    # the default full-row hash; an explicit uniqueness-bearing
    # salt_cols spreads them AND stays result-identical
    hot = spark.range(10_000).selectExpr(
        "CAST(1 AS BIGINT) AS k", "CAST(7 AS BIGINT) AS v", "id AS uid"
    )
    # default (hash over k,v only — simulate an id-less frame)
    dup = hot.select("k", "v")
    collapsed = dup.withColumn(
        skew.SALT, F.pmod(F.xxhash64("k", "v"), F.lit(8))
    )
    assert collapsed.select(skew.SALT).distinct().count() == 1

    agg_default = skew.salted_agg(
        hot, ["k"], {"n": ("v", "count"), "s": ("v", "sum")}
    )
    agg_salted = skew.salted_agg(
        hot, ["k"], {"n": ("v", "count"), "s": ("v", "sum")},
        salt_cols=["uid"],
    )
    assert _rows(agg_default) == _rows(agg_salted)
    spread = hot.withColumn(
        skew.SALT, F.pmod(F.xxhash64("uid"), F.lit(8))
    )
    assert spread.select(skew.SALT).distinct().count() == 8

    small = spark.range(3).selectExpr("CAST(1 AS BIGINT) AS k", "id AS tag")
    j_default = skew.salted_join(hot, small, ["k"])
    j_salted = skew.salted_join(hot, small, ["k"], salt_cols=["uid"])
    assert _rows(j_default.select("k", "v", "uid", "tag")) == _rows(
        j_salted.select("k", "v", "uid", "tag")
    )
