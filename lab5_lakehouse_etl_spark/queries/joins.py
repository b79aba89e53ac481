"""Join declared queries (SURVEY §2.3 + extension matrix).

The reference's only join is the RI semi-join; everything else is the
north-star extension. Scale strategy per query is noted inline:
dimension sides get ``broadcast()`` hints, fact-fact joins rely on
sort-merge + AQE (skew-join splitting on), and the non-equi join keeps
its build side tiny so BroadcastNestedLoop stays cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import relational as ops
from ..session import load_table
from . import query


@query(
    "q_join_semi",
    oracle="""
    SELECT * FROM orders
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J2/J3 RI filter (jobs/order_glue_job.py:132-140 et al.):
    orders ⋉ lineitem as left_semi — the probe never widens, and only
    the distinct key column crosses the wire."""
    orders = load_table(spark, sf_dir, "orders")
    keys = load_table(spark, sf_dir, "lineitem").selectExpr(
        "l_orderkey AS o_orderkey"
    )
    return ops.ri_semi_join(orders, keys, on="o_orderkey")


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (
      SELECT o_custkey FROM orders WHERE o_totalprice > 300000
    )
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no high-value order (every
    customer has SOME order in the fixture, so the unfiltered anti-join
    would be trivially empty; o_custkey is non-null, so NOT IN ≡
    anti-join). The filter is pushed below the join on the build side."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .selectExpr("o_custkey AS c_custkey")
    )
    return cust.join(orders, on="c_custkey", how="left_anti")


@query(
    "q_join_inner",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join fact→dimension with an explicit broadcast hint:
    customer is dimension-sized at every SF, so the join is shuffle-free
    (BroadcastHashJoin) — the 100 TB plan of record for star joins."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    return orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner"
    ).select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")


@query(
    "q_join_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeping order-less customers as NULL rows."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "q_join_full",
    oracle="""
    SELECT n.n_nationkey, n.n_name, s.s_suppkey, s.s_name
    FROM nation n FULL JOIN supplier s ON n.n_nationkey = s.s_nationkey
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join (nations without suppliers and vice versa)."""
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    return nation.join(supp, nation.n_nationkey == supp.s_nationkey, "full").select(
        "n_nationkey", "n_name", "s_suppkey", "s_name"
    )


@query(
    "q_join_cross",
    oracle="""
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two dimension tables (both tiny by design —
    a cross join with a non-dimension side is a plan bug, not a query)."""
    region = load_table(spark, sf_dir, "region").select("r_name")
    nation = load_table(spark, sf_dir, "nation").select("n_name")
    return region.crossJoin(nation)


@query(
    "q_join_range",
    oracle="""
    SELECT n.n_nationkey, n.n_name, r.r_regionkey
    FROM nation n JOIN region r
      ON n.n_regionkey < r.r_regionkey
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) join — BroadcastNestedLoopJoin with the tiny
    side broadcast. Only valid when one side is broadcastable; a
    fact-fact range join should be banded into an equi-join first
    (see q_window_asof for the as-of pattern that avoids this)."""
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").select("r_regionkey")
    return nation.join(
        F.broadcast(region), nation.n_regionkey < region.r_regionkey, "inner"
    ).select("n_nationkey", "n_name", "r_regionkey")


@query(
    "q_join_star",
    oracle="""
    SELECT r.r_name,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q_join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join + aggregate: revenue per region. All three
    dimension sides broadcast, so the fact table is scanned once with
    zero shuffles before the final small groupBy — the canonical
    lakehouse star-schema plan."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@query(
    "q_range_join_binned",
    oracle="""
    WITH bands AS (
      SELECT s_suppkey, s_acctbal AS lo,
             lead(s_acctbal) OVER (ORDER BY s_acctbal, s_suppkey) AS hi
      FROM supplier
    )
    SELECT b.s_suppkey,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(c.c_acctbal), 2) AS balance_sum
    FROM bands b JOIN customer c
      ON c.c_acctbal >= b.lo AND c.c_acctbal < b.hi
    WHERE b.hi IS NOT NULL
    GROUP BY b.s_suppkey
    """,
)
def q_range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact range join WITHOUT an equi key, via the binned
    interval join (operators/rangejoin.py): supplier account balances
    carve the domain into irregular half-open bands [bal, next_bal) —
    the lead() construction, an IP-geolocation-table shape — and every
    customer balance is located in its band, then counted and summed
    per band.

    The naive Spark plan for `c_acctbal BETWEEN lo AND hi` is a
    BroadcastNestedLoopJoin (O(|C| x |S|) compares, broadcast-only);
    the binned form replicates each band into the ~1-2 bins of width
    512 it overlaps and equi-joins on the bin id — hash join, AQE
    skew handling, both sides arbitrarily large. Plan-pinned: no
    nested loop anywhere (tests/test_plans.py). The band relation
    itself costs one window over the supplier table (dimension-sized);
    zero-width bands from tied balances match nothing, and the open
    top band is dropped, mirroring the oracle's WHERE hi IS NOT NULL.
    """
    from ..operators.rangejoin import binned_interval_join

    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_acctbal"
    )
    w = Window.orderBy("s_acctbal", "s_suppkey")
    bands = (
        supplier.withColumn("lo", F.col("s_acctbal"))
        .withColumn("hi", F.lead("s_acctbal").over(w))
        .filter(F.col("hi").isNotNull())
        .select("s_suppkey", "lo", "hi")
    )
    customers = load_table(spark, sf_dir, "customer").select("c_acctbal")
    matched = binned_interval_join(
        customers, bands, "c_acctbal", "lo", "hi", bin_width=512.0
    )
    return matched.groupBy("s_suppkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("balance_sum"),
    )
