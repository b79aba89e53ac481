"""Composite pipeline declared queries (SURVEY §2.11).

Each reference Glue job is a composed dataflow; these queries re-express
the relational core of those compositions on the TPC-H-ish fixtures
(orders↔lineitem standing in for orders↔order_items, part for
products), with the §2.12 fine print preserved and a deterministic
survivor rule. The non-relational tail (Delta write, current_timestamp,
S3 archival) lives in `pipelines/` and is pytest-verified instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import relational as ops
from ..session import load_table
from . import query


@query(
    "q_pipeline_orders",
    oracle="""
    WITH typed AS (
      SELECT o_orderkey, o_custkey,
             round(o_totalprice, 2)        AS total_amount,
             CAST(o_orderdate AS DATE)     AS order_date,
             nullif(o_orderstatus, 'P')    AS status
      FROM orders
    ),
    valid AS (
      SELECT * FROM typed
      WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
        AND status IS NOT NULL
    ),
    dedup AS (
      SELECT o_orderkey, o_custkey, total_amount, order_date, status
      FROM (
        SELECT *, row_number() OVER (
          PARTITION BY o_custkey
          ORDER BY order_date DESC NULLS LAST, o_orderkey DESC NULLS LAST
        ) AS rn FROM valid
      ) WHERE rn = 1
    )
    SELECT d.* FROM dedup d
    WHERE d.o_orderkey IN (SELECT l_orderkey FROM lineitem)
    """,
)
def q_pipeline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The orders job's relational core (jobs/order_glue_job.py:87-158):
    project → permissive cast → required-field filter → latest-wins
    window dedup → RI semi-join — composed from the same combinators the
    real pipeline uses, as ONE Catalyst plan (single shuffle for the
    window, semi-join on the distinct key)."""
    orders = load_table(spark, sf_dir, "orders")
    typed = orders.select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("total_amount"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status"),
    )
    valid, _rejected = ops.split_valid_rejected(
        typed, ["o_orderkey", "o_custkey", "status"]
    )
    deduped = ops.latest_wins_dedup(
        valid, ["o_custkey"], "order_date", tiebreak=["o_orderkey"]
    )
    keys = load_table(spark, sf_dir, "lineitem").selectExpr(
        "l_orderkey AS o_orderkey"
    )
    return ops.ri_semi_join(deduped, keys, on="o_orderkey")


@query(
    "q_pipeline_items",
    oracle="""
    WITH typed AS (
      SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
             round(l_quantity, 2) AS quantity,
             CAST(l_shipdate AS DATE) AS ship_date,
             nullif(l_returnflag, 'R') AS flag
      FROM lineitem
    ),
    valid AS (
      SELECT * FROM typed
      WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
        AND flag IS NOT NULL
    ),
    rejected AS (
      SELECT l_orderkey, l_linenumber FROM typed
      EXCEPT
      SELECT l_orderkey, l_linenumber FROM valid
    ),
    ri AS (
      SELECT v.* FROM valid v
      WHERE v.l_orderkey IN (SELECT o_orderkey FROM orders)
    )
    SELECT ri.*,
           (SELECT CAST(count(*) AS BIGINT) FROM rejected) AS n_rejected
    FROM ri
    """,
)
def q_pipeline_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The order_items job's relational core
    (jobs/order_items_glue_job.py:96-183): intersection-projection →
    cast → filter → EXCEPT-style reject capture → RI join; the reject
    count rides along as a column (the job logs it as a run metric,
    jobs/order_items_glue_job.py:196-205). Reject capture runs through
    rejected_keys — the single-scan aggregation form of EXCEPT DISTINCT
    (see operators/relational.py) — cutting the plan from four lineitem
    scans to three and dropping the two-sided EXCEPT shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    typed = ops.project_intersection(
        li.select(
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_linenumber",
            F.round("l_quantity", 2).alias("quantity"),
            F.col("l_shipdate").cast("date").alias("ship_date"),
            F.nullif(F.col("l_returnflag"), F.lit("R")).alias("flag"),
        ),
        [
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_linenumber",
            "quantity",
            "ship_date",
            "flag",
            "ghost_column",
        ],
    )
    valid, _ = ops.split_valid_rejected(typed, ["l_orderkey", "l_partkey", "flag"])
    rejected = ops.rejected_keys(
        typed,
        ["l_orderkey", "l_linenumber"],
        F.col("l_orderkey").isNotNull()
        & F.col("l_partkey").isNotNull()
        & F.col("flag").isNotNull(),
    )
    keys = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey AS l_orderkey"
    )
    ri = ops.ri_semi_join(valid, keys, on="l_orderkey")
    n_rej = rejected.agg(F.count(F.lit(1)).cast("bigint").alias("n_rejected"))
    return ri.crossJoin(F.broadcast(n_rej))


@query(
    "q_pipeline_products",
    oracle="""
    WITH typed AS (
      SELECT p_partkey, p_brand,
             nullif(p_type, 'STANDARD PLATED TIN') AS ptype,
             round(p_retailprice, 2)               AS retail_price
      FROM part
    ),
    dedup AS (
      SELECT p_partkey, p_brand, ptype, retail_price
      FROM (
        SELECT *, row_number() OVER (
          PARTITION BY p_partkey
          ORDER BY p_brand ASC NULLS LAST, retail_price ASC NULLS LAST
        ) AS rn FROM typed
      ) WHERE rn = 1
    ),
    valid AS (
      SELECT * FROM dedup
      WHERE p_partkey IS NOT NULL AND ptype IS NOT NULL
    )
    SELECT v.* FROM valid v
    WHERE v.p_partkey IN (SELECT l_partkey FROM lineitem)
    """,
)
def q_pipeline_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The products job's relational core (jobs/products_glue_job.py:
    135-187): declared-schema read → dedup by product key BEFORE
    null-filtering (the §2.12 quirk: a null-attribute survivor can
    shadow a valid duplicate) → required-field filter → RI semi-join
    against the fact table. Dedup survivor made deterministic via an
    ordered window (the reference's dropDuplicates keeps an arbitrary
    row)."""
    part = load_table(spark, sf_dir, "part")
    typed = part.select(
        "p_partkey",
        "p_brand",
        F.nullif(F.col("p_type"), F.lit("STANDARD PLATED TIN")).alias("ptype"),
        F.round("p_retailprice", 2).alias("retail_price"),
    )
    deduped = ops.latest_wins_dedup(
        typed,
        ["p_partkey"],
        order_col="p_brand",
        tiebreak=["retail_price"],
        descending=False,
    )
    valid, _ = ops.split_valid_rejected(deduped, ["p_partkey", "ptype"])
    keys = load_table(spark, sf_dir, "lineitem").selectExpr(
        "l_partkey AS p_partkey"
    )
    return ops.ri_semi_join(valid, keys, on="p_partkey")
