"""Window-function declared queries (SURVEY §2.5 + extension surface).

W1 (latest-wins dedup) is the reference's only window op
(jobs/order_glue_job.py:113-116); the rest is the extension matrix.
All window orderings carry a unique tiebreak column so results are
deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import relational as ops
from ..session import load_table
from . import query


@query(
    "q_window_dedup",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY o_custkey
        ORDER BY o_orderdate DESC NULLS LAST, o_orderkey DESC NULLS LAST
      ) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def q_window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 latest-wins dedup (jobs/order_glue_job.py:113-116): newest
    order per customer; o_orderkey tiebreak makes the survivor unique.
    One hash shuffle on the key + in-partition sort."""
    orders = load_table(spark, sf_dir, "orders")
    return ops.latest_wins_dedup(
        orders, ["o_custkey"], "o_orderdate", tiebreak=["o_orderkey"]
    )


@query(
    "q_window_rank",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           CAST(rank()       OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(ntile(4)     OVER w AS BIGINT) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey
                 ORDER BY c_acctbal DESC NULLS LAST, c_custkey ASC)
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/ntile per nation by account balance."""
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc_nulls_last(), F.col("c_custkey").asc()
    )
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


@query(
    "q_window_analytic",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           lag(o_totalprice)  OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           first_value(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND UNBOUNDED FOLLOWING) AS first_price,
           last_value(o_totalprice)  OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND UNBOUNDED FOLLOWING) AS last_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
)
def q_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first/last over each customer's order history."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(wfull).alias("first_price"),
        F.last("o_totalprice").over(wfull).alias("last_price"),
    )


@query(
    "q_window_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW), 2) AS running_total,
           round(avg(o_totalprice) OVER (w ROWS BETWEEN 2 PRECEDING
                                         AND CURRENT ROW), 4) AS moving_avg3
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
)
def q_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit ROWS frames: running total + 3-row moving average."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_total"),
        F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).alias(
            "moving_avg3"
        ),
    )


@query(
    "q_topk_pergroup",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q_topk_pergroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the row_number≤k pattern. At scale
    Spark pushes a per-partition rank limit (WindowGroupLimit) before the
    shuffle, so the exchange carries ≤k rows per key."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_window_asof",
    oracle="""
    SELECT e.event_id,
           CAST(e.ts AS TIMESTAMP) AS ts,
           e.user_id,
           (SELECT max(CAST(s.ts AS TIMESTAMP)) FROM events s
            WHERE s.user_id = e.user_id AND s.event_type = 'signup'
              AND s.ts <= e.ts) AS last_signup_ts
    FROM events e
    """,
)
def q_window_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of lookup (an operator Spark lacks natively) expressed as a
    running conditional max — no join at all: one window over (user, ts)
    gives every event the most recent signup at-or-before it. The oracle
    is the correlated-subquery formulation. At 100 TB this is one shuffle
    on user_id vs. the naive range-join's quadratic blowup.

    RANGE frame on ts (not ROWS): the oracle's ``s.ts <= e.ts`` includes
    a signup sharing the event's exact timestamp, so tied-ts peers must
    be inside the frame — a ROWS frame would cut ties ordered after the
    current row."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sig_ts = F.when(F.col("event_type") == "signup", F.col("ts"))
    return ev.select(
        "event_id",
        "ts",
        "user_id",
        F.max(sig_ts).over(w).alias("last_signup_ts"),
    )


@query(
    "q_window_asof_nearest",
    oracle="""
    SELECT event_id, ts, user_id,
           CASE WHEN b IS NULL THEN f
                WHEN f IS NULL THEN b
                WHEN epoch_us(ts) - epoch_us(b)
                     <= epoch_us(f) - epoch_us(ts) THEN b
                ELSE f END AS nearest_signup_ts
    FROM (
      SELECT e.event_id, CAST(e.ts AS TIMESTAMP) AS ts, e.user_id,
             (SELECT max(CAST(s.ts AS TIMESTAMP)) FROM events s
              WHERE s.user_id = e.user_id AND s.event_type = 'signup'
                AND s.ts <= e.ts) AS b,
             (SELECT min(CAST(s.ts AS TIMESTAMP)) FROM events s
              WHERE s.user_id = e.user_id AND s.event_type = 'signup'
                AND s.ts >= e.ts) AS f
      FROM events e)
    """,
)
def q_window_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of lookup (pandas ``merge_asof(direction='nearest')``
    semantics): each event gets the signup timestamp minimizing |Δt|,
    ties preferring the backward (at-or-before) side.  Still ZERO
    joins: the backward candidate is q_window_asof's running
    conditional max; the forward candidate is the mirrored running min
    over a (currentRow, unboundedFollowing) RANGE frame; the winner is
    a row-local integer-microsecond comparison.  Both frames share one
    (user_id, ts) sort, so the whole operator costs the same single
    shuffle as the backward-only form — where a nearest formulated as
    a range join would pay a quadratic band.  The oracle states both
    sides as correlated subqueries and the same epoch_us tie rule;
    all arithmetic is integer, so no float-rounding surface."""
    ev = load_table(spark, sf_dir, "events")
    wb = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc())
        .rangeBetween(Window.currentRow, Window.unboundedFollowing)
    )
    sig_ts = F.when(F.col("event_type") == "signup", F.col("ts"))
    b = F.max(sig_ts).over(wb)
    f = F.min(sig_ts).over(wf)
    return (
        ev.select(
            "event_id", "ts", "user_id",
            b.alias("__b"), f.alias("__f"),
        )
        .select(
            "event_id",
            "ts",
            "user_id",
            (
                F.when(F.col("__b").isNull(), F.col("__f"))
                .when(F.col("__f").isNull(), F.col("__b"))
                .when(
                    F.unix_micros("ts") - F.unix_micros("__b")
                    <= F.unix_micros("__f") - F.unix_micros("ts"),
                    F.col("__b"),
                )
                .otherwise(F.col("__f"))
            ).alias("nearest_signup_ts"),
        )
    )


@query(
    "q_window_cume",
    oracle="""
    SELECT c_custkey,
           c_nationkey,
           round(cume_dist()    OVER w, 6) AS cume,
           round(percent_rank() OVER w, 6) AS pct_rank
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal)
    """,
)
def q_window_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: cume_dist / percent_rank per
    nation by balance. Both are count-based, so results stay
    deterministic even when the ORDER BY key has ties (tied rows share
    a value). Single hash-partition shuffle on the window key."""
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal")
    return cust.select(
        "c_custkey",
        "c_nationkey",
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


@query(
    "q_window_timerange",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(count(*) OVER w AS BIGINT)        AS n_orders_7d,
           round(sum(o_totalprice) OVER w, 2)     AS revenue_7d
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
    """,
)
def q_window_timerange(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: each order's trailing-7-day order count
    and revenue for its customer — the rolling-metric shape (trailing
    spend, rate limits, velocity features) that ROWS frames cannot
    express because it must include ALL peers inside a time interval,
    however many rows they are.

    Spark's rangeBetween needs a numeric ordering key, so the frame
    runs over epoch microseconds with a literal 7-day offset — exactly
    the RANGE ... INTERVAL semantics DuckDB states directly (both
    bounds inclusive, ties are peers in both engines). Same scale
    story as every per-key window: one hash shuffle on o_custkey,
    per-customer state bounded by the 7-day horizon."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    seven_days_us = 7 * 24 * 3600 * 1_000_000
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_micros(F.col("o_orderdate").cast("timestamp")))
        .rangeBetween(-seven_days_us, 0)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_orders_7d"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("revenue_7d"),
    )
