"""Skew-mitigation declared queries (operators/skew.py exercised on
the declared surface, not just pytest).

``events.user_id`` is the natural hot-key column of the fixture set.
At test scale no key is actually pathological — the point of declaring
these is (a) the driver hash-checks that salting is RESULT-TRANSPARENT
(salted plan ≡ unsalted SQL), and (b) bench tracks the salted plans'
constant overhead so the mitigation stays cheap enough to leave on for
genuinely skewed keys at 100 TB, where one key's rows exceeding one
reducer is fatal to the unsalted plan (AQE splits partitions, not
keys — salting is the only fix for a single hot KEY feeding an agg).

Sums ACCUMULATE as DECIMAL so the two-phase (partial-per-salt, then
combine) addition order cannot perturb the result, but the declared
OUTPUT columns are round(CAST(.. AS DOUBLE), 2): the driver's hash
layer represents DECIMAL the way it represents HUGEINT (pandas has
neither, both land as float64 on the oracle side while Spark's stays
typed), so a decimal output column hash-mismatches even when every
value is equal — the r3 failure class. Order-insensitivity is about
the accumulation, not the output type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.skew import salted_agg, salted_join
from ..session import load_table
from . import query


@query(
    "q_skew_salted_agg",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT)                    AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2)
                                                       AS sum_value
    FROM events
    GROUP BY user_id
    """,
)
def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over the hot-key column: partials
    on (user_id, salt) then a combine on user_id — a hot key's reduce
    state is split across n_salts reducers. Result-identical to the
    plain groupBy (the oracle)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("value").cast("decimal(18,6)").alias("value")
    )
    out = salted_agg(
        ev,
        keys=["user_id"],
        aggs={"n_events": ("value", "count"), "sum_value": ("value", "sum")},
        n_salts=8,
    )
    return out.select(
        "user_id",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round(F.col("sum_value").cast("double"), 2).alias("sum_value"),
    )


@query(
    "q_skew_salted_join",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_events,
           round(CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE), 2)
                                                    AS sum_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join: the big (events) side gets a per-row salt, the
    small (customer) side is replicated n_salts times, and the join key
    becomes (user_id, salt) — one hot user's rows land on n_salts
    reducers instead of one. Salting targets the regime where the small
    side exceeds the broadcast threshold (else broadcast wins outright);
    at fixture scale Catalyst may still broadcast the replicated side —
    the result is identical under either physical strategy, which is
    exactly what the oracle hash pins."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("value").cast("decimal(18,6)").alias("value")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(ev, cust, on=["user_id"], n_salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.round(F.sum("value").cast("double"), 2).alias("sum_value"),
    )
