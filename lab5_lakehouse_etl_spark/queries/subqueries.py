"""Subquery declared queries — the SQL entry point's decorrelation
surface (SURVEY §4: join reordering, constant folding, subquery
decorrelation come free from Catalyst "once we expose SQL"; this is
that exposure, exercised and oracle-verified).

Each query is ANSI SQL run verbatim through ``spark.sql`` over the
registered parquet views, with the same string as the DuckDB oracle —
one source of truth, two engines. Catalyst rewrites:

- uncorrelated IN  → left-semi join (``RewritePredicateSubquery``);
- correlated EXISTS / NOT EXISTS → left-semi / left-anti join;
- correlated scalar subquery → aggregate + left-outer join
  (``RewriteCorrelatedScalarSubquery``).

At scale every one of these becomes a plain shuffle/broadcast join —
no per-row re-execution, unlike a naive tuple-at-a-time engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import register_views
from . import query

_IN_SQL = """
SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
FROM customer
WHERE c_custkey IN (
  SELECT o_custkey FROM orders WHERE o_totalprice > 300000
)
"""

_EXISTS_SQL = """
SELECT s_suppkey, s_name
FROM supplier s
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_suppkey = s.s_suppkey
    AND l.l_quantity >= 49 AND l.l_discount > 0.09
)
"""

_NOT_EXISTS_SQL = """
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
)
"""

_SCALAR_SQL = """
SELECT p.p_partkey, round(p.p_retailprice, 2) AS retail_price,
       (SELECT round(avg(p2.p_retailprice), 4) FROM part p2
        WHERE p2.p_brand = p.p_brand) AS brand_avg_price
FROM part p
WHERE p.p_size > 40
"""


def _sql_query(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(sql)


@query("q_subquery_in", oracle=_IN_SQL)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated IN-subquery → Catalyst left-semi join on o_custkey;
    the subquery side is filtered+projected to one column before the
    shuffle (broadcastable at dimension scale)."""
    return _sql_query(spark, sf_dir, _IN_SQL)


@query("q_subquery_exists", oracle=_EXISTS_SQL)
def q_subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS → decorrelated left-semi join; the correlation
    predicate becomes the join key, the local predicates stay pushed
    below the join on the lineitem scan."""
    return _sql_query(spark, sf_dir, _EXISTS_SQL)


@query("q_subquery_notexists", oracle=_NOT_EXISTS_SQL)
def q_subquery_notexists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS → left-anti join (customers with no
    high-value order — TPC-H Q22's core pattern)."""
    return _sql_query(spark, sf_dir, _NOT_EXISTS_SQL)


@query("q_subquery_scalar", oracle=_SCALAR_SQL)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (per-brand average price, TPC-H
    Q17's shape) → RewriteCorrelatedScalarSubquery: one aggregate over
    part grouped by brand, left-outer-joined back — the subquery runs
    once, not per row."""
    return _sql_query(spark, sf_dir, _SCALAR_SQL)
