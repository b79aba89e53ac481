"""SQL-TEXT entry-path queries (r10 verdict next-round #3).

The reference's analytic read path is SQL text via Athena
(step_functions/state_machine.json:121,221,321): clients hand the
engine a STRING, so the ANTLR parser + analyzer surface is part of the
product, not an implementation detail.  The DataFrame twins elsewhere
in the registry cover the same semantics, but only a handful of
declared queries previously entered through ``spark.sql`` parsing
(q_sql_limit, q_sql_tpch_q1, the q_subquery_* family).  This module
adds the three missing text-path shapes the verdict named:

- a WINDOW function parsed from text (PARTITION BY / ORDER BY /
  frame-default rows), run verbatim on both engines;
- a LATERAL table generator (``LATERAL VIEW posexplode`` — the HiveQL
  branch of the grammar, plus a higher-order ``filter`` lambda inside
  the generator expression);
- a correlated scalar subquery in WHERE (decorrelated by
  ``RewriteCorrelatedScalarSubquery`` into one aggregate + join — at
  scale a broadcast join, never per-row re-execution).

Where Spark and DuckDB share a dialect the SAME string is both the
query and the oracle (one source of truth, two engines); the lateral
query's oracle restates the generator with DuckDB's unnest/
generate_series spelling since the TVF grammar genuinely differs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import register_views
from . import query

_WINDOW_SQL = """
SELECT c_nationkey,
       c_custkey,
       round(c_acctbal, 2) AS acctbal,
       rnk
FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         row_number() OVER (
           PARTITION BY c_nationkey
           ORDER BY c_acctbal DESC, c_custkey ASC
         ) AS rnk
  FROM customer
) ranked
WHERE rnk <= 3
"""


@query("q_sql_window", oracle=_WINDOW_SQL)
def q_sql_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function through the SQL-TEXT path: per-nation top-3
    customers by balance, row_number with a deterministic c_custkey
    tiebreak.  The identical string runs on DuckDB.  Spark plans one
    hash-partitioned shuffle on c_nationkey + in-partition sort — the
    same physical shape as the DataFrame twin q_topk_pergroup, reached
    through the parser instead of the builder API."""
    register_views(spark, sf_dir)
    return spark.sql(_WINDOW_SQL)


#: Spark side: HiveQL LATERAL VIEW + posexplode over a higher-order
#: filter lambda — two grammar branches (lateral generators, lambda
#: expressions) no other declared query parses from text.
_LATERAL_SPARK_SQL = """
SELECT doc_id,
       CAST(pos AS BIGINT) AS pos,
       tok
FROM documents
LATERAL VIEW posexplode(filter(split(text, ' '), x -> x != '')) t AS pos, tok
WHERE text IS NOT NULL
"""

#: DuckDB twin: same relation via generate_series over the filtered
#: token list (DuckDB has no LATERAL VIEW; the VALUES are the contract,
#: not the grammar).
_LATERAL_ORACLE_SQL = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x != '') AS ts
  FROM documents
  WHERE text IS NOT NULL
)
SELECT doc_id,
       CAST(i - 1 AS BIGINT) AS pos,
       ts[i] AS tok
FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ts))) AS i) g
"""


@query("q_sql_lateral", oracle=_LATERAL_ORACLE_SQL)
def q_sql_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral table generator through the SQL-TEXT path: positional
    token explode per document (LATERAL VIEW posexplode + a filter
    lambda, both parsed from text).  Generate semantics: a NULL/empty
    token list yields zero rows for that document — matched by the
    oracle's generate_series over the same filtered list.  At scale
    this is a narrow per-partition Generate operator: no shuffle, rows
    fan out where they live."""
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SPARK_SQL)


_DECORRELATE_SQL = """
SELECT s.s_suppkey, s.s_name, round(s.s_acctbal, 2) AS acctbal
FROM supplier s
WHERE s.s_acctbal > (
  SELECT avg(s2.s_acctbal) FROM supplier s2
  WHERE s2.s_nationkey = s.s_nationkey
)
"""


@query("q_sql_decorrelate", oracle=_DECORRELATE_SQL)
def q_sql_decorrelate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery in WHERE through the SQL-TEXT path
    (suppliers above their nation's average balance — the classic
    decorrelation exercise).  Catalyst's RewriteCorrelatedScalarSubquery
    turns the per-row subquery into ONE aggregate grouped by the
    correlation key joined back — identical string on DuckDB, so the
    decorrelated plan is value-pinned against a reference optimizer's
    answer, not just row counts."""
    register_views(spark, sf_dir)
    return spark.sql(_DECORRELATE_SQL)
