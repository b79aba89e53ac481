"""Differential-oracle tests: every declared SQL query runs on Spark
and DuckDB over the same parquet (sf0.001) and must match — the local
mirror of the driver's t2 correctness gate. Rows-only queries are
smoke-run (≥0 rows, stable schema)."""

from __future__ import annotations

import pytest

from lab5_lakehouse_etl_spark import queries as Q
from tests.conftest import SF_DIR, compare_with_oracle

Q.load_all()

SQL_QUERIES = sorted(Q.ORACLES)
ROWS_ONLY = sorted(set(Q.QUERIES) - set(Q.ORACLES))


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_oracle_match(spark, ddb, name):
    df = Q.QUERIES[name](spark, SF_DIR)
    compare_with_oracle(df, ddb, Q.ORACLES[name])


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    df = Q.QUERIES[name](spark, SF_DIR)
    rows = df.collect()
    assert rows is not None
    assert len(df.schema.fields) > 0
