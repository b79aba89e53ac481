"""§2.8 UDF-surface tests: the pandas UDAF demo must agree with its
JVM algebraic twin, and the UDTF must agree with the built-in explode
— pinning that the Python escape hatches are result-transparent."""

from __future__ import annotations

from pyspark.sql import functions as F

from lab5_lakehouse_etl_spark.queries import events_ops, text_ops
from lab5_lakehouse_etl_spark.session import load_table
from tests.conftest import SF_DIR


def test_udaf_geomean_equals_builtin(spark):
    udaf = {
        r["event_type"]: (r["n_events"], r["geomean_value"])
        for r in events_ops.q_udaf_geomean(spark, SF_DIR).collect()
    }
    builtin = {
        r["event_type"]: (r["n_events"], r["geomean_value"])
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.exp(F.avg(F.log("value"))), 4).alias("geomean_value"),
        )
        .collect()
    }
    assert udaf == builtin


def test_udtf_tokens_equals_builtin_explode(spark):
    udtf = sorted(
        (r["doc_id"], r["pos"], r["token"])
        for r in text_ops.q_udtf_tokens(spark, SF_DIR).collect()
    )
    builtin = sorted(
        (r["doc_id"], r["pos"], r["token"])
        for r in load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") < 20)
        .select(
            "doc_id",
            F.posexplode(F.split(F.trim(F.lower("text")), r"\s+")).alias(
                "pos", "token"
            ),
        )
        .collect()
    )
    assert udtf == builtin
