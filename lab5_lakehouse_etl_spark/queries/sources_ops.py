"""Source-ingestion declared queries (SURVEY §2.1 S1, S3).

The reference's landing path is XLSX → per-sheet CSV → schemaless
all-string CSV scan → permissive cast (jobs/xlsx_to_csv.py:28-55,
jobs/order_glue_job.py:87,105-109). These queries exercise that path
end-to-end on driver fixtures: materialize a table as CSV (resp. an
in-memory workbook), run the real readers, and return a DataFrame the
oracle can check against the original parquet.

Staged CSVs land under a stable per-process scratch dir
(``session.scratch_dir``) so both queries return the DISTRIBUTED scan
directly — no ``collect()`` anywhere in the declared path; the result
the driver hashes is the lazy CSV scan + cast plan itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table, scratch_dir, tune
from ..sources.readers import read_csv_untyped, split_workbook
from . import query


@query(
    "q_scan_csv",
    oracle="""
    SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
           n_name,
           CAST(n_regionkey AS BIGINT) AS n_regionkey
    FROM nation
    """,
)
def q_scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 + P3: header CSV scan with NO schema — every column lands as
    string (jobs/order_glue_job.py:87) — then the permissive cast block
    types it (jobs/order_glue_job.py:105-109). Round-trips `nation`
    through a real CSV file so the all-string landing → try_cast path is
    what the oracle hashes."""
    tune(spark)
    nation = load_table(spark, sf_dir, "nation")
    csv_dir = scratch_dir("q_scan_csv", fresh=True) + "/nation_csv"
    nation.coalesce(1).write.mode("overwrite").option("header", True).csv(csv_dir)
    landed = read_csv_untyped(spark, csv_dir)
    return landed.select(
        F.col("n_nationkey").try_cast("bigint").alias("n_nationkey"),
        F.col("n_name"),
        F.col("n_regionkey").try_cast("bigint").alias("n_regionkey"),
    )


@query(
    "q_xlsx_ingest",
    oracle="""
    SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey,
           r_name,
           'sheet_' || CAST(r_regionkey // 2 AS VARCHAR)           AS sheet_name,
           'sheet_' || CAST(r_regionkey // 2 AS VARCHAR) || '.csv' AS source_file
    FROM region
    """,
)
def q_xlsx_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: XLSX multi-sheet → per-sheet CSV split (jobs/xlsx_to_csv.py:
    28-55: each sheet → `<sheet>.csv`, None → ''), then the S1 scan with
    `sheet_name`/`source_file` lineage columns the warehouse schemas
    expect (SURVEY §1.1). Oracle-paired: sheets are built
    deterministically (regionkeys sorted, two per sheet), so the
    lineage columns are a pure function of r_regionkey and the whole
    workbook → CSV → scan path hash-compares against plain SQL.

    The workbook is built deterministically from `region` (one sheet per
    region pair, like the reference's monthly multi-sheet order drops).
    """
    tune(spark)
    region = load_table(spark, sf_dir, "region")
    rows = sorted(region.collect(), key=lambda r: r.r_regionkey)
    header = ["r_regionkey", "r_name"]
    sheets = {
        f"sheet_{i}": [header]
        + [[r.r_regionkey, r.r_name] for r in rows[i * 2 : i * 2 + 2]]
        for i in range((len(rows) + 1) // 2)
    }
    land = scratch_dir("q_xlsx_ingest", fresh=True)
    written = split_workbook(sheets, land)
    assert len(written) == len(sheets)
    # One scan over every per-sheet CSV; lineage comes from the file
    # name itself (input_file_name), exactly how a production landing
    # scan would attribute rows to their source drop.
    landed = read_csv_untyped(spark, land)
    return landed.select(
        F.col("r_regionkey").try_cast("bigint").alias("r_regionkey"),
        "r_name",
        F.regexp_extract(F.input_file_name(), r"([^/]+)\.csv$", 1).alias(
            "sheet_name"
        ),
        F.regexp_extract(F.input_file_name(), r"([^/]+\.csv)$", 1).alias(
            "source_file"
        ),
    )


@query(
    "q_scan_jsonl",
    oracle="""
    SELECT doc_id, text, lang, source, CAST(n_chars AS BIGINT) AS n_chars
    FROM documents
    """,
)
def q_scan_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL round-trip scan — the LLM-corpus landing format the
    reference's CSV/XLSX path doesn't cover: materialize `documents`
    as JSON-Lines (Spark's own line-per-object writer, newlines and
    quotes in text escaped per RFC 8259), then scan it back through
    sources.readers.read_jsonl with the DECLARED schema (no sampling
    inference pass — at 100 TB inference reads the corpus twice) and
    hash-compare the distributed scan against the original parquet
    truth.  The declared-schema read also pins column ORDER (JSON
    objects carry no order; inference would alphabetize), so the
    result schema is exactly the table's."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ..sources.readers import read_jsonl

    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    land = scratch_dir("q_scan_jsonl", fresh=True) + "/documents_jsonl"
    docs.write.mode("overwrite").json(land)
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    )
    return read_jsonl(spark, land, schema)
