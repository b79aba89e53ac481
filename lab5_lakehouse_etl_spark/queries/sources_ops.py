"""Source-ingestion declared queries (SURVEY §2.1 S1, S3).

The reference's landing path is XLSX → per-sheet CSV → schemaless
all-string CSV scan → permissive cast (jobs/xlsx_to_csv.py:28-55,
jobs/order_glue_job.py:87,105-109). These queries exercise that path
end-to-end on driver fixtures: materialize a table as CSV (resp. an
in-memory workbook), run the real readers, and return a DataFrame the
oracle can check against the original parquet.

Both collect through ``createDataFrame`` at the end because the staged
CSV files live in a TemporaryDirectory that is gone before the driver
collects; the staged tables are tiny landing files (nation: 25 rows,
region: 5), matching the reference's lab-scale raw zone, so this is
driver-side by design — the distributed path starts at the CSV scan,
which is a real ``spark.read.csv``.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table, tune
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
    with tempfile.TemporaryDirectory() as tmp:
        csv_dir = f"{tmp}/nation_csv"
        nation.coalesce(1).write.option("header", True).csv(csv_dir)
        landed = read_csv_untyped(spark, csv_dir)
        typed = landed.select(
            F.col("n_nationkey").try_cast("bigint").alias("n_nationkey"),
            F.col("n_name"),
            F.col("n_regionkey").try_cast("bigint").alias("n_regionkey"),
        )
        rows = typed.collect()
    return spark.createDataFrame(
        rows, "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT"
    )


@query("q_xlsx_ingest")
def q_xlsx_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: XLSX multi-sheet → per-sheet CSV split (jobs/xlsx_to_csv.py:
    28-55: each sheet → `<sheet>.csv`, None → ''), then the S1 scan with
    `sheet_name`/`source_file` lineage columns the warehouse schemas
    expect (SURVEY §1.1). Rows-only: workbook I/O is not SQL.

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
    with tempfile.TemporaryDirectory() as tmp:
        written = split_workbook(sheets, tmp)
        assert len(written) == len(sheets)
        # One scan over every per-sheet CSV; lineage comes from the file
        # name itself (input_file_name), exactly how a production landing
        # scan would attribute rows to their source drop.
        landed = read_csv_untyped(spark, tmp)
        lineage = landed.select(
            F.col("r_regionkey").try_cast("bigint").alias("r_regionkey"),
            "r_name",
            F.regexp_extract(F.input_file_name(), r"([^/]+)\.csv$", 1).alias(
                "sheet_name"
            ),
            F.regexp_extract(F.input_file_name(), r"([^/]+\.csv)$", 1).alias(
                "source_file"
            ),
        )
        out = lineage.collect()
    return spark.createDataFrame(
        sorted(out, key=lambda r: r.r_regionkey),
        "r_regionkey BIGINT, r_name STRING, sheet_name STRING, source_file STRING",
    )
