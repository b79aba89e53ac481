"""Readers (SURVEY §2.1 S1-S5, S14).

The reference lands XLSX + CSV in a raw zone, splits XLSX into per-
sheet CSVs driver-side with openpyxl (jobs/xlsx_to_csv.py:28-55), then
reads CSVs either schemaless-all-string (orders/items) or with a
declared StructType (products). The workbook loader uses openpyxl when
installed and otherwise the vendored stdlib OOXML reader
(sources/xlsx.py) — real .xlsx bytes round-trip either way; the
sheet-split semantics (each sheet → `<sheet>.csv`, None → '', formula
results not formulas) are shared and fully tested.
"""

from __future__ import annotations

import csv
import os
import shutil
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv_untyped(spark: SparkSession, path: str) -> DataFrame:
    """S1: header CSV read with NO schema — every column lands as
    string (jobs/order_glue_job.py:87). The permissive-cast block
    (operators.relational.cast_permissive) owns typing downstream."""
    return spark.read.option("header", True).csv(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """JSON-Lines read — the dominant LLM-training-corpus interchange
    format (one JSON object per line; WebDataset/The Pile/Dolma-style
    drops land this way).  With a declared schema the scan skips
    Spark's sampling inference pass entirely (at 100 TB, inference
    means reading the data twice); malformed lines become all-NULL
    rows (PERMISSIVE), matching the CSV readers' degradation
    contract."""
    reader = spark.read.option("mode", "PERMISSIVE")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_csv_with_schema(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """S2: typed CSV read with a declared StructType
    (jobs/products_glue_job.py:125-139). Malformed cells become NULL
    (PERMISSIVE mode), matching the reference's reader behavior."""
    return (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .schema(schema)
        .csv(path)
    )


def split_workbook(
    sheets: Mapping[str, Sequence[Sequence[object]]], out_dir: str
) -> list[str]:
    """S3 core: each sheet → ``<sheet>.csv``; None cells → '' — the
    exact write loop of jobs/xlsx_to_csv.py:39-55, minus openpyxl.

    Driver-side by design: workbooks are small landing files; the heavy
    lifting starts at the CSV scan, which is distributed.
    """
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for sheet_name, rows in sheets.items():
        out = os.path.join(out_dir, f"{sheet_name}.csv")
        with open(out, "w", newline="") as fh:
            w = csv.writer(fh)
            for row in rows:
                w.writerow(["" if c is None else c for c in row])
        written.append(out)
    return written


def load_workbook_sheets(xlsx_path: str) -> dict[str, list[list[object]]]:
    """S3/S4 loader: formula RESULTS, not formulas (openpyxl
    data_only=True semantics — jobs/xlsx_to_csv.py:33). Uses openpyxl
    when installed; otherwise the vendored stdlib OOXML reader
    (sources/xlsx.py), which returns cached formula values — the same
    data_only contract."""
    try:
        import openpyxl  # noqa: PLC0415
    except ImportError:
        from .xlsx import load_workbook  # noqa: PLC0415

        return load_workbook(xlsx_path)
    wb = openpyxl.load_workbook(xlsx_path, data_only=True)  # pragma: no cover
    return {  # pragma: no cover
        name: [list(row) for row in wb[name].iter_rows(values_only=True)]
        for name in wb.sheetnames
    }


def xlsx_to_csv(xlsx_path: str, out_dir: str) -> list[str]:
    """S3: XLSX multi-sheet → per-sheet CSVs (jobs/xlsx_to_csv.py:28-55)."""
    return split_workbook(load_workbook_sheets(xlsx_path), out_dir)


def list_sheets(xlsx_path: str) -> list[str]:
    """S5: sheet-name listing (common/utils.py:40-65)."""
    try:
        import openpyxl  # noqa: F401, PLC0415
    except ImportError:
        from .xlsx import sheet_names  # noqa: PLC0415

        return sheet_names(xlsx_path)
    return list(load_workbook_sheets(xlsx_path))  # pragma: no cover


def passthrough_copy(src: str, dst_dir: str) -> str:
    """S14: raw→staging unmodified copy (jobs/xlsx_to_csv.py:57-70)."""
    os.makedirs(dst_dir, exist_ok=True)
    dst = os.path.join(dst_dir, os.path.basename(src))
    shutil.copyfile(src, dst)
    return dst
