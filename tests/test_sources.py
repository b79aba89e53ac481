"""Source/sink unit tests (SURVEY §2.1 S3, S13, S14 — the reference's
mocked-S3 pytest patterns re-expressed against the local FS)."""

from __future__ import annotations

import os
from datetime import datetime, timezone

from lab5_lakehouse_etl_spark.sources.readers import (
    passthrough_copy,
    split_workbook,
)
from lab5_lakehouse_etl_spark.sources.writers import archive_file


def test_split_workbook_sheet_csvs(tmp_path):
    # jobs/xlsx_to_csv.py:39-55 semantics: one CSV per sheet, named
    # <sheet>.csv, None cells → ''
    sheets = {
        "apr": [["a", "b"], [1, None], [None, "x"]],
        "may": [["a", "b"], [2, 3]],
    }
    out = split_workbook(sheets, str(tmp_path / "pre"))
    assert sorted(os.path.basename(p) for p in out) == ["apr.csv", "may.csv"]
    apr = open(tmp_path / "pre" / "apr.csv").read().splitlines()
    assert apr == ["a,b", "1,", ",x"]


def test_archive_file_timestamp_suffix(tmp_path):
    src = tmp_path / "orders_apr_2025.csv"
    src.write_text("x")
    fixed = datetime(2025, 4, 30, 12, 0, 5, tzinfo=timezone.utc)
    dst = archive_file(str(src), str(tmp_path / "archive"), now=fixed)
    assert os.path.basename(dst) == "orders_apr_2025_20250430_120005.csv"
    assert not src.exists()
    assert os.path.exists(dst)


def test_passthrough_copy(tmp_path):
    src = tmp_path / "products.csv"
    src.write_text("product_id\n1\n")
    dst = passthrough_copy(str(src), str(tmp_path / "staged"))
    assert open(dst).read() == "product_id\n1\n"
    assert src.exists()  # copy, not move (jobs/xlsx_to_csv.py:57-70)
