"""Source/sink unit tests (SURVEY §2.1 S3, S13, S14 — the reference's
mocked-S3 pytest patterns re-expressed against the local FS)."""

from __future__ import annotations

import csv
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


def test_xlsx_real_roundtrip(tmp_path):
    # write REAL .xlsx bytes with the vendored writer, read them back
    # through the S3/S4/S5 surface (vendored stdlib OOXML reader)
    from lab5_lakehouse_etl_spark.sources.readers import list_sheets, xlsx_to_csv
    from lab5_lakehouse_etl_spark.sources.xlsx import load_workbook, write_workbook

    sheets = {
        "jan": [["id", "name"], [1, "a"], [2, None], [3, "c,with comma"]],
        "feb": [["id", "name"], [4, "d"], [5.5, "é unicode"]],
        "empty": [],
    }
    path = write_workbook(sheets, str(tmp_path / "drop.xlsx"))
    assert list_sheets(path) == ["jan", "feb", "empty"]
    back = load_workbook(path)
    assert back["jan"] == [["id", "name"], [1, "a"], [2, None], [3, "c,with comma"]]
    assert back["feb"][2] == [5.5, "é unicode"]
    # per-sheet CSV split off the real bytes (S3 end-to-end)
    out = xlsx_to_csv(path, str(tmp_path / "csv"))
    assert sorted(os.path.basename(p) for p in out) == [
        "empty.csv",
        "feb.csv",
        "jan.csv",
    ]
    with open(tmp_path / "csv" / "jan.csv", newline="") as fh:
        rows = list(csv.reader(fh))
    assert rows == [["id", "name"], ["1", "a"], ["2", ""], ["3", "c,with comma"]]


def test_xlsx_gap_cells_and_bools(tmp_path):
    from lab5_lakehouse_etl_spark.sources.xlsx import load_workbook, write_workbook

    # row with a leading None: the cell reference places 'x' at col C
    path = write_workbook(
        {"s": [[None, None, "x"], [True, False, 7]]}, str(tmp_path / "g.xlsx")
    )
    back = load_workbook(path)
    assert back["s"] == [[None, None, "x"], [True, False, 7]]
