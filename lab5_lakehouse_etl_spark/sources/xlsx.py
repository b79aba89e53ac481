"""Minimal vendored XLSX reader/writer (no third-party deps).

XLSX is a public format: a zip archive of OOXML parts (ECMA-376).
The reference reads workbooks with openpyxl ``data_only=True``
(jobs/xlsx_to_csv.py:33 — formula RESULTS, not formulas) and lists
sheet names (common/utils.py:40-65). openpyxl is not in this
container, so this module implements the tiny subset those paths
need directly over ``zipfile`` + ``xml.etree``:

- sheet names in workbook order (``xl/workbook.xml`` + its rels);
- cell values per sheet: shared strings (t="s"), inline strings
  (t="inlineStr"), formula strings (t="str"), booleans (t="b"),
  and numbers (int when integral). For formula cells the cached
  ``<v>`` result is returned — exactly openpyxl's ``data_only``
  semantics;
- gap handling: cell references (``r="C3"``) place values at their
  true column index, missing cells become None, trailing rows/
  columns are sized per row like openpyxl's ``values_only`` rows.

The writer emits inline-string/number workbooks — enough to build
real fixture files so the reader is tested against actual .xlsx
bytes, not a mock.
"""

from __future__ import annotations

import zipfile
from collections.abc import Mapping, Sequence
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS_MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_NS_REL_DOC = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_NS_REL_PKG = "http://schemas.openxmlformats.org/package/2006/relationships"


def _col_index(cell_ref: str) -> int:
    """``'C3'`` → 2 (0-based column from the letter prefix)."""
    idx = 0
    for ch in cell_ref:
        if ch.isalpha():
            idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return idx - 1


def _col_letter(idx: int) -> str:
    """0-based column → ``'A'``, 25 → ``'Z'``, 26 → ``'AA'``."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _parse_cell(cell: ET.Element, shared: list[str]):
    t = cell.get("t", "n")
    v = cell.find(f"{{{_NS_MAIN}}}v")
    if t == "inlineStr":
        is_el = cell.find(f"{{{_NS_MAIN}}}is")
        return "".join(is_el.itertext()) if is_el is not None else None
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "str":
        return v.text
    if t == "b":
        return v.text == "1"
    # numeric: int when integral so CSV round-trips match openpyxl
    num = float(v.text)
    return int(num) if num.is_integer() else num


def load_workbook(path: str) -> dict[str, list[list[object]]]:
    """Read every sheet → rows of cell values (None for gaps), sheets
    in workbook order, formula cells as their cached results."""
    with zipfile.ZipFile(path) as zf:
        # shared strings (absent when no string cells exist)
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            shared = [
                "".join(si.itertext()) for si in root.findall(f"{{{_NS_MAIN}}}si")
            ]
        # sheet name → part path, via the workbook relationships
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        targets = {
            rel.get("Id"): rel.get("Target")
            for rel in rels.findall(f"{{{_NS_REL_PKG}}}Relationship")
        }
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        out: dict[str, list[list[object]]] = {}
        for sheet in wb.find(f"{{{_NS_MAIN}}}sheets"):
            name = sheet.get("name")
            target = targets[sheet.get(f"{{{_NS_REL_DOC}}}id")]
            part = target if target.startswith("xl/") else f"xl/{target}"
            root = ET.fromstring(zf.read(part))
            rows: list[list[object]] = []
            for row_el in root.iter(f"{{{_NS_MAIN}}}row"):
                row: list[object] = []
                for cell in row_el.findall(f"{{{_NS_MAIN}}}c"):
                    ref = cell.get("r")
                    col = _col_index(ref) if ref else len(row)
                    while len(row) <= col:
                        row.append(None)
                    row[col] = _parse_cell(cell, shared)
                rows.append(row)
            # openpyxl values_only parity: rows pad to the sheet width
            width = max((len(r) for r in rows), default=0)
            out[name] = [r + [None] * (width - len(r)) for r in rows]
        return out


def sheet_names(path: str) -> list[str]:
    """Sheet names in workbook order without parsing any sheet part."""
    with zipfile.ZipFile(path) as zf:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        return [s.get("name") for s in wb.find(f"{{{_NS_MAIN}}}sheets")]


# ---------------------------------------------------------------------------
# writer (fixtures/tests): inline strings + numbers, one part per sheet
# ---------------------------------------------------------------------------

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType='
    '"application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    "{sheet_overrides}</Types>"
)
_SHEET_OVERRIDE = (
    '<Override PartName="/xl/worksheets/sheet{i}.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
)
_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<Relationships xmlns="{_NS_REL_PKG}">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{1 if value else 0}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value}</v></c>'
    return f'<c r="{ref}" t="inlineStr"><is><t>{escape(str(value))}</t></is></c>'


def write_workbook(
    sheets: Mapping[str, Sequence[Sequence[object]]], path: str
) -> str:
    """Write a minimal real .xlsx (inline strings, numbers, booleans);
    returns ``path``. Fixture-grade, not a full OOXML writer."""
    names = list(sheets)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(
            "[Content_Types].xml",
            _CONTENT_TYPES.format(
                sheet_overrides="".join(
                    _SHEET_OVERRIDE.format(i=i + 1) for i in range(len(names))
                )
            ),
        )
        zf.writestr("_rels/.rels", _ROOT_RELS)
        sheets_xml = "".join(
            f'<sheet name="{escape(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, n in enumerate(names)
        )
        zf.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<workbook xmlns="{_NS_MAIN}" xmlns:r="{_NS_REL_DOC}">'
            f"<sheets>{sheets_xml}</sheets></workbook>",
        )
        rels_xml = "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/worksheet"
            f'" Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<Relationships xmlns="{_NS_REL_PKG}">{rels_xml}</Relationships>',
        )
        for i, name in enumerate(names):
            rows_xml = []
            for r, row in enumerate(sheets[name], start=1):
                cells = "".join(
                    _cell_xml(f"{_col_letter(c)}{r}", v)
                    for c, v in enumerate(row)
                )
                rows_xml.append(f'<row r="{r}">{cells}</row>')
            zf.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                f'<worksheet xmlns="{_NS_MAIN}">'
                f"<sheetData>{''.join(rows_xml)}</sheetData></worksheet>",
            )
    return path
