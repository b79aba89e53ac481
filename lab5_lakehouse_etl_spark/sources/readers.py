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


#: Avro primitive -> Spark type for the source reader (int maps to
#: Spark integer, not long — Avro int is 32-bit by spec)
_AVRO_SPARK = {
    "boolean": "boolean",
    "int": "integer",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "bytes": "binary",
}


def _avro_field_spark_type(t) -> tuple[str, bool]:
    """(spark type name, nullable) for one Avro record-field type.
    ``["null", T]`` unions mean nullable T; anything nested or
    logical-typed refuses loudly (this reader covers the flat-record
    shape a warehouse ingest lands — nested Avro belongs to a schema
    registry integration, not a silent partial decode)."""
    nullable = False
    if isinstance(t, list):
        branches = [b for b in t if b != "null"]
        if len(branches) != 1 or len(branches) == len(t):
            raise NotImplementedError(f"avro union {t!r} unsupported")
        nullable = True
        t = branches[0]
    if isinstance(t, dict):
        raise NotImplementedError(
            f"avro nested/logical type {t.get('type')!r} unsupported in "
            "read_avro (flat records of primitives only)"
        )
    if t not in _AVRO_SPARK:
        raise NotImplementedError(f"avro type {t!r} unsupported")
    return _AVRO_SPARK[t], nullable


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Distributed Avro Object-Container-File source over the vendored
    spec codec (``lakehouse/avro.py`` — the same decoder the Iceberg
    manifests round-trip through): a driver-side HEADER-ONLY probe of
    one file yields the writer schema (``avro.read_schema`` — no data
    block is touched), then ``binaryFile`` rows decode executor-side
    via Arrow-batched ``mapInPandas`` (``avro.decode_container``), so
    file bytes never cross a shuffle and files are the unit of
    parallelism.

    Scale boundary (stated): parallelism is per FILE — the normal
    shape of warehouse Avro landings (many files from many producer
    tasks).  Block-level splitting on sync markers, codecs beyond
    null/deflate, and nested/logical types are refused loudly, not
    half-read; ``path`` may be a glob."""
    import glob as _glob

    import pandas as pd

    from ..lakehouse import avro as A

    first = sorted(_glob.glob(path)) or [path]
    _, schema = A.read_schema(first[0])
    if not (isinstance(schema, dict) and schema.get("type") == "record"):
        raise NotImplementedError("read_avro needs a record writer schema")
    names: list[str] = []
    fields = []
    for f in schema["fields"]:
        st, nullable = _avro_field_spark_type(f["type"])
        names.append(f["name"])
        fields.append(f'{f["name"]} {st}')
    ddl = ", ".join(fields)

    # the driver-probed field list is the TYPE CONTRACT every file in
    # the glob must honor: each file decodes with its own embedded
    # writer schema, so a mixed-schema glob would otherwise silently
    # yield None for missing columns and drop extras via rec.get —
    # exactly the partial decode this module refuses (r14 advice).
    expect_fields = [(f["name"], f["type"]) for f in schema["fields"]]

    def batches(it):
        import json as _json

        for pdf in it:
            for content in pdf["content"]:
                meta, records = A.decode_container(bytes(content))
                raw = meta.get("avro.schema", b"")
                wschema = _json.loads(
                    raw.decode() if isinstance(raw, (bytes, bytearray)) else raw
                )
                got = [
                    (f["name"], f["type"]) for f in wschema.get("fields", [])
                ]
                if got != expect_fields:
                    raise ValueError(
                        "read_avro: mixed writer schemas in one glob — "
                        f"probed fields {expect_fields!r} but a file "
                        f"carries {got!r}; split the read per schema"
                    )
                yield pd.DataFrame(
                    [[rec.get(n) for n in names] for rec in records],
                    columns=names,
                )

    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("content")
        .mapInPandas(batches, schema=ddl)
    )


#: read_warc output schema (sources/warc.py FIELDS, Spark types)
WARC_SCHEMA = (
    "record_id string, warc_type string, target_uri string, "
    "warc_date string, content_type string, http_status int, "
    "http_content_type string, "
    "n_content_bytes bigint, payload binary, verdict string"
)


def decode_warc_content(df: DataFrame) -> DataFrame:
    """Arrow-batched WARC decode over ANY relation with a ``content``
    binary column (``warc.parse_warc_bytes``), one output row per
    record — or per quarantined region — with a ``verdict`` column
    instead of exceptions, so one corrupt crawl member never kills
    the task (the decode_or_quarantine doctrine,
    functions/multimodal.py).  Shared by the batch source
    (:func:`read_warc`) and the streaming ingest gate
    (``streaming/events.stream_warc_gate``) — decode semantics are
    defined ONCE."""
    import pandas as pd

    from . import warc as W

    def batches(it):
        for pdf in it:
            for content in pdf["content"]:
                recs = W.parse_warc_bytes(bytes(content))
                yield pd.DataFrame(
                    [[r[k] for k in W.FIELDS] for r in recs],
                    columns=list(W.FIELDS),
                )

    return df.select("content").mapInPandas(batches, schema=WARC_SCHEMA)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC (ISO 28500) source over the pure-stdlib
    parser (``sources/warc.py``): ``binaryFile`` rows decode
    executor-side via :func:`decode_warc_content`.

    Scale boundary (stated, the ``read_avro`` precedent): parallelism
    is per FILE — the normal crawl landing is one .warc.gz per
    fetcher task, thousands of files; record-level splitting inside
    one giant file is refused, not half-built.  Payload bytes never
    cross a shuffle here — they stay inside the scan until a
    downstream projection decides their fate; ``path`` may be a
    glob."""
    return decode_warc_content(
        spark.read.format("binaryFile").load(path)
    )
