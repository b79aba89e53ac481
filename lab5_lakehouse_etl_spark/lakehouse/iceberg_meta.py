"""Vendored Apache Iceberg (table spec v2) metadata writer + snapshot
reader — the second half of the north-star interchange story
(BASELINE.json ``spark_approach``: "DataFrame transformations +
Delta/**Iceberg** table writes"; the Delta half is
``lakehouse/delta_log.py``, whose structure this module mirrors
exactly: mirror every LakeTable version into the open format's
metadata layout, then prove round-trip fidelity by reading the table
back EXCLUSIVELY through that metadata).

What gets written (Iceberg spec, format-version 2, Hadoop-table
layout under ``<table>/metadata/``):

* ``v{N}.metadata.json`` per LakeTable version plus
  ``version-hint.text`` — table uuid, location, accumulated
  ``schemas`` (field ids assigned by FIRST APPEARANCE of a column's
  PHYSICAL name, stable across versions AND renames — see the
  column-mapping paragraph below), ``partition-specs`` (identity
  transforms, partition field ids from 1000), ``snapshots`` with
  sequence numbers, snapshot-log and metadata-log;
* one manifest list per snapshot (``snap-{id}.avro``) and one data
  manifest per snapshot (``{id}-m0.avro``) — real Avro object
  container files (``lakehouse/avro.py``), not JSON stand-ins,
  with the spec's ``manifest_file`` / ``manifest_entry`` record
  schemas and field-id annotations.  This writer REWRITES the full
  manifest each commit (spec-legal; Iceberg's own writers may reuse
  prior manifests as an optimization): entries carry status
  ADDED/EXISTING/DELETED with their original data sequence numbers,
  so both snapshot scans and incremental (changelog) consumers see
  the right file sets.

Deletion vectors (r12 verdict next-round #3): a LakeTable DV is a
parquet relation of ``(file_path, row_index)`` pointers — exactly the
content of an Iceberg v2 POSITION-DELETE file (spec "Position Delete
Files": required columns ``file_path`` string / field id 2147483546
and ``pos`` long / field id 2147483545, sorted by (file_path, pos)).
The exporter converts each DV pointer set once into a position-delete
parquet (field ids stamped via PARQUET:field_id so external Iceberg
readers resolve the columns by id), tracks it in a DELETE manifest
(``manifest_file.content`` = 1, ``data_file.content`` = 1) written
with an UNPARTITIONED spec — spec-legal "global" position deletes
that apply across partitions, which matches LakeTable DV semantics
(pointers name exact files; partition scoping is redundant) — and
gives it the data sequence number of the snapshot that ADDED the DV,
so the spec's application rule (a position delete applies to data
files with data sequence number <= the delete's) reproduces
LakeTable's carry-forward semantics exactly: files appended AFTER a
DV commit carry a higher sequence number and are untouched by it.
``read_iceberg_snapshot`` applies the deletes the way LakeTable's own
reader does — broadcast anti-join on (normalized ``_metadata``
file path, row position) gated by the sequence-number rule; DV
relations are point-delete-sized by design (the copy-on-write
``delete`` is the path for big deletes), so the broadcast is always
small.

Column mapping (renames/drops, r13): field ids are assigned by first
appearance of a column's PHYSICAL name (what the parquet files store
— LakeTable renames are metadata-only, so the physical name is the
stable identity, exactly like an Iceberg field id), and the schema
emits the LOGICAL name under that stable id — which IS how Iceberg
expresses a rename (same id, new name).  Because the data files carry
no Iceberg field-id metadata, every metadata.json also carries the
spec's ``schema.name-mapping.default`` property mapping each field id
to its known names (physical first), which is precisely the spec's
mechanism for files written without field ids; external readers
resolve renamed columns through it, and ``read_iceberg_snapshot``
does the same (scan under physical names, alias to the snapshot's
logical names).  Drops need no mapping at all — the field simply
leaves the current schema while older schemas keep it; LakeTable's
tombstone list guarantees a dropped physical name is never reused,
so the global name mapping can never turn ambiguous.

Refuse-loudly rules (never a wrong answer), same doctrine as
delta_log:

* column types the spec genuinely cannot state (interval types, any
  future Spark exotic) — NOT tinyint/smallint, which export as
  ``int`` since r15: the spec has no 8/16-bit primitives and real
  writers promote at write time; parquet already stores them as
  physical INT32, so the export is lossless, and the source Spark
  type is recorded in ``graft.source-widened-types`` (nested
  struct/array/map gained element-level field ids in r14);
* partition columns other than int/long/string identity (a date
  partition would need the typed transform plumbing).

``read_iceberg_snapshot`` is the matching consumer: version-hint →
metadata.json → manifest list Avro → manifest Avro → partition-pruned
parquet reads with partition columns re-injected from the TYPED
partition struct — used by tests and the declared ``q_table_iceberg``
to prove round-trip fidelity without any iceberg package.

Scale: like Delta's log replay, metadata construction is O(files)
driver-side work per commit — kilobytes of Avro/JSON; the data path
stays distributed parquet.  A 100 TB table's cost center is the file
listing, which this layout avoids exactly the way real Iceberg does:
readers go straight from the manifest list to file paths with no
directory walk.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from . import avro
from .table import LakeTable, _unescape_partition_value

_META_DIR = "metadata"

#: Spark-schema-json primitive -> Iceberg primitive.  EXACT mappings
#: only: anything absent refuses loudly rather than silently widening.
_ICEBERG_TYPES = {
    "integer": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamptz",  # Spark TimestampType is UTC-adjusted
    "timestamp_ntz": "timestamp",
    "binary": "binary",
}
_SPARK_TYPES = {v: k for k, v in _ICEBERG_TYPES.items()}

#: Spark integer types the Iceberg spec CANNOT state exactly: there
#: are no 8/16-bit primitives, and real writers (Spark's own Iceberg
#: integration included) promote them to ``int`` at write time.
#: Parquet stores tinyint/smallint as physical INT32 (annotated
#: INT(8)/INT(16)), so an external reader scanning under the exported
#: int schema reads the SAME physical values — the widening is
#: spec-conform and lossless, unlike the silent-widening this writer
#: refused through r14; the source Spark type is recorded in the
#: table properties (``graft.source-widened-types``) so a consumer
#: that wants the narrow type back can recover it.  (Kept separate
#: from _ICEBERG_TYPES: folding these into the dict would corrupt
#: the _SPARK_TYPES inversion — "int" must reverse to "integer".)
_WIDENED_TYPES = {"byte": "int", "short": "int"}

#: manifest_entry Avro schema (Iceberg spec "Manifests" table; field
#: ids annotated as the Java writer does — legal extra Avro attrs)
def _manifest_entry_schema(partition_fields: list[dict]) -> dict:
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {
                "name": "snapshot_id",
                "type": ["null", "long"],
                "default": None,
                "field-id": 1,
            },
            {
                "name": "sequence_number",
                "type": ["null", "long"],
                "default": None,
                "field-id": 3,
            },
            {
                "name": "file_sequence_number",
                "type": ["null", "long"],
                "default": None,
                "field-id": 4,
            },
            {
                "name": "data_file",
                "field-id": 2,
                "type": {
                    "type": "record",
                    "name": "r2",
                    "fields": [
                        {"name": "content", "type": "int", "field-id": 134},
                        {
                            "name": "file_path",
                            "type": "string",
                            "field-id": 100,
                        },
                        {
                            "name": "file_format",
                            "type": "string",
                            "field-id": 101,
                        },
                        {
                            "name": "partition",
                            "field-id": 102,
                            "type": {
                                "type": "record",
                                "name": "r102",
                                "fields": partition_fields,
                            },
                        },
                        {
                            "name": "record_count",
                            "type": "long",
                            "field-id": 103,
                        },
                        {
                            "name": "file_size_in_bytes",
                            "type": "long",
                            "field-id": 104,
                        },
                        {
                            "name": "lower_bounds",
                            "field-id": 125,
                            "default": None,
                            "type": [
                                "null",
                                {
                                    "type": "array",
                                    "logicalType": "map",
                                    "items": {
                                        "type": "record",
                                        "name": "k126_v127",
                                        "fields": [
                                            {
                                                "name": "key",
                                                "type": "int",
                                                "field-id": 126,
                                            },
                                            {
                                                "name": "value",
                                                "type": "bytes",
                                                "field-id": 127,
                                            },
                                        ],
                                    },
                                },
                            ],
                        },
                        {
                            "name": "upper_bounds",
                            "field-id": 128,
                            "default": None,
                            "type": [
                                "null",
                                {
                                    "type": "array",
                                    "logicalType": "map",
                                    "items": {
                                        "type": "record",
                                        "name": "k129_v130",
                                        "fields": [
                                            {
                                                "name": "key",
                                                "type": "int",
                                                "field-id": 129,
                                            },
                                            {
                                                "name": "value",
                                                "type": "bytes",
                                                "field-id": 130,
                                            },
                                        ],
                                    },
                                },
                            ],
                        },
                    ],
                },
            },
        ],
    }


#: manifest_file Avro schema (Iceberg spec "Manifest Lists" table)
_MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
        {
            "name": "partitions",
            "type": [
                "null",
                {
                    "type": "array",
                    "items": {
                        "type": "record",
                        "name": "r508",
                        "fields": [
                            {
                                "name": "contains_null",
                                "type": "boolean",
                                "field-id": 509,
                            },
                            {
                                "name": "contains_nan",
                                "type": ["null", "boolean"],
                                "default": None,
                                "field-id": 518,
                            },
                            {
                                "name": "lower_bound",
                                "type": ["null", "bytes"],
                                "default": None,
                                "field-id": 510,
                            },
                            {
                                "name": "upper_bound",
                                "type": ["null", "bytes"],
                                "default": None,
                                "field-id": 511,
                            },
                        ],
                    },
                },
            ],
            "default": None,
            "field-id": 507,
        },
    ],
}


def _table_uuid(path: str) -> str:
    import uuid

    return str(
        uuid.UUID(hashlib.md5(os.path.abspath(path).encode()).hexdigest())
    )


def _snapshot_id(path: str, version: int) -> int:
    digest = hashlib.md5(
        f"{os.path.abspath(path)}|snap|{version}".encode()
    ).digest()
    return int.from_bytes(digest[:8], "big") & ((1 << 63) - 1)


def _iceberg_field_type(spark_type) -> str:
    """Exact Iceberg primitive for one Spark-schema-json field type;
    loud refusal otherwise (see module docstring)."""
    if isinstance(spark_type, str):
        if spark_type in _ICEBERG_TYPES:
            return _ICEBERG_TYPES[spark_type]
        if spark_type in _WIDENED_TYPES:
            # spec-conform promotion (see _WIDENED_TYPES): recorded in
            # table properties by the exporter, lossless over parquet
            return _WIDENED_TYPES[spark_type]
        if spark_type.startswith("decimal("):
            return "decimal(" + spark_type[8:].rstrip(")") + ")"
    raise NotImplementedError(
        f"column type {spark_type!r} has no exact Iceberg v2 mapping in "
        "this minimal writer"
    )


def _iceberg_type(spark_type, path: str, alloc) -> str | dict:
    """Iceberg schema type (primitive string or nested dict) for one
    Spark-schema-json type, assigning the spec's ELEMENT-LEVEL field
    ids through ``alloc(path)`` — struct members, list elements and
    map keys/values each carry a unique id (spec "Schemas and Data
    Types"); ``alloc`` keys ids by dotted path so they stay stable
    across versions and nested-field additions (r14 closed the
    nested-type half of the non-exact-primitives refusal; r15 closed
    the 8/16-bit half by spec-conform widening — _WIDENED_TYPES)."""
    if isinstance(spark_type, dict):
        t = spark_type.get("type")
        if t == "struct":
            return {
                "type": "struct",
                "fields": [
                    {
                        "id": alloc(f"{path}.{f['name']}"),
                        "name": f["name"],
                        "required": not f.get("nullable", True),
                        "type": _iceberg_type(
                            f["type"], f"{path}.{f['name']}", alloc
                        ),
                    }
                    for f in spark_type["fields"]
                ],
            }
        if t == "array":
            return {
                "type": "list",
                "element-id": alloc(f"{path}.element"),
                "element": _iceberg_type(
                    spark_type["elementType"], f"{path}.element", alloc
                ),
                "element-required": not spark_type.get("containsNull", True),
            }
        if t == "map":
            return {
                "type": "map",
                "key-id": alloc(f"{path}.key"),
                "key": _iceberg_type(
                    spark_type["keyType"], f"{path}.key", alloc
                ),
                "value-id": alloc(f"{path}.value"),
                "value": _iceberg_type(
                    spark_type["valueType"], f"{path}.value", alloc
                ),
                "value-required": not spark_type.get(
                    "valueContainsNull", True
                ),
            }
        raise NotImplementedError(
            f"Spark nested type {t!r} has no Iceberg v2 mapping here"
        )
    return _iceberg_field_type(spark_type)


def _partition_avro_type(iceberg_type: str) -> str:
    if iceberg_type in ("int",):
        return "int"
    if iceberg_type in ("long",):
        return "long"
    if iceberg_type == "string":
        return "string"
    raise NotImplementedError(
        f"identity partition over {iceberg_type} not supported by this "
        "minimal writer (int/long/string only)"
    )


def _transform_avro_type(result_type: str) -> str | dict:
    """Avro type of a non-identity transform's partition value:
    bucket/year/month/hour -> int, truncate -> its source type, and
    the day transform's date result is int days from epoch with the
    Avro date logical annotation (spec Appendix A)."""
    if result_type == "date":
        return {"type": "int", "logicalType": "date"}
    return _partition_avro_type(result_type)


def _typed_partition_value(raw: str | None, iceberg_type: str):
    if raw is None:
        return None
    return raw if iceberg_type == "string" else int(raw)


def _partition_values(
    relpath: str, partition_by: list[str]
) -> dict[str, str | None]:
    """Hive-dir partition values of one data-relative path (string
    form, null for the hive default partition) — same walk as
    delta_log._partition_values."""
    values: dict[str, str | None] = {}
    for seg in relpath.split("/")[:-1]:
        if "=" not in seg:
            continue
        col, raw = seg.split("=", 1)
        if col in partition_by:
            values[col] = _unescape_partition_value(raw)
    return {c: values.get(c) for c in partition_by}


def _file_rows(table: LakeTable, m: dict, relpath: str) -> int:
    """record_count is REQUIRED in a v2 data_file: prefer the LakeTable
    manifest's footer stats (free), else read the parquet footer."""
    rows = (m.get("file_stats", {}).get(relpath) or {}).get("rows")
    if rows is not None:
        return int(rows)
    import pyarrow.parquet as pq

    return pq.ParquetFile(
        os.path.join(table.data_dir, relpath)
    ).metadata.num_rows


#: Iceberg spec reserved field ids for position-delete file columns.
_POS_DELETE_PATH_ID = 2147483546
_POS_DELETE_POS_ID = 2147483545


def serialize_bound(value, iceberg_type: str) -> bytes | None:
    """Iceberg single-value serialization (spec Appendix D) for the
    bound types this exporter emits: little-endian int/long/float/
    double, UTF-8 string.  Types without an exact emission here (or
    null stats) return None and the column is simply absent from the
    bounds map — bounds are optional per column."""
    import struct as _struct

    if value is None:
        return None
    try:
        if iceberg_type == "int":
            return _struct.pack("<i", int(value))
        if iceberg_type == "long":
            return _struct.pack("<q", int(value))
        if iceberg_type == "float":
            return _struct.pack("<f", float(value))
        if iceberg_type == "double":
            return _struct.pack("<d", float(value))
        if iceberg_type == "string":
            return str(value).encode("utf-8")
    except (ValueError, OverflowError, _struct.error):
        return None
    return None


def deserialize_bound(raw: bytes, iceberg_type: str):
    """Inverse of :func:`serialize_bound` for the numeric types the
    reader prunes on (strings are exported but never pruned on — a
    writer may legally truncate string bounds)."""
    import struct as _struct

    if iceberg_type == "int":
        return _struct.unpack("<i", raw)[0]
    if iceberg_type == "long":
        return _struct.unpack("<q", raw)[0]
    if iceberg_type == "float":
        return _struct.unpack("<f", raw)[0]
    if iceberg_type == "double":
        return _struct.unpack("<d", raw)[0]
    return None


def _normalize_file_uri(uri: str) -> str:
    """``file:/p`` / ``file:///p`` (Spark ``_metadata.file_path``
    forms) -> plain absolute path ``/p`` — the form manifests store
    in ``data_file.file_path``.  The spec requires position-delete
    ``file_path`` values to match the manifest path EXACTLY."""
    if uri.startswith("file:"):
        return "/" + uri[5:].lstrip("/")
    return uri


def _write_position_deletes(
    table: LakeTable, dv_dir: str, out_path: str
) -> int:
    """Convert one LakeTable DV pointer set (``(file_path, row_index)``
    parquet under the table log) into an Iceberg v2 position-delete
    parquet at ``out_path``: manifest-form paths, spec sort order
    (file_path, pos), reserved field ids stamped so id-resolving
    readers find the columns.  Returns the pointer-row count.

    Driver-side pyarrow by design: DV relations are point-delete-sized
    (kilobytes — the same cost class as the rest of this metadata
    writer); a delete too big for that belongs in copy-on-write
    ``delete``, which produces plain data manifests."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = pq.read_table(
        os.path.join(table.log_dir, dv_dir),
        columns=["file_path", "row_index"],
    )
    rows = sorted(
        (_normalize_file_uri(fp), int(ri))
        for fp, ri in zip(
            src.column("file_path").to_pylist(),
            src.column("row_index").to_pylist(),
        )
    )
    schema = pa.schema(
        [
            pa.field(
                "file_path",
                pa.string(),
                nullable=False,
                metadata={b"PARQUET:field_id": str(_POS_DELETE_PATH_ID).encode()},
            ),
            pa.field(
                "pos",
                pa.int64(),
                nullable=False,
                metadata={b"PARQUET:field_id": str(_POS_DELETE_POS_ID).encode()},
            ),
        ]
    )
    pq.write_table(
        pa.table(
            {
                "file_path": [r[0] for r in rows],
                "pos": [r[1] for r in rows],
            },
            schema=schema,
        ),
        out_path,
    )
    return len(rows)


def export_iceberg_metadata(
    table: LakeTable,
    partition_transforms: dict[str, tuple[str, str]] | None = None,
) -> str:
    """Mirror every LakeTable version into ``<table>/metadata/`` as
    Iceberg spec-v2 metadata; returns the metadata directory.

    Idempotent the same way ``export_delta_log`` is: re-export rewrites
    the whole metadata tree from the (immutable) LakeTable manifests.
    Data files are NOT copied — manifests reference the existing
    ``data/...`` parquet tree by absolute path, exactly how Iceberg
    references files that external compactors wrote elsewhere.

    ``partition_transforms`` declares that a hive partition column of
    the LakeTable is a DERIVED transform value, not a data column:
    ``{derived_col: (transform, source_col)}`` with ``transform`` one
    of ``bucket[N]`` / ``truncate[W]`` / ``year`` / ``month`` /
    ``day`` / ``hour`` (see ``iceberg_transforms``).  The exported
    schema then EXCLUDES the derived column (a transform value lives
    only in metadata + file layout, exactly like real Iceberg), the
    spec field names the SOURCE column's field id with the transform
    string, and the partition struct carries the transform's typed
    result.  The exporter VERIFIES the claim per data file where the
    transform is order-preserving: the source column's footer min/max
    must map to the file's partition value (a file that violates it
    was not actually partitioned by that transform — loud ValueError,
    never wrong metadata).  Bucket values are range-checked
    ``0 <= v < N``; their hash correctness is pinned by the
    independent-validator tests (Guava murmur3 / Spark hashLong —
    tests/test_iceberg_transforms.py)."""
    from . import iceberg_transforms as _tr

    transforms = dict(partition_transforms or {})
    parsed_tr: dict[str, tuple[str, int | None, str]] = {}
    for dcol, (tstr, src) in transforms.items():
        tname, tparam = _tr.parse_transform(tstr)
        if tname == "identity":
            raise ValueError(
                "identity belongs in partition_by, not "
                "partition_transforms"
            )
        parsed_tr[dcol] = (tname, tparam, src)
    meta_dir = os.path.join(table.path, _META_DIR)
    if os.path.isdir(meta_dir):
        shutil.rmtree(meta_dir)
    os.makedirs(meta_dir)

    field_ids: dict[str, int] = {}  # column name -> id, first appearance
    schemas: list[dict] = []  # accumulated distinct schemas
    specs: list[dict] = []  # accumulated distinct partition specs
    snapshots: list[dict] = []
    snapshot_log: list[dict] = []
    metadata_log: list[dict] = []
    add_seq: dict[str, int] = {}  # relpath -> data sequence number
    add_snap: dict[str, int] = {}  # relpath -> snapshot that added it
    prev_files: set[str] = set()
    # position-delete bookkeeping: a DV dir converts to ONE delete
    # file, sequence-numbered at the snapshot that first listed it
    # (= the delete_dv commit; later snapshots carry it as EXISTING)
    dv_seq: dict[str, int] = {}  # dv dir -> data sequence number
    dv_snap: dict[str, int] = {}  # dv dir -> snapshot that added it
    dv_rows: dict[str, int] = {}  # dv dir -> pointer-row count
    dv_path: dict[str, str] = {}  # dv dir -> delete parquet path
    prev_dv: set[str] = set()
    versions = table._versions()
    #: field id -> known names, physical FIRST (the name-mapping rows)
    name_aliases: dict[int, list[str]] = {}
    #: logical name -> source Spark type, for columns the export
    #: widened per _WIDENED_TYPES (surfaced as a table property so
    #: consumers can recover the narrow type; top-level columns —
    #: nested members widen identically but are identified by their
    #: element ids, not names)
    widened_cols: dict[str, str] = {}
    for v in versions:
        m = table._manifest(v)
        mapping = m.get("column_mapping") or {}
        seq = v + 1
        snap_id = _snapshot_id(table.path, v)
        ts_ms = int(float(m.get("committed_at", 0)) * 1000)

        # ---- schema (ids by first appearance of the PHYSICAL name —
        # the parquet-side identity a metadata-only rename never moves
        # — so a renamed column keeps its id and only the emitted
        # logical name changes, which is Iceberg's rename semantics)
        fields = []
        for f in m["schema"]["fields"]:
            if f["name"] in parsed_tr:
                # a declared transform column is file layout, not data:
                # it must be partitioned-by (else it would be a real
                # data column this export silently hides) and never
                # renamed (its name is the spec field name)
                if f["name"] not in (m.get("partition_by") or []):
                    raise ValueError(
                        f"transform column {f['name']!r} is not a "
                        "partition column in version "
                        f"{v}; refusing to drop a data column"
                    )
                if f["name"] in mapping:
                    raise NotImplementedError(
                        f"transform column {f['name']!r} was renamed; "
                        "unsupported"
                    )
                continue
            phys = mapping.get(f["name"], f["name"])
            if phys not in field_ids:
                field_ids[phys] = len(field_ids) + 1
            fid = field_ids[phys]
            aliases = name_aliases.setdefault(fid, [phys])
            if f["name"] not in aliases:
                aliases.append(f["name"])

            def _alloc(path: str) -> int:
                # nested element ids: same first-appearance stability
                # as top-level physical names, keyed by dotted path
                if path not in field_ids:
                    field_ids[path] = len(field_ids) + 1
                return field_ids[path]

            if isinstance(f["type"], str) and f["type"] in _WIDENED_TYPES:
                widened_cols[f["name"]] = f["type"]
            fields.append(
                {
                    "id": fid,
                    "name": f["name"],
                    "required": not f.get("nullable", True),
                    "type": _iceberg_type(f["type"], phys, _alloc),
                }
            )
        schema = {"type": "struct", "fields": fields}
        for i, s in enumerate(schemas):
            if s["fields"] == fields:
                schema_id = i
                break
        else:
            schema_id = len(schemas)
            schemas.append({**schema, "schema-id": schema_id})

        # ---- partition spec (identity + declared transforms)
        partition_by = list(m.get("partition_by", []))
        type_of = {f["name"]: f["type"] for f in fields}
        #: derived col -> (tname, tparam, source iceberg type, result)
        tr_field: dict[str, tuple] = {}
        spec_fields = []
        for i, c in enumerate(partition_by):
            if c in parsed_tr:
                tname, tparam, src = parsed_tr[c]
                if src not in type_of:
                    raise ValueError(
                        f"transform source column {src!r} not in the "
                        f"version-{v} schema"
                    )
                styp = type_of[src]
                rtyp = _tr.result_type(tname, styp)
                _transform_avro_type(rtyp)  # refusal check
                tr_field[c] = (tname, tparam, src, styp, rtyp)
                spec_fields.append(
                    {
                        "name": c,
                        "transform": f"{tname}[{tparam}]"
                        if tparam is not None
                        else tname,
                        "source-id": field_ids[mapping.get(src, src)],
                        "field-id": 1000 + i,
                    }
                )
            else:
                _partition_avro_type(type_of[c])  # refusal check
                spec_fields.append(
                    {
                        "name": c,
                        "transform": "identity",
                        "source-id": field_ids[c],
                        "field-id": 1000 + i,
                    }
                )
        for i, s in enumerate(specs):
            if s["fields"] == spec_fields:
                spec_id = i
                break
        else:
            spec_id = len(specs)
            specs.append({"spec-id": spec_id, "fields": spec_fields})

        # ---- manifest entries (full rewrite per commit)
        files = list(m["files"])
        added = sorted(set(files) - prev_files)
        existing = sorted(set(files) & prev_files)
        deleted = sorted(prev_files - set(files))
        for rel in added:
            add_seq[rel] = seq
            add_snap[rel] = snap_id
        #: the typed result each partition struct field carries
        part_result_type = {
            pf["name"]: tr_field[pf["name"]][4]
            if pf["name"] in tr_field
            else type_of[pf["name"]]
            for pf in spec_fields
        }
        part_avro_fields = [
            {
                "name": pf["name"],
                "type": [
                    "null",
                    _transform_avro_type(part_result_type[pf["name"]])
                    if pf["name"] in tr_field
                    else _partition_avro_type(type_of[pf["name"]]),
                ],
                "default": None,
                "field-id": pf["field-id"],
            }
            for pf in spec_fields
        ]
        entry_schema = _manifest_entry_schema(part_avro_fields)

        data_fields = [
            f for f in m["schema"]["fields"] if f["name"] not in parsed_tr
        ]
        phys_of_log = {f["name"]: mapping.get(f["name"], f["name"]) for f in data_fields}
        id_by_phys = {phys_of_log[f["name"]]: field_ids[phys_of_log[f["name"]]] for f in data_fields}
        itype_by_phys = {
            phys_of_log[f["name"]]: _iceberg_field_type(f["type"])
            for f in data_fields
            if isinstance(f["type"], str)  # bounds: scalar columns only
        }

        def entry(rel: str, status: int) -> dict:
            pv = _partition_values(rel, partition_by)
            abspath = os.path.join(table.data_dir, rel)
            # verify declared transforms against the file's SOURCE
            # column footer stats (order-preserving transforms only;
            # bucket gets a range check — hash correctness is pinned
            # by the independent-validator tests)
            src_minmax = (m.get("file_stats", {}).get(rel) or {}).get(
                "minmax", {}
            )
            for c, (tname, tparam, src, styp, rtyp) in tr_field.items():
                val = _typed_partition_value(pv[c], rtyp)
                if val is None:
                    continue
                if tname == "bucket":
                    if not 0 <= val < tparam:
                        raise ValueError(
                            f"{rel}: partition value {val} outside "
                            f"bucket[{tparam}] range"
                        )
                    continue
                stats = src_minmax.get(phys_of_log.get(src, src))
                if not stats:
                    continue  # no stats: claim unverifiable, not wrong
                lo_t = _tr.apply_transform(tname, tparam, stats[0], styp)
                hi_t = _tr.apply_transform(tname, tparam, stats[1], styp)
                if not (lo_t == hi_t == val):
                    raise ValueError(
                        f"{rel}: claims {tname} of {src!r} = {val} but "
                        f"source bounds map to [{lo_t}, {hi_t}] — the "
                        "table is not partitioned by that transform"
                    )
            # per-column bounds from the LakeTable manifest's footer
            # stats (free — already collected for data skipping);
            # minmax keys are PHYSICAL column names
            lowers: list[dict] = []
            uppers: list[dict] = []
            minmax = (m.get("file_stats", {}).get(rel) or {}).get(
                "minmax", {}
            )
            for col, (lo, hi) in sorted(minmax.items()):
                if col not in id_by_phys or col not in itype_by_phys:
                    continue
                lo_b = serialize_bound(lo, itype_by_phys[col])
                hi_b = serialize_bound(hi, itype_by_phys[col])
                if lo_b is not None and hi_b is not None:
                    fid = id_by_phys[col]
                    lowers.append({"key": fid, "value": lo_b})
                    uppers.append({"key": fid, "value": hi_b})
            return {
                "status": status,
                "snapshot_id": snap_id if status != 0 else add_snap[rel],
                "sequence_number": add_seq[rel],
                "file_sequence_number": add_seq[rel],
                "data_file": {
                    "content": 0,
                    "file_path": abspath,
                    "file_format": "PARQUET",
                    "partition": {
                        c: _typed_partition_value(
                            pv[c], part_result_type[c]
                        )
                        for c in partition_by
                    },
                    "record_count": _file_rows(table, m, rel),
                    "file_size_in_bytes": os.path.getsize(abspath),
                    "lower_bounds": lowers or None,
                    "upper_bounds": uppers or None,
                },
            }

        entries = (
            [entry(r, 1) for r in added]
            + [entry(r, 0) for r in existing]
            + [entry(r, 2) for r in deleted]
        )
        manifest_path = os.path.join(meta_dir, f"{snap_id}-m0.avro")
        avro.write_container(
            manifest_path,
            entry_schema,
            entries,
            metadata={
                "schema": json.dumps(
                    {**schema, "schema-id": schema_id}, separators=(",", ":")
                ),
                "schema-id": str(schema_id),
                "partition-spec": json.dumps(
                    spec_fields, separators=(",", ":")
                ),
                "partition-spec-id": str(spec_id),
                "format-version": "2",
                "content": "data",
            },
        )

        # ---- position deletes (one delete manifest per snapshot
        # carrying DVs; unpartitioned spec — see module docstring)
        dv_dirs = list(m.get("dv_dirs") or [])
        dv_added = sorted(set(dv_dirs) - prev_dv)
        dv_existing = sorted(set(dv_dirs) & prev_dv)
        dv_removed = sorted(prev_dv - set(dv_dirs))
        delete_manifest_row = None
        if dv_dirs or dv_removed:
            for d in dv_added:
                dv_seq[d] = seq
                dv_snap[d] = snap_id
                dv_path[d] = os.path.join(
                    meta_dir, f"delete-{d.replace('/', '_')}.parquet"
                )
                dv_rows[d] = _write_position_deletes(table, d, dv_path[d])
            # an unpartitioned spec must exist for global deletes
            for i, s in enumerate(specs):
                if s["fields"] == []:
                    unpart_spec_id = i
                    break
            else:
                unpart_spec_id = len(specs)
                specs.append({"spec-id": unpart_spec_id, "fields": []})

            def dv_entry(d: str, status: int) -> dict:
                return {
                    "status": status,
                    "snapshot_id": dv_snap[d],
                    "sequence_number": dv_seq[d],
                    "file_sequence_number": dv_seq[d],
                    "data_file": {
                        "content": 1,  # POSITION_DELETES
                        "file_path": dv_path[d],
                        "file_format": "PARQUET",
                        "partition": {},
                        "record_count": dv_rows[d],
                        "file_size_in_bytes": os.path.getsize(dv_path[d]),
                        "lower_bounds": None,
                        "upper_bounds": None,
                    },
                }

            dv_entries = (
                [dv_entry(d, 1) for d in dv_added]
                + [dv_entry(d, 0) for d in dv_existing]
                + [dv_entry(d, 2) for d in dv_removed]
            )
            delete_manifest_path = os.path.join(
                meta_dir, f"{snap_id}-m1.avro"
            )
            avro.write_container(
                delete_manifest_path,
                _manifest_entry_schema([]),
                dv_entries,
                metadata={
                    "schema": json.dumps(
                        {**schema, "schema-id": schema_id},
                        separators=(",", ":"),
                    ),
                    "schema-id": str(schema_id),
                    "partition-spec": "[]",
                    "partition-spec-id": str(unpart_spec_id),
                    "format-version": "2",
                    "content": "deletes",
                },
            )
            delete_manifest_row = {
                "manifest_path": delete_manifest_path,
                "manifest_length": os.path.getsize(delete_manifest_path),
                "partition_spec_id": unpart_spec_id,
                "content": 1,
                "sequence_number": seq,
                "min_sequence_number": min(
                    (dv_seq[d] for d in dv_dirs), default=seq
                ),
                "added_snapshot_id": snap_id,
                "added_files_count": len(dv_added),
                "existing_files_count": len(dv_existing),
                "deleted_files_count": len(dv_removed),
                "added_rows_count": sum(dv_rows[d] for d in dv_added),
                "existing_rows_count": sum(dv_rows[d] for d in dv_existing),
                "deleted_rows_count": sum(dv_rows[d] for d in dv_removed),
                "partitions": None,
            }

        # ---- manifest list (data manifest + optional delete manifest)
        rows_of = {
            e["data_file"]["file_path"]: e["data_file"]["record_count"]
            for e in entries
        }
        list_path = os.path.join(meta_dir, f"snap-{snap_id}.avro")
        manifest_rows = [
            {
                "manifest_path": manifest_path,
                "manifest_length": os.path.getsize(manifest_path),
                "partition_spec_id": spec_id,
                "content": 0,
                "sequence_number": seq,
                "min_sequence_number": min(
                    (add_seq[r] for r in files), default=seq
                ),
                "added_snapshot_id": snap_id,
                "added_files_count": len(added),
                "existing_files_count": len(existing),
                "deleted_files_count": len(deleted),
                "added_rows_count": sum(
                    _file_rows(table, m, r) for r in added
                ),
                "existing_rows_count": sum(
                    _file_rows(table, m, r) for r in existing
                ),
                "deleted_rows_count": sum(
                    rows_of[os.path.join(table.data_dir, r)]
                    for r in deleted
                ),
                "partitions": None,
            }
        ]
        if delete_manifest_row is not None:
            manifest_rows.append(delete_manifest_row)
        avro.write_container(
            list_path,
            _MANIFEST_FILE_SCHEMA,
            manifest_rows,
            metadata={"format-version": "2"},
        )

        # ---- snapshot + metadata.json for this version
        snapshot = {
            "snapshot-id": snap_id,
            "sequence-number": seq,
            "timestamp-ms": ts_ms,
            "manifest-list": list_path,
            "summary": {
                "operation": "delete"
                if dv_added
                else ("append" if not deleted else "overwrite")
            },
            "schema-id": schema_id,
        }
        if snapshots:
            snapshot["parent-snapshot-id"] = snapshots[-1]["snapshot-id"]
        snapshots.append(snapshot)
        snapshot_log.append({"snapshot-id": snap_id, "timestamp-ms": ts_ms})
        meta_file = os.path.join(meta_dir, f"v{v + 1}.metadata.json")
        doc = {
            "format-version": 2,
            "table-uuid": _table_uuid(table.path),
            "location": os.path.abspath(table.path),
            "last-sequence-number": seq,
            "last-updated-ms": ts_ms,
            "last-column-id": len(field_ids),
            "current-schema-id": schema_id,
            "schemas": schemas,
            "default-spec-id": spec_id,
            "partition-specs": specs,
            "last-partition-id": max(
                (pf["field-id"] for s in specs for pf in s["fields"]),
                default=999,
            ),
            "default-sort-order-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            # the spec's mechanism for data files written WITHOUT
            # field-id metadata: resolve parquet columns (physical
            # names) to field ids through this mapping — what makes
            # renamed columns externally readable
            "properties": {
                "schema.name-mapping.default": json.dumps(
                    [
                        {"field-id": fid, "names": names}
                        for fid, names in sorted(name_aliases.items())
                    ],
                    separators=(",", ":"),
                ),
                **(
                    {
                        "graft.source-widened-types": json.dumps(
                            dict(sorted(widened_cols.items())),
                            separators=(",", ":"),
                        )
                    }
                    if widened_cols
                    else {}
                ),
            },
            "current-snapshot-id": snap_id,
            "snapshots": snapshots,
            "snapshot-log": snapshot_log,
            "metadata-log": metadata_log,
        }
        with open(meta_file, "w") as fh:
            json.dump(doc, fh, separators=(",", ":"))
        metadata_log = metadata_log + [
            {"metadata-file": meta_file, "timestamp-ms": ts_ms}
        ]
        prev_files = set(files)
        prev_dv = set(dv_dirs)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write(str(versions[-1] + 1))
    return meta_dir


def _load_metadata(table_path: str) -> dict:
    meta_dir = os.path.join(table_path, _META_DIR)
    hint = os.path.join(meta_dir, "version-hint.text")
    with open(hint) as fh:
        n = int(fh.read().strip())
    with open(os.path.join(meta_dir, f"v{n}.metadata.json")) as fh:
        return json.load(fh)


def _spark_type(iceberg_type) -> str | dict:
    """Inverse of :func:`_iceberg_type` for the snapshot reader:
    primitive strings map back through the table, nested
    struct/list/map dicts convert to Spark schema-json recursively
    (field ids are not needed on the Spark side — resolution is by
    name, the name-mapping path)."""
    if isinstance(iceberg_type, dict):
        t = iceberg_type.get("type")
        if t == "struct":
            return {
                "type": "struct",
                "fields": [
                    {
                        "name": f["name"],
                        "type": _spark_type(f["type"]),
                        "nullable": not f["required"],
                        "metadata": {},
                    }
                    for f in iceberg_type["fields"]
                ],
            }
        if t == "list":
            return {
                "type": "array",
                "elementType": _spark_type(iceberg_type["element"]),
                "containsNull": not iceberg_type.get(
                    "element-required", False
                ),
            }
        if t == "map":
            return {
                "type": "map",
                "keyType": _spark_type(iceberg_type["key"]),
                "valueType": _spark_type(iceberg_type["value"]),
                "valueContainsNull": not iceberg_type.get(
                    "value-required", False
                ),
            }
        raise NotImplementedError(f"iceberg nested type {t!r} unsupported")
    if iceberg_type in _SPARK_TYPES:
        return _SPARK_TYPES[iceberg_type]
    if iceberg_type.startswith("decimal("):
        return "decimal(" + iceberg_type[8:].rstrip(")") + ")"
    raise NotImplementedError(f"iceberg type {iceberg_type!r} unsupported")


def _bounds_disjoint(df_rec: dict, prune: dict, schema_doc: dict) -> bool:
    """True when the data file's exported bounds PROVE it holds no row
    inside every requested range — the spec's inclusive-bounds file
    elimination.  Missing bounds or non-numeric types never prune."""
    id_type = {f["name"]: (f["id"], f["type"]) for f in schema_doc["fields"]}
    lowers = {r["key"]: r["value"] for r in (df_rec.get("lower_bounds") or [])}
    uppers = {r["key"]: r["value"] for r in (df_rec.get("upper_bounds") or [])}
    for col, (lo, hi) in prune.items():
        if col not in id_type:
            continue
        fid, ityp = id_type[col]
        if fid not in lowers or fid not in uppers:
            continue
        fmin = deserialize_bound(bytes(lowers[fid]), ityp)
        fmax = deserialize_bound(bytes(uppers[fid]), ityp)
        if fmin is None or fmax is None:
            continue
        if fmax < lo or fmin > hi:
            return True
    return False


def _partition_disjoint(
    spec: dict, partition: dict, prune: dict, schema_doc: dict
) -> bool:
    """Transform-aware partition pruning (the spec's scan planning):
    a file is skipped when its partition value PROVES no row can fall
    in the requested source-column range — order-preserving transforms
    (identity/truncate/year/month/day/hour) map the range endpoints
    through the transform; bucket prunes only point lookups
    (``lo == hi``), the one query shape a hash partition can serve.
    Null partition values and unmapped sources never prune."""
    from . import iceberg_transforms as _tr

    name_of_id = {f["id"]: f["name"] for f in schema_doc["fields"]}
    type_of = {f["name"]: f["type"] for f in schema_doc["fields"]}
    for pf in spec["fields"]:
        src = name_of_id.get(pf["source-id"])
        if src is None or src not in prune:
            continue
        val = partition.get(pf["name"])
        if val is None:
            continue
        try:
            tname, tparam = _tr.parse_transform(pf["transform"])
        except NotImplementedError:
            continue  # unknown transform in foreign metadata: no prune
        lo, hi = prune[src]
        styp = type_of[src]
        try:
            if tname == "bucket":
                if lo == hi and val != _tr.apply_transform(
                    "bucket", tparam, lo, styp
                ):
                    return True
                continue
            if not _tr.is_monotonic(tname):
                continue
            lo_t = _tr.apply_transform(tname, tparam, lo, styp)
            hi_t = _tr.apply_transform(tname, tparam, hi, styp)
        except (TypeError, ValueError, NotImplementedError):
            continue  # unmappable range: conservatively keep the file
        if val < lo_t or val > hi_t:
            return True
    return False


def read_iceberg_snapshot(
    spark: SparkSession,
    table_path: str,
    snapshot_id: int | None = None,
    prune: dict[str, tuple] | None = None,
) -> DataFrame:
    """Materialize an exported Iceberg snapshot EXACTLY as an external
    Iceberg reader would: version-hint → metadata.json → the
    snapshot's manifest LIST (Avro) → its manifests (Avro) → the
    active data files (status ADDED/EXISTING; DELETED entries exist
    for changelog consumers and are excluded from scans), with
    partition columns re-injected from the typed partition struct
    under the snapshot's schema.

    ``prune`` is the bounds-based scan-planning hint real Iceberg
    readers derive from the query filter: ``{column: (lo, hi)}``
    inclusive ranges; a data file whose exported lower/upper bounds
    prove it DISJOINT from any range is skipped before the parquet
    scan — the caller is expected to apply the same predicate to the
    returned relation (pruning is an I/O optimization, never a
    filter).  Only numeric bounds prune (string bounds may be
    writer-truncated); a file with no bounds for a column is never
    skipped."""
    meta = _load_metadata(table_path)
    if meta.get("format-version") != 2:
        raise ValueError("expected format-version 2 metadata")
    snap_id = (
        meta["current-snapshot-id"] if snapshot_id is None else snapshot_id
    )
    snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}
    if snap_id not in snaps:
        raise ValueError(f"snapshot {snap_id} not in metadata")
    snap = snaps[snap_id]
    schema_doc = next(
        s for s in meta["schemas"] if s["schema-id"] == snap["schema-id"]
    )
    spec_of = {s["spec-id"]: s for s in meta["partition-specs"]}
    struct = StructType.fromJson(
        {
            "type": "struct",
            "fields": [
                {
                    "name": f["name"],
                    "type": _spark_type(f["type"]),
                    "nullable": not f["required"],
                    "metadata": {},
                }
                for f in schema_doc["fields"]
            ],
        }
    )
    _, manifest_files = avro.read_container(snap["manifest-list"])
    files: dict[str, tuple] = {}  # path -> (partition cols, values)
    file_seq: dict[str, int] = {}  # path -> data sequence number
    deletes: list[tuple[str, int]] = []  # (delete path, sequence number)
    for mf in manifest_files:
        spec = spec_of[mf["partition_spec_id"]]
        part_cols = [pf["name"] for pf in spec["fields"]]
        _, entries = avro.read_container(mf["manifest_path"])
        for e in entries:
            if e["status"] == 2:  # DELETED: not part of the scan
                continue
            df_rec = e["data_file"]
            if df_rec["file_format"] != "PARQUET":
                raise NotImplementedError(
                    f"file format {df_rec['file_format']} unsupported"
                )
            if mf["content"] == 1 or df_rec["content"] == 1:
                deletes.append(
                    (df_rec["file_path"], int(e["sequence_number"]))
                )
                continue
            if prune and (
                _bounds_disjoint(df_rec, prune, schema_doc)
                or _partition_disjoint(
                    spec, df_rec["partition"], prune, schema_doc
                )
            ):
                continue
            files[df_rec["file_path"]] = (
                spec["fields"],
                tuple(df_rec["partition"].get(c) for c in part_cols),
            )
            file_seq[df_rec["file_path"]] = int(e["sequence_number"])
    types = {f.name: f.dataType for f in struct.fields}
    groups: dict[tuple, list[str]] = {}
    spec_fields_any: list[dict] = []
    for path, (sfields, key) in files.items():
        spec_fields_any = sfields
        groups.setdefault(key, []).append(path)
    part_cols_any = [pf["name"] for pf in spec_fields_any]
    # only IDENTITY partition values are row data; a transform value
    # (bucket/day/...) lives in metadata and file layout only
    identity_cols = {
        pf["name"]
        for pf in spec_fields_any
        if pf.get("transform", "identity") == "identity"
    }
    # name mapping: the data files carry PHYSICAL column names and no
    # field-id metadata, so scan under the mapped physical name for
    # each field id and alias back to the snapshot's logical name —
    # the spec's schema.name-mapping.default resolution
    nm = {}
    try:
        for row in json.loads(
            meta.get("properties", {}).get("schema.name-mapping.default", "[]")
        ):
            nm[row["field-id"]] = row["names"][0]
    except (ValueError, KeyError, IndexError, TypeError):
        nm = {}
    id_of = {f["name"]: f["id"] for f in schema_doc["fields"]}
    phys_of = {
        f.name: nm.get(id_of[f.name], f.name) for f in struct.fields
    }
    data_schema = StructType(
        [
            StructField(phys_of[f.name], f.dataType, f.nullable)
            for f in struct.fields
            if f.name not in part_cols_any
        ]
    )
    out: DataFrame | None = None
    keep = [f.name for f in struct.fields]
    for key, paths in sorted(groups.items(), key=lambda kv: str(kv[0])):
        df = spark.read.schema(data_schema).parquet(*sorted(paths))
        for log in keep:
            if log not in part_cols_any and phys_of[log] != log:
                df = df.withColumnRenamed(phys_of[log], log)
        if deletes:
            # spec "Scan Planning": a position delete applies to data
            # files with data sequence number <= the delete file's.
            # Pointer paths are manifest-form; _metadata.file_path is a
            # file: URI — normalize at the scan.
            df = df.select(
                "*",
                F.regexp_replace(
                    F.col("_metadata.file_path"), "^file:/+", "/"
                ).alias("__fp"),
                F.col("_metadata.row_index").alias("__ri"),
            )
        for c, val in zip(part_cols_any, key):
            if c not in identity_cols:
                continue
            df = df.withColumn(
                c,
                (F.lit(None) if val is None else F.lit(val)).cast(types[c]),
            )
        df = df.select(keep + (["__fp", "__ri"] if deletes else []))
        out = df if out is None else out.unionByName(df)
    if out is None:
        return spark.createDataFrame([], struct)
    if deletes:
        del_df: DataFrame | None = None
        for dpath, dseq in deletes:
            part = spark.read.schema("file_path STRING, pos BIGINT").parquet(
                dpath
            ).select(
                F.col("file_path").alias("__fp"),
                F.col("pos").alias("__ri"),
                F.lit(dseq).cast("bigint").alias("__dseq"),
            )
            del_df = part if del_df is None else del_df.unionByName(part)
        seq_items = [(p, s) for p, s in file_seq.items()]
        seq_df = spark.createDataFrame(
            seq_items, "__fp STRING, __dataseq BIGINT"
        )
        # both side relations are metadata-sized: broadcast, the fact
        # scan never shuffles (same doctrine as LakeTable._apply_dv)
        joined = out.join(F.broadcast(seq_df), "__fp", "left")
        cond = (
            (joined["__fp"] == del_df["__fp"])
            & (joined["__ri"] == del_df["__ri"])
            & (joined["__dataseq"] <= del_df["__dseq"])
        )
        out = joined.join(
            F.broadcast(del_df), on=cond, how="left_anti"
        ).select(keep)
    return out
