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
  ``schemas`` (field ids assigned by FIRST APPEARANCE of a column
  name, stable across versions), ``partition-specs`` (identity
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

Refuse-loudly rules (never a wrong answer), same doctrine as
delta_log:

* active deletion vectors — v2 would need position-delete FILES
  (parquet) to express them; exporting adds without deletes would
  resurrect deleted rows.  Vacuum/rewrite first.
* column mapping / dropped columns — this exporter assigns field ids
  by name, so a rename would mint a NEW id and silently sever the
  column's history (Iceberg expresses renames by keeping the id);
* column types with no exact Iceberg primitive (tinyint/smallint
  would silently widen; nested struct/array/map need element-level
  field ids this minimal writer does not assign);
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
from pyspark.sql.types import StructType

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
        if spark_type.startswith("decimal("):
            return "decimal(" + spark_type[8:].rstrip(")") + ")"
    raise NotImplementedError(
        f"column type {spark_type!r} has no exact Iceberg v2 mapping in "
        "this minimal writer (tinyint/smallint would silently widen; "
        "nested types need element-level field ids)"
    )


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


def export_iceberg_metadata(table: LakeTable) -> str:
    """Mirror every LakeTable version into ``<table>/metadata/`` as
    Iceberg spec-v2 metadata; returns the metadata directory.

    Idempotent the same way ``export_delta_log`` is: re-export rewrites
    the whole metadata tree from the (immutable) LakeTable manifests.
    Data files are NOT copied — manifests reference the existing
    ``data/...`` parquet tree by absolute path, exactly how Iceberg
    references files that external compactors wrote elsewhere.
    """
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
    versions = table._versions()
    for v in versions:
        m = table._manifest(v)
        if m.get("dv_dirs"):
            raise NotImplementedError(
                "version carries active deletion vectors — expressing "
                "them in Iceberg v2 needs position-delete files this "
                "minimal writer does not emit (a plain add/exists scan "
                "would resurrect deleted rows); vacuum/rewrite first"
            )
        mapping = m.get("column_mapping") or {}
        if m.get("dropped_physical") or any(
            phys != log for log, phys in mapping.items()
        ):
            raise NotImplementedError(
                "version uses column mapping / dropped columns — this "
                "writer assigns Iceberg field ids by column NAME, so a "
                "rename would mint a new id and sever the column's "
                "history; a faithful export needs id-preserving mapping "
                "metadata it does not emit"
            )
        seq = v + 1
        snap_id = _snapshot_id(table.path, v)
        ts_ms = int(float(m.get("committed_at", 0)) * 1000)

        # ---- schema (ids by first appearance, stable across versions)
        fields = []
        for f in m["schema"]["fields"]:
            if f["name"] not in field_ids:
                field_ids[f["name"]] = len(field_ids) + 1
            fields.append(
                {
                    "id": field_ids[f["name"]],
                    "name": f["name"],
                    "required": not f.get("nullable", True),
                    "type": _iceberg_field_type(f["type"]),
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

        # ---- partition spec (identity transforms)
        partition_by = list(m.get("partition_by", []))
        type_of = {f["name"]: f["type"] for f in fields}
        spec_fields = [
            {
                "name": c,
                "transform": "identity",
                "source-id": field_ids[c],
                "field-id": 1000 + i,
            }
            for i, c in enumerate(partition_by)
        ]
        for c in partition_by:
            _partition_avro_type(type_of[c])  # refusal check
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
        part_avro_fields = [
            {
                "name": pf["name"],
                "type": ["null", _partition_avro_type(type_of[pf["name"]])],
                "default": None,
                "field-id": pf["field-id"],
            }
            for pf in spec_fields
        ]
        entry_schema = _manifest_entry_schema(part_avro_fields)

        def entry(rel: str, status: int) -> dict:
            pv = _partition_values(rel, partition_by)
            abspath = os.path.join(table.data_dir, rel)
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
                        c: _typed_partition_value(pv[c], type_of[c])
                        for c in partition_by
                    },
                    "record_count": _file_rows(table, m, rel),
                    "file_size_in_bytes": os.path.getsize(abspath),
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

        # ---- manifest list (one manifest per snapshot)
        rows_of = {
            e["data_file"]["file_path"]: e["data_file"]["record_count"]
            for e in entries
        }
        list_path = os.path.join(meta_dir, f"snap-{snap_id}.avro")
        avro.write_container(
            list_path,
            _MANIFEST_FILE_SCHEMA,
            [
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
            ],
            metadata={"format-version": "2"},
        )

        # ---- snapshot + metadata.json for this version
        snapshot = {
            "snapshot-id": snap_id,
            "sequence-number": seq,
            "timestamp-ms": ts_ms,
            "manifest-list": list_path,
            "summary": {
                "operation": "append"
                if not deleted
                else "overwrite"
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
            "properties": {},
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


def _spark_type(iceberg_type: str) -> str:
    if iceberg_type in _SPARK_TYPES:
        return _SPARK_TYPES[iceberg_type]
    if iceberg_type.startswith("decimal("):
        return "decimal(" + iceberg_type[8:].rstrip(")") + ")"
    raise NotImplementedError(f"iceberg type {iceberg_type!r} unsupported")


def read_iceberg_snapshot(
    spark: SparkSession, table_path: str, snapshot_id: int | None = None
) -> DataFrame:
    """Materialize an exported Iceberg snapshot EXACTLY as an external
    Iceberg reader would: version-hint → metadata.json → the
    snapshot's manifest LIST (Avro) → its manifests (Avro) → the
    active data files (status ADDED/EXISTING; DELETED entries exist
    for changelog consumers and are excluded from scans), with
    partition columns re-injected from the typed partition struct
    under the snapshot's schema."""
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
            files[df_rec["file_path"]] = (
                part_cols,
                tuple(df_rec["partition"].get(c) for c in part_cols),
            )
    types = {f.name: f.dataType for f in struct.fields}
    groups: dict[tuple, list[str]] = {}
    part_cols_any: list[str] = []
    for path, (part_cols, key) in files.items():
        part_cols_any = part_cols
        groups.setdefault(key, []).append(path)
    data_schema = StructType(
        [f for f in struct.fields if f.name not in part_cols_any]
    )
    out: DataFrame | None = None
    for key, paths in sorted(groups.items(), key=lambda kv: str(kv[0])):
        df = spark.read.schema(data_schema).parquet(*sorted(paths))
        for c, val in zip(part_cols_any, key):
            df = df.withColumn(
                c,
                (F.lit(None) if val is None else F.lit(val)).cast(types[c]),
            )
        df = df.select([f.name for f in struct.fields])
        out = df if out is None else out.unionByName(df)
    if out is None:
        return spark.createDataFrame([], struct)
    return out
