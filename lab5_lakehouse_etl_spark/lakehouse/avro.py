"""Minimal pure-stdlib Avro Object Container File writer/reader — the
serialization substrate of Iceberg's manifest lists and manifest
files (Iceberg table spec: "Manifests are Avro files"; an Iceberg
export with JSON manifests would not be Iceberg).

This container has no ``avro``/``fastavro`` package (install probes
recorded in README), so the interchange module
(``lakehouse/iceberg_meta.py``) vendors the format the same way
``lakehouse/delta_log.py`` vendors the Delta commit-JSON protocol.
Scope is the subset Iceberg metadata actually uses, implemented
straight from the Avro 1.11 spec:

* binary encoding: null / boolean / int / long (zigzag varints),
  float / double (IEEE little-endian), bytes / string
  (length-prefixed), fixed, record (fields in order), array and map
  (block-count runs terminated by 0), union (branch index + value);
* the 1-file container format: ``Obj\\x01`` magic, file-metadata map
  (``avro.schema``, ``avro.codec`` plus Iceberg's custom keys), a
  16-byte sync marker, and sync-delimited data blocks (codec
  ``null``/``deflate`` on read; writes are ``null`` — manifest files
  are small and deterministic bytes beat compressed bytes for golden
  tests).

Schemas are plain parsed-JSON values (dict / list / str), matching
what ``avro.schema`` stores; no schema-resolution/evolution is
implemented (readers here always read with the writer schema embedded
in the file, which is exactly how Iceberg manifests are read).

Scale: manifest files are METADATA — kilobytes per commit, written
once driver-side (the same cost class as Delta's JSON commits or
Iceberg's own Java writer).  Data files stay parquet and are read
distributed; nothing here touches the row path.
"""

from __future__ import annotations

import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_long(out: bytearray, n: int) -> None:
    n = _zigzag(n)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _write_bytes(out: bytearray, b: bytes) -> None:
    _write_long(out, len(b))
    out += b


def _branch_name(schema) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, dict):
        return schema["type"]
    raise ValueError(f"cannot name schema {schema!r}")


def encode(out: bytearray, schema, value) -> None:
    """Binary-encode ``value`` per ``schema`` (parsed-JSON form)."""
    if isinstance(schema, list):  # union: branch index, then value
        for i, branch in enumerate(schema):
            if value is None and _branch_name(branch) == "null":
                _write_long(out, i)
                return
            if value is not None and _branch_name(branch) != "null":
                _write_long(out, i)
                encode(out, branch, value)
                return
        raise ValueError(f"value {value!r} matches no union branch {schema}")
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                if f["name"] not in value and "default" not in f:
                    raise ValueError(
                        f"record {schema.get('name')} missing field "
                        f"{f['name']} with no default"
                    )
                encode(out, f["type"], value.get(f["name"], f.get("default")))
            return
        if t == "array":
            if value:
                _write_long(out, len(value))
                for item in value:
                    encode(out, schema["items"], item)
            _write_long(out, 0)
            return
        if t == "map":
            if value:
                _write_long(out, len(value))
                for k, v in value.items():
                    _write_bytes(out, k.encode("utf-8"))
                    encode(out, schema["values"], v)
            _write_long(out, 0)
            return
        if t == "fixed":
            if len(value) != schema["size"]:
                raise ValueError(
                    f"fixed {schema.get('name')} wants {schema['size']} "
                    f"bytes, got {len(value)}"
                )
            out += bytes(value)
            return
        return encode(out, t, value)  # {"type": "long"} primitive form
    if schema == "null":
        if value is not None:
            raise ValueError(f"null schema got {value!r}")
        return
    if schema == "boolean":
        out.append(1 if value else 0)
        return
    if schema in ("int", "long"):
        _write_long(out, int(value))
        return
    if schema == "float":
        out += struct.pack("<f", float(value))
        return
    if schema == "double":
        out += struct.pack("<d", float(value))
        return
    if schema == "bytes":
        _write_bytes(out, bytes(value))
        return
    if schema == "string":
        _write_bytes(out, str(value).encode("utf-8"))
        return
    raise NotImplementedError(f"avro type {schema!r} unsupported")


class _Reader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    def long(self) -> int:
        shift = 0
        acc = 0
        while True:
            if self.pos >= len(self.data):
                raise ValueError("truncated avro varint")
            b = self.data[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                return _unzigzag(acc)
            shift += 7

    def raw(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise ValueError("truncated avro data")
        b = self.data[self.pos : self.pos + n]
        self.pos += n
        return b

    def bytes_(self) -> bytes:
        return self.raw(self.long())


def decode(r: _Reader, schema):
    """Binary-decode one value per ``schema`` from ``r``."""
    if isinstance(schema, list):
        idx = r.long()
        if not 0 <= idx < len(schema):
            raise ValueError(f"union branch {idx} out of range")
        branch = schema[idx]
        return None if _branch_name(branch) == "null" else decode(r, branch)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {f["name"]: decode(r, f["type"]) for f in schema["fields"]}
        if t == "array":
            out = []
            while True:
                n = r.long()
                if n == 0:
                    return out
                if n < 0:  # block with byte-size prefix
                    n = -n
                    r.long()
                for _ in range(n):
                    out.append(decode(r, schema["items"]))
        if t == "map":
            out = {}
            while True:
                n = r.long()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    r.long()
                for _ in range(n):
                    k = r.bytes_().decode("utf-8")
                    out[k] = decode(r, schema["values"])
        if t == "fixed":
            return r.raw(schema["size"])
        return decode(r, t)
    if schema == "null":
        return None
    if schema == "boolean":
        return r.raw(1) != b"\x00"
    if schema in ("int", "long"):
        return r.long()
    if schema == "float":
        return struct.unpack("<f", r.raw(4))[0]
    if schema == "double":
        return struct.unpack("<d", r.raw(8))[0]
    if schema == "bytes":
        return r.bytes_()
    if schema == "string":
        return r.bytes_().decode("utf-8")
    raise NotImplementedError(f"avro type {schema!r} unsupported")


def write_container(
    path: str,
    schema,
    records: list,
    metadata: dict[str, str] | None = None,
    sync: bytes | None = None,
) -> None:
    """Write one Avro Object Container File: header (magic + metadata
    map + sync marker) and a single uncompressed data block.  ``sync``
    defaults to a deterministic marker derived from the file name so
    re-exports are byte-stable for golden tests."""
    import hashlib

    if sync is None:
        sync = hashlib.md5(os.path.basename(path).encode()).digest()
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    meta = {"avro.schema": json.dumps(schema), "avro.codec": "null"}
    meta.update(metadata or {})
    out = bytearray(MAGIC)
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode("utf-8"))
        _write_bytes(out, v.encode("utf-8"))
    _write_long(out, 0)
    out += sync
    if records:
        block = bytearray()
        for rec in records:
            encode(block, schema, rec)
        _write_long(out, len(records))
        _write_long(out, len(block))
        out += block
        out += sync
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(bytes(out))
    os.replace(tmp, path)


def decode_container(data: bytes, name: str = "<bytes>") -> tuple[dict[str, str], list]:
    """Decode one Avro OCF from memory — the distributed-read
    primitive (``sources.readers.read_avro`` maps it over
    ``binaryFile`` contents executor-side); :func:`read_container`
    is the path-taking wrapper."""
    if data[:4] != MAGIC:
        raise ValueError(f"{name}: not an Avro object container file")
    r = _Reader(data, 4)
    meta_schema = {"type": "map", "values": "bytes"}
    raw_meta = decode(r, meta_schema)
    meta = {k: v.decode("utf-8", "replace") for k, v in raw_meta.items()}
    sync = r.raw(16)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", "null")
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r} unsupported")
    records = []
    while r.pos < len(data):
        n = r.long()
        size = r.long()
        block = r.raw(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        br = _Reader(block)
        for _ in range(n):
            records.append(decode(br, schema))
        if br.pos != len(block):
            raise ValueError(f"{name}: trailing bytes in avro block")
        if r.raw(16) != sync:
            raise ValueError(f"{name}: avro block sync marker mismatch")
    return meta, records


def read_container(path: str) -> tuple[dict[str, str], list]:
    """Read an Avro OCF written by any conforming writer: returns
    ``(file_metadata, records)`` decoded with the embedded writer
    schema.  Codecs ``null`` and ``deflate`` are understood."""
    with open(path, "rb") as fh:
        data = fh.read()
    return decode_container(data, path)


def read_schema(path: str) -> tuple[dict[str, str], object]:
    """HEADER-ONLY read of an OCF: ``(file_metadata, parsed writer
    schema)`` from the first kilobytes — the driver-side schema probe
    a distributed reader needs without touching any data block."""
    with open(path, "rb") as fh:
        # header = magic + metadata map + 16-byte sync; metadata for a
        # record schema is well under 64 KiB — read incrementally only
        # if the first chunk proves short
        data = fh.read(1 << 16)
        while True:
            if data[:4] != MAGIC:
                raise ValueError(f"{path}: not an Avro object container file")
            try:
                r = _Reader(data, 4)
                raw_meta = decode(r, {"type": "map", "values": "bytes"})
                r.raw(16)  # sync must be present too
                break
            except ValueError:
                more = fh.read(1 << 20)
                if not more:
                    raise
                data += more
    meta = {k: v.decode("utf-8", "replace") for k, v in raw_meta.items()}
    return meta, json.loads(meta["avro.schema"])


def roundtrip_check(schema, records: list) -> None:
    """Encode + decode ``records`` in memory and require equality —
    a cheap self-check callers can run on freshly built manifests
    before writing (used by tests; exporters rely on the unit suite
    instead of paying it per commit)."""
    out = bytearray()
    for rec in records:
        encode(out, schema, rec)
    r = _Reader(bytes(out))
    for rec in records:
        got = decode(r, schema)
        want = (
            {f["name"]: rec.get(f["name"], f.get("default"))
             for f in schema["fields"]}
            if isinstance(schema, dict) and schema.get("type") == "record"
            else rec
        )
        if got != want:
            raise AssertionError(f"avro round-trip divergence on {rec!r}")
