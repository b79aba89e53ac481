"""WARC (ISO 28500) container source — the format web corpora actually
arrive in (Common Crawl, Internet Archive), and the missing FRONT of
the web-corpus chain whose middle (``functions/html.py`` extraction,
``functions/urls.py`` canonicalization) landed in r14.

Format recap (ISO 28500-1:2017 §4; the public spec, implemented from
scratch): a WARC file is a sequence of records, each

    WARC/1.0\\r\\n
    <header-name>: <value>\\r\\n ...
    \\r\\n
    <Content-Length bytes of content block>
    \\r\\n\\r\\n

and the conventional ``.warc.gz`` form gzip-compresses EACH RECORD as
its own member, members concatenated — the property that makes the
format splittable-by-member and lets one corrupt member quarantine
without poisoning its neighbours.  ``response`` records carry an
``application/http; msgtype=response`` content block: HTTP status
line + headers + \\r\\n\\r\\n + payload.

Everything here is pure stdlib (``gzip``/``zlib``/bytes) — the same
no-external-codec doctrine as ``lakehouse/avro.py`` and the
``functions/{png,jpeg,...}`` decoders.

Quarantine verdicts (the decode_or_quarantine doctrine — classify,
never mis-decode, never let one bad payload kill the task):

* ``ok``            — fully parsed record;
* ``truncated``     — the member's content block ends before the
                      declared Content-Length (header fields survive,
                      payload does not);
* ``bad_header``    — a member decompressed clean but its content is
                      not a WARC record (no ``WARC/`` magic or a
                      mandatory header missing/botched);
* ``corrupt_gzip``  — a member whose DEFLATE stream fails; the parser
                      resyncs by scanning for the next plausible gzip
                      member header and emits ONE row per corrupt
                      region (adjacent corrupt members merge — pinned
                      in tests, kept out of the closed-form fixture).

Stated scale boundary (the ``read_avro`` precedent,
``sources/readers.py``): the unit of parallelism is the FILE — the
normal shape of a crawl landing (one .warc.gz per fetcher task,
thousands of files).  Record-level splitting inside one giant file
would need a distributed member-boundary scan; refused here, stated
loudly, not half-built.

No counterpart in the reference repo (its sources are XLSX/CSV:
jobs/xlsx_to_csv.py).
"""

from __future__ import annotations

import gzip
import zlib

_GZ_MAGIC = b"\x1f\x8b\x08"
_CRLF2 = b"\r\n\r\n"

#: parsed-record dict keys, in output order
FIELDS = (
    "record_id",
    "warc_type",
    "target_uri",
    "warc_date",
    "content_type",
    "http_status",
    "http_content_type",
    "n_content_bytes",
    "payload",
    "verdict",
)


# ------------------------------------------------------------- writer

def build_record(
    record_id: str,
    warc_type: str,
    content: bytes,
    *,
    target_uri: str | None = None,
    warc_date: str = "2024-01-01T00:00:00Z",
    content_type: str = "application/http; msgtype=response",
    declared_length: int | None = None,
) -> bytes:
    """Serialize ONE uncompressed WARC record.  ``declared_length``
    lets fixture code declare a Content-Length differing from the
    actual block (the truncation plant); honest writers leave it
    None."""
    n = len(content) if declared_length is None else declared_length
    head = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Record-ID: " + record_id.encode(),
        b"WARC-Date: " + warc_date.encode(),
    ]
    if target_uri is not None:
        head.append(b"WARC-Target-URI: " + target_uri.encode())
    head.append(b"Content-Type: " + content_type.encode())
    head.append(b"Content-Length: " + str(n).encode())
    return b"\r\n".join(head) + _CRLF2 + content + _CRLF2


def build_http_response(
    body: bytes, status: int = 200, content_type: str = "text/html"
) -> bytes:
    """The ``application/http; msgtype=response`` content block."""
    reason = {200: "OK", 404: "Not Found"}.get(status, "X")
    return (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def gzip_member(record: bytes) -> bytes:
    """One record, one gzip member (mtime pinned for determinism)."""
    return gzip.compress(record, compresslevel=6, mtime=0)


def write_warc(path: str, members: list[bytes]) -> None:
    """Concatenate pre-built gzip members into one ``.warc.gz``."""
    with open(path, "wb") as fh:
        for m in members:
            fh.write(m)


# ------------------------------------------------------------- parser

def _parse_headers(block: bytes) -> dict[str, str] | None:
    lines = block.split(b"\r\n")
    if not lines or not lines[0].startswith(b"WARC/"):
        return None
    out: dict[str, str] = {}
    for ln in lines[1:]:
        if b":" not in ln:
            return None
        k, v = ln.split(b":", 1)
        out[k.strip().lower().decode("ascii", "replace")] = v.strip().decode(
            "utf-8", "replace"
        )
    return out


def _null_record(verdict: str) -> dict:
    rec = {k: None for k in FIELDS}
    rec["verdict"] = verdict
    return rec


def _parse_records(buf: bytes) -> list[dict]:
    """All records inside ONE decompressed region (a member usually
    holds one record, but whole-file-gzip writers exist and plain
    ``.warc`` is the same byte layout uncompressed)."""
    out: list[dict] = []
    at = 0
    n = len(buf)
    while at < n:
        while at < n and buf[at : at + 2] == b"\r\n":
            at += 2
        if at >= n:
            break
        head_end = buf.find(_CRLF2, at)
        if head_end < 0:
            out.append(_null_record("bad_header"))
            break
        headers = _parse_headers(buf[at:head_end])
        if headers is None or "content-length" not in headers:
            out.append(_null_record("bad_header"))
            break
        try:
            clen = int(headers["content-length"])
        except ValueError:
            out.append(_null_record("bad_header"))
            break
        content_at = head_end + 4
        avail = n - content_at
        rec = {
            "record_id": headers.get("warc-record-id"),
            "warc_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "http_status": None,
            "http_content_type": None,
            "n_content_bytes": clen,
            "payload": None,
            "verdict": "ok",
        }
        if avail < clen:
            rec["verdict"] = "truncated"
            out.append(rec)
            break
        content = buf[content_at : content_at + clen]
        ctype = (rec["content_type"] or "").lower()
        if "msgtype=response" in ctype and content[:7] == b"HTTP/1.":
            line_end = content.find(b"\r\n")
            parts = content[:line_end].split(b" ")
            try:
                rec["http_status"] = int(parts[1])
            except (IndexError, ValueError):
                pass
            body_at = content.find(_CRLF2)
            # served Content-Type from the HTTP headers — what crawl
            # pipelines actually filter on (the WARC-level
            # content_type only says application/http)
            head_block = content[line_end + 2 : body_at if body_at >= 0 else n]
            for hl in head_block.split(b"\r\n"):
                if hl.lower().startswith(b"content-type:"):
                    rec["http_content_type"] = (
                        hl.split(b":", 1)[1].strip().decode("ascii", "replace")
                    )
                    break
            rec["payload"] = (
                content[body_at + 4 :] if body_at >= 0 else None
            )
        out.append(rec)
        at = content_at + clen
    return out


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Every record of one WARC file (compressed or plain) as dicts
    keyed by ``FIELDS`` — quarantine verdicts instead of exceptions
    (module docstring): this function never raises on corrupt bytes."""
    if data[:2] != b"\x1f\x8b":
        return _parse_records(data)
    out: list[dict] = []
    at = 0
    n = len(data)
    while at < n:
        d = zlib.decompressobj(wbits=31)
        try:
            chunk = d.decompress(data[at:])
        except zlib.error:
            chunk = None
        if chunk is None or not d.eof:
            # corrupt (or truncated-at-EOF) member: ONE row per
            # corrupt region, then resync at the next plausible
            # member magic (adjacent corrupt members merge into one
            # region — the scan skips their magics while failing)
            verdict = "corrupt_gzip" if chunk is None else "truncated"
            out.append(_null_record(verdict))
            nxt = at
            while True:
                nxt = data.find(_GZ_MAGIC, nxt + 1)
                if nxt < 0:
                    return out
                probe = zlib.decompressobj(wbits=31)
                try:
                    head = probe.decompress(data[nxt : nxt + 4096], 64)
                except zlib.error:
                    continue
                if head.startswith(b"WARC/") or head.startswith(b"\r\n"):
                    break
            at = nxt
            continue
        out.extend(_parse_records(chunk))
        consumed = (n - at) - len(d.unused_data)
        at += max(consumed, 1)
    return out
