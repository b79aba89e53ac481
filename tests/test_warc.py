"""WARC (ISO 28500) source: pure-stdlib writer/parser round-trip,
quarantine verdicts (truncated / bad_header / corrupt_gzip with
member resync), plain-vs-gzip layout equivalence, and the distributed
reader's plan shape.  The declared query ``q_scan_warc`` pins the
closed-form arms against DuckDB; these tests pin the paths the
fixture deliberately keeps OUT of the oracle (gzip corruption needs
adjacency control the closed form can't state)."""

from __future__ import annotations

import gzip

import pytest

from lab5_lakehouse_etl_spark.sources import warc as W
from lab5_lakehouse_etl_spark.sources.readers import read_warc


def _response_member(i: int, body: bytes | None = None) -> bytes:
    body = body if body is not None else f"<p>doc {i}</p>".encode()
    return W.gzip_member(
        W.build_record(
            f"<urn:doc:{i}>",
            "response",
            W.build_http_response(body),
            target_uri=f"https://h/doc/{i}",
        )
    )


def test_roundtrip_single_and_multi_member(tmp_path):
    p = tmp_path / "a.warc.gz"
    W.write_warc(str(p), [_response_member(i) for i in range(5)])
    recs = W.parse_warc_bytes(p.read_bytes())
    assert [r["verdict"] for r in recs] == ["ok"] * 5
    assert [r["record_id"] for r in recs] == [
        f"<urn:doc:{i}>" for i in range(5)
    ]
    assert recs[2]["payload"] == b"<p>doc 2</p>"
    assert recs[2]["http_status"] == 200
    assert recs[2]["target_uri"] == "https://h/doc/2"


def test_plain_and_whole_file_gzip_equivalent():
    """The same records as (a) uncompressed .warc, (b) one gzip
    member per record, (c) whole-file single-member gzip must parse
    identically — ISO 28500 allows all three layouts."""
    raw = b"".join(
        W.build_record(
            f"<urn:doc:{i}>", "response",
            W.build_http_response(f"b{i}".encode()),
        )
        for i in range(4)
    )
    per_member = b"".join(
        W.gzip_member(
            W.build_record(
                f"<urn:doc:{i}>", "response",
                W.build_http_response(f"b{i}".encode()),
            )
        )
        for i in range(4)
    )
    whole = gzip.compress(raw, mtime=0)
    out = [W.parse_warc_bytes(v) for v in (raw, per_member, whole)]
    assert out[0] == out[1] == out[2]
    assert [r["payload"] for r in out[0]] == [b"b0", b"b1", b"b2", b"b3"]


def test_truncated_member_keeps_header_fields():
    rec = W.build_record(
        "<urn:doc:9>", "response",
        W.build_http_response(b"full body here"),
        declared_length=9999,
    )
    got = W.parse_warc_bytes(W.gzip_member(rec))
    assert len(got) == 1 and got[0]["verdict"] == "truncated"
    assert got[0]["record_id"] == "<urn:doc:9>"
    assert got[0]["payload"] is None and got[0]["http_status"] is None


def test_bad_header_member_quarantines_alone():
    members = [
        _response_member(0),
        W.gzip_member(b"NOT WARC \xff garbage"),
        _response_member(2),
    ]
    got = W.parse_warc_bytes(b"".join(members))
    assert [r["verdict"] for r in got] == ["ok", "bad_header", "ok"]
    assert got[1]["record_id"] is None


def test_corrupt_gzip_resyncs_to_next_member():
    """A member whose DEFLATE stream is damaged yields ONE
    corrupt_gzip row and the parser resyncs at the next member —
    neighbours unharmed."""
    m0, m1, m2 = (_response_member(i) for i in range(3))
    bad = bytearray(m1)
    for off in range(20, 26):  # damage the deflate body, keep magic
        bad[off] ^= 0xFF
    got = W.parse_warc_bytes(m0 + bytes(bad) + m2)
    verdicts = [r["verdict"] for r in got]
    assert verdicts.count("ok") == 2
    assert verdicts.count("corrupt_gzip") >= 1
    ids = [r["record_id"] for r in got if r["verdict"] == "ok"]
    assert ids == ["<urn:doc:0>", "<urn:doc:2>"]


def test_adjacent_corrupt_members_merge_into_one_region():
    """Documented merge semantics: N adjacent corrupt members = one
    quarantined REGION (the resync scan skips magics that fail to
    decompress) — why the closed-form fixture plants gzip-intact
    bad_header garbage instead."""
    def corrupted(i):
        b = bytearray(_response_member(i))
        for off in range(20, 26):
            b[off] ^= 0xFF
        return bytes(b)

    data = _response_member(0) + corrupted(1) + corrupted(2) + _response_member(3)
    got = W.parse_warc_bytes(data)
    assert [r["record_id"] for r in got if r["verdict"] == "ok"] == [
        "<urn:doc:0>", "<urn:doc:3>"
    ]
    assert 1 <= sum(r["verdict"] == "corrupt_gzip" for r in got) <= 2


def test_parser_never_raises_on_fuzz():
    """decode_or_quarantine doctrine: arbitrary damage anywhere in
    the file yields verdict rows, never an exception."""
    import numpy as np

    rng = np.random.default_rng(15)
    base = b"".join(_response_member(i) for i in range(3))
    for _ in range(400):
        i = int(rng.integers(0, len(base)))
        b = int(rng.integers(1, 256))
        mut = bytearray(base)
        mut[i] ^= b
        out = W.parse_warc_bytes(bytes(mut))
        assert isinstance(out, list)
        for r in out:
            assert r["verdict"] in (
                "ok", "truncated", "bad_header", "corrupt_gzip"
            )
    # truncate at every prefix length of one member
    m = _response_member(7)
    for cut in range(len(m)):
        out = W.parse_warc_bytes(m[:cut])
        assert isinstance(out, list)


def test_read_warc_distributed(spark, tmp_path):
    for f in range(3):
        W.write_warc(
            str(tmp_path / f"p{f}.warc.gz"),
            [_response_member(f * 10 + i) for i in range(4)],
        )
    df = read_warc(spark, str(tmp_path / "*.warc.gz"))
    assert df.count() == 12
    assert dict(df.dtypes)["payload"] == "binary"
    assert dict(df.dtypes)["http_status"] == "int"
    got = sorted(
        r.record_id for r in df.filter("verdict = 'ok'").collect()
    )
    assert len(got) == 12
    # plan shape: a binaryFile scan feeding ONE Python (Arrow) node,
    # no shuffle — files are the parallelism unit
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Exchange" not in plan


def test_write_warc_declared_fixture_counts(spark):
    """Record-count pin for the declared fixture: every documents row
    yields exactly one output row (ok / truncated / bad_header arms
    included) at sf0.001."""
    from lab5_lakehouse_etl_spark.queries import load_all, QUERIES

    load_all()
    df = QUERIES["q_scan_warc"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    import duckdb

    n_docs = duckdb.sql(
        "SELECT count(*) FROM read_parquet("
        "'/root/testdata/sf0.001/documents.parquet')"
    ).fetchone()[0]
    assert len(rows) == n_docs
    by_v = {}
    for r in rows:
        by_v[r.verdict] = by_v.get(r.verdict, 0) + 1
    assert by_v["truncated"] == sum(
        1 for i in range(n_docs) if i % 16 == 13
    )
    assert by_v["bad_header"] == sum(
        1 for i in range(n_docs) if i % 16 == 14
    )


def test_stream_warc_gate_multibatch_and_sink_shape(spark):
    """The streaming ingest gate drains one micro-batch per landed
    file (> 1 — the multi-batch claim), its sink rows carry verdicts
    but never payload bytes, and the drained relation equals the
    batch source's record set on the same fixture."""
    from lab5_lakehouse_etl_spark.queries import QUERIES, load_all
    from lab5_lakehouse_etl_spark.queries import streaming_ops as SO

    load_all()
    df = QUERIES["q_stream_warc"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert SO.STREAM_WARC_BATCHES["n"] >= 4  # 4 landing files
    assert "payload" not in df.columns
    import duckdb

    n_docs = duckdb.sql(
        "SELECT count(*) FROM read_parquet("
        "'/root/testdata/sf0.001/documents.parquet')"
    ).fetchone()[0]
    assert len(rows) == n_docs
    by_v = {}
    for r in rows:
        by_v[r.verdict] = by_v.get(r.verdict, 0) + 1
    assert by_v["truncated"] == sum(1 for i in range(n_docs) if i % 16 == 13)
    assert by_v["bad_header"] == sum(1 for i in range(n_docs) if i % 16 == 14)
