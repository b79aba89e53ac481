"""EXIF extraction + planting: two-way Java-ImageIO interop (the
committed golden_exif.tiff was written by ImageIO's OWN TIFF writer;
our planted files are readable by ImageIO, which resolves the
Exif/GPS IFD pointers), round-trips across both containers, GPS
arithmetic, advisory-failure semantics, and pixel invariance.

golden_exif.tiff generation (in-container, JDK 17 javax.imageio — the
java-imageio-validation precedent): a 5x3 TYPE_3BYTE_BGR raster with
pixel (x,y) = (x*40, y*80, 17), written via
ImageWriter("tiff").write with an IIOMetadata tree carrying
TIFFField nodes Make=271 "JavaCam", Model=272 "IIO-9",
Orientation=274 8, DateTime=306 "2023:07:04 08:30:00" (the build
script is quoted in the r14 commit message).  ImageIO read-back of
OUR planted EXIF was verified at build time: its native metadata
tree lists tags 271/272/274 plus the RESOLVED Exif-IFD field 36867
and GPS fields 1-4 — i.e. an independent reader followed our
34665/34853 pointers.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from lab5_lakehouse_etl_spark.functions import exif as E
from lab5_lakehouse_etl_spark.functions import jpeg, png, tiff

DATA = os.path.join(os.path.dirname(__file__), "data")

META = {
    "orientation": 6,
    "make": "CamCo",
    "model": "M-3",
    "datetime_original": "2024:01:15 12:00:00",
    "gps": ("N", (51, 30, 0), "W", (0, 15, 0)),
}
WANT = {
    "orientation": 6,
    "make": "CamCo",
    "model": "M-3",
    "datetime_original": "2024:01:15 12:00:00",
    "gps_lat": 51.5,
    "gps_lon": -0.25,
}


def test_reads_imageio_written_golden():
    """Our extractor over a TIFF whose metadata Java ImageIO's writer
    laid out — field placement, ASCII termination and byte order are
    an independent implementation's choices, and the pixels still
    decode exactly."""
    data = open(os.path.join(DATA, "golden_exif.tiff"), "rb").read()
    info = E.extract_exif(data)
    assert info == {
        "orientation": 8,
        "make": "JavaCam",
        "model": "IIO-9",
        # DateTime (306) fallback: ImageIO wrote no Exif sub-IFD
        "datetime_original": "2023:07:04 08:30:00",
        "gps_lat": None,
        "gps_lon": None,
    }
    w, h, ch, px = tiff.decode_tiff(data)
    a = np.frombuffer(px, np.uint8).reshape(h, w, ch)
    for y in range(h):
        for x in range(w):
            assert tuple(a[y, x]) == (x * 40, y * 80, 17)


@pytest.mark.parametrize("kind", ["gray", "rgb", "lzw", "palette"])
def test_tiff_plant_roundtrip_pixels_unchanged(kind):
    """add_tiff_exif rebuilds IFD0 sorted + appends sub-IFDs after the
    trailing IFD: every planted field reads back, pixels decode
    byte-identically, and the output stays word-aligned."""
    rng = np.random.default_rng(11)
    if kind == "palette":
        pal = rng.integers(0, 256, 3 * 16, dtype=np.uint8).tobytes()
        idx = rng.integers(0, 16, 7 * 5, dtype=np.uint8).tobytes()
        data = tiff.encode_tiff(7, 5, idx, palette=pal)
    else:
        ch = 3 if kind in ("rgb", "lzw") else 1
        raw = rng.integers(0, 256, 7 * 5 * ch, dtype=np.uint8).tobytes()
        data = tiff.encode_tiff(
            7, 5, raw, channels=ch,
            compression="lzw" if kind == "lzw" else "none",
        )
    want_px = tiff.decode_tiff(data)
    planted = E.add_tiff_exif(data, META)
    assert tiff.decode_tiff(planted) == want_px
    assert E.extract_exif(planted) == WANT
    from tests.test_codecs_property import _assert_tiff_word_aligned

    _assert_tiff_word_aligned(planted)


def test_jpeg_app1_roundtrip_and_decode_unchanged():
    rng = np.random.default_rng(5)
    raw = bytes(rng.integers(0, 256, 64, dtype=np.uint8))
    data = jpeg.encode_jpeg(8, 8, raw)
    planted = E.insert_jpeg_exif(data, META)
    assert E.extract_exif(planted) == WANT
    assert jpeg.decode_jpeg(planted) == jpeg.decode_jpeg(data)
    # APP1 sits right after SOI, the spec position
    assert planted[2:4] == b"\xff\xe1"
    # big-endian embedded block reads identically
    app1 = E.build_jpeg_exif_app1(META, big_endian=True)
    planted_be = data[:2] + app1 + data[2:]
    assert E.extract_exif(planted_be) == WANT


def test_extract_is_advisory_never_raises():
    """EXIF damage yields None (or partial fields), never an
    exception — metadata must not make a decodable image quarantine."""
    assert E.extract_exif(b"") is None
    assert E.extract_exif(b"\x89PNG\r\n\x1a\n" + bytes(32)) is None
    raw = bytes(range(48))
    planted = E.add_tiff_exif(
        tiff.encode_tiff(4, 4, raw, channels=3), META
    )
    # truncate inside the appended GPS IFD: extraction degrades to
    # None, decode of the image itself is unaffected
    cut = planted[: len(planted) - 10]
    assert E.extract_exif(cut) is None or isinstance(
        E.extract_exif(cut), dict
    )
    # corrupt the Exif pointer target wildly
    bad = bytearray(planted)
    at = bad.rfind(struct.pack("<H", E.TAG_EXIF_IFD))
    if at > 0:
        bad[at + 8 : at + 12] = struct.pack("<I", 0xFFFFFF)
        assert E.extract_exif(bytes(bad)) is None or isinstance(
            E.extract_exif(bytes(bad)), dict
        )
    # JPEG whose APP1 declares a bogus length
    jdata = jpeg.encode_jpeg(4, 4, bytes(16))
    app1 = E.build_jpeg_exif_app1(META)
    broken = jdata[:2] + app1[:8] + jdata[2:]
    assert E.extract_exif(broken) is None


def _tiff_with_pointer_tag_of_type(tag: int, typ: int) -> bytes:
    """Minimal LE TIFF whose IFD0 declares the Exif/GPS *pointer* tag
    with a non-LONG type — the malformed shape (r14 advice, exif.py
    pointer dereference) where ifd0[tag][0] is a str (ASCII) or float
    (RATIONAL), not an integer offset."""
    hdr = b"II*\x00" + struct.pack("<I", 8)
    if typ == 2:  # ASCII, inline
        entry = struct.pack("<HHI4s", tag, 2, 4, b"ab\x00\x00")
        tail = b""
    else:  # RATIONAL, out-of-line 8-byte value
        off = 8 + 2 + 12 + 4
        entry = struct.pack("<HHII", tag, 5, 1, off)
        tail = struct.pack("<II", 1, 2)
    return hdr + struct.pack("<H", 1) + entry + struct.pack("<I", 0) + tail


def test_malformed_pointer_tag_types_never_raise():
    """A pointer tag (34665/34853) carrying type ASCII or RATIONAL
    must not escape the advisory contract: before the r15 fix both
    shapes raised TypeError out of extract_exif, and decode_or_
    quarantine calls it outside any try — one payload killed the
    task.  Now: dict-or-None, never a raise."""
    for tag in (E.TAG_EXIF_IFD, E.TAG_GPS_IFD):
        for typ in (2, 5):
            out = E.extract_exif(_tiff_with_pointer_tag_of_type(tag, typ))
            assert out is None or isinstance(out, dict)
    # and a well-formed sibling tag still extracts around the bad one
    planted = E.add_tiff_exif(
        tiff.encode_tiff(4, 4, bytes(48), channels=3), META
    )
    bad = bytearray(planted)
    at = bad.rfind(struct.pack("<H", E.TAG_EXIF_IFD))
    assert at > 0
    bad[at + 2 : at + 4] = struct.pack("<H", 5)  # LONG -> RATIONAL
    out = E.extract_exif(bytes(bad))
    assert out is not None and out["make"] == META["make"]
    assert out["datetime_original"] is None or isinstance(
        out["datetime_original"], str
    )


def test_gps_hemispheres_and_seconds():
    data = tiff.encode_tiff(2, 2, bytes(12), channels=3)
    planted = E.add_tiff_exif(
        data,
        {"gps": ("S", (10, 15, 30), "E", (120, 0, 45))},
    )
    info = E.extract_exif(planted)
    assert info["gps_lat"] == -(10 + 15 / 60 + 30 / 3600)
    assert info["gps_lon"] == 120 + 45 / 3600
    assert info["orientation"] is None and info["make"] is None


def test_multipage_plant_refuses():
    pages = [
        {"width": 3, "height": 2, "pixels": bytes(6), "channels": 1},
        {"width": 2, "height": 2, "pixels": bytes(4), "channels": 1},
    ]
    data = tiff.encode_tiff_pages(pages)
    with pytest.raises(NotImplementedError, match="multi-page"):
        E.add_tiff_exif(data, META)


def test_exif_fixture_and_spark_surface(spark):
    """The declared-query path end to end at small n: fixture builds
    all four container arms, exif_metadata returns the closed-form
    relation, and the quarantine gate reports presence."""
    from lab5_lakehouse_etl_spark.functions import multimodal as M

    ids = spark.range(0, 40).selectExpr("id AS doc_id")
    media = E.exif_media_from_ids(ids)
    got = {r.media_id: r for r in E.exif_metadata(media).collect()}
    assert len(got) == 40
    for mid in range(40):
        r = got[mid]
        meta = E.exif_fixture_meta(mid)
        if meta is None:
            assert not r.has_exif and r.orientation is None
            continue
        assert r.has_exif
        assert r.orientation == meta["orientation"]
        assert r.make == "CamCo" and r.model == f"M{mid % 5}"
        lat_ref, (d, m, s), lon_ref, (d2, m2, s2) = meta["gps"]
        lat = d + m / 60 + s / 3600
        lon = d2 + m2 / 60 + s2 / 3600
        assert r.gps_lat == (lat if lat_ref == "N" else -lat)
        assert r.gps_lon == (-lon if lon_ref == "W" else lon)
    # quarantine presence column: true exactly for the valid-TIFF arm
    qm = M.corrupt_png_media_from_ids(ids)
    verdicts = {
        r.media_id: r for r in M.decode_or_quarantine(qm).collect()
    }
    for mid in range(40):
        assert verdicts[mid].has_exif == (mid % 7 == 4), mid


def test_orientation_transforms_roundtrip_and_semantics():
    """All 8 Exif tag-274 transforms: inverse∘normalize is the
    identity, the 8 stored variants of an asymmetric scene are
    pairwise distinct, and the two non-involutions match numpy's
    rot90 exactly (CW/CCW confusion is THE classic orientation
    bug)."""
    import numpy as np

    W, H, C = 9, 6, 3
    base = (
        (
            np.arange(W)[None, :, None] * 13
            + np.arange(H)[:, None, None] * 101
            + np.arange(C)[None, None, :] * 7
        )
        % 256
    ).astype(np.uint8)
    seen = set()
    for o in range(1, 9):
        w2, h2, px = E.inverse_orientation(W, H, C, base.tobytes(), o)
        seen.add((w2, h2, px))
        assert (w2, h2) == ((H, W) if o >= 5 else (W, H))
        assert E.normalize_orientation(w2, h2, C, px, o) == (
            W,
            H,
            base.tobytes(),
        )
    assert len(seen) == 8
    a = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    w2, h2, px = E.normalize_orientation(4, 2, 3, a.tobytes(), 6)
    assert (w2, h2) == (2, 4)
    assert px == np.ascontiguousarray(np.rot90(a, k=-1)).tobytes()
    w2, h2, px = E.normalize_orientation(4, 2, 3, a.tobytes(), 8)
    assert px == np.ascontiguousarray(np.rot90(a, k=1)).tobytes()
    with pytest.raises(ValueError, match="out of range"):
        E.normalize_orientation(4, 2, 3, a.tobytes(), 9)
    with pytest.raises(ValueError, match="out of range"):
        E.normalize_orientation(4, 2, 3, a.tobytes(), 0)


def test_oriented_fingerprints_end_to_end(spark):
    """The oriented-dedup path at small n: every group of 8 ids
    collapses to ONE normalized fingerprint while all raw
    fingerprints stay distinct; an absent tag defaults to
    orientation 1 (raw == normalized)."""
    ids = spark.range(0, 24).selectExpr("id AS doc_id")
    media = E.oriented_media_from_ids(ids)
    fps = E.oriented_fingerprints(media).collect()
    by_gid: dict[int, list] = {}
    for r in fps:
        assert r.orientation == (r.media_id % 8) + 1
        by_gid.setdefault(r.media_id // 8, []).append(r)
    assert len(by_gid) == 3
    for gid, rows in by_gid.items():
        assert len({r.raw_fp for r in rows}) == 8
        assert len({r.norm_fp for r in rows}) == 1
        # orientation 1's stored raster IS the scene
        o1 = next(r for r in rows if r.orientation == 1)
        assert o1.raw_fp == o1.norm_fp
    # EXIF-free payload: fingerprints equal, orientation defaults 1
    from lab5_lakehouse_etl_spark.functions import tiff

    plain = spark.createDataFrame(
        [(99, bytearray(tiff.encode_tiff(3, 2, bytes(18), channels=3)))],
        "media_id LONG, payload BINARY",
    )
    r = E.oriented_fingerprints(plain).first()
    assert r.orientation == 1 and r.raw_fp == r.norm_fp


def test_png_exif_chunk_roundtrip_and_decode_unchanged():
    """PNG eXIf (extension spec 1.5.0): the chunk payload is a raw
    TIFF block; planting after IHDR leaves pixels byte-identical
    (ancillary chunk, CRC-valid) and extraction reads every field."""
    rng = np.random.default_rng(9)
    raw = rng.integers(0, 256, 6 * 4 * 3, dtype=np.uint8).tobytes()
    data = png.encode_png(6, 4, raw)  # color_type 2 = RGB
    planted = E.insert_png_exif(data, META)
    assert E.extract_exif(planted) == WANT
    assert png.decode_png(planted) == png.decode_png(data)
    assert E.extract_exif(data) is None
    # chunk is CRC-valid right after IHDR
    import zlib

    at = 8 + 4 + 4 + 13 + 4
    (n,) = struct.unpack(">I", planted[at : at + 4])
    assert planted[at + 4 : at + 8] == b"eXIf"
    payload = planted[at + 8 : at + 8 + n]
    (crc,) = struct.unpack(">I", planted[at + 8 + n : at + 12 + n])
    assert zlib.crc32(b"eXIf" + payload) & 0xFFFFFFFF == crc
    with pytest.raises(ValueError, match="not a PNG"):
        E.insert_png_exif(b"junk", META)


def test_replant_replaces_existing_tags():
    """Planting over an already-planted TIFF REPLACES the metadata
    tags (duplicate tags in one IFD are malformed TIFF): last write
    wins, IFD0 stays duplicate-free, pixels untouched."""
    data = tiff.encode_tiff(4, 4, bytes(48), channels=3)
    p2 = E.add_tiff_exif(
        E.add_tiff_exif(data, {"orientation": 3, "make": "Old"}),
        {"orientation": 6, "make": "New"},
    )
    info = E.extract_exif(p2)
    assert info["orientation"] == 6 and info["make"] == "New"
    (ifd_at,) = struct.unpack("<I", p2[4:8])
    (n,) = struct.unpack("<H", p2[ifd_at : ifd_at + 2])
    tags = [
        struct.unpack("<H", p2[ifd_at + 2 + 12 * i : ifd_at + 4 + 12 * i])[0]
        for i in range(n)
    ]
    assert len(tags) == len(set(tags))
    assert tiff.decode_tiff(p2) == tiff.decode_tiff(data)


def test_extract_exif_fuzz_never_raises():
    """The advisory contract under damage: 1500 single-byte flips
    across planted TIFF / JPEG-APP1 / PNG-eXIf containers —
    extract_exif returns a dict or None, NEVER raises (corrupt
    metadata must not quarantine a decodable image), and stays fast
    (no pathological walks)."""
    import time

    rng = np.random.default_rng(14)
    meta = dict(META)
    payloads = []
    payloads.append(E.add_tiff_exif(tiff.encode_tiff(5, 4, bytes(60), channels=3), meta))
    payloads.append(
        E.insert_jpeg_exif(jpeg.encode_jpeg(8, 8, bytes(64)), meta)
    )
    payloads.append(
        E.insert_png_exif(png.encode_png(5, 4, bytes(60)), meta)
    )
    t0 = time.time()
    for data in payloads:
        for _ in range(500):
            i = int(rng.integers(0, len(data)))
            b = int(rng.integers(1, 256))
            mut = bytearray(data)
            mut[i] ^= b
            out = E.extract_exif(bytes(mut))
            assert out is None or isinstance(out, dict)
    # targeted arm (r15): random flips only rarely land on the two
    # pointer-tag TYPE fields, so sweep those deterministically —
    # every TIFF type code 1..13 on both 34665 and 34853 (4→5 is one
    # bit; 4→2 is not, which is how the original fuzz missed it)
    for data in payloads:
        for tag in (E.TAG_EXIF_IFD, E.TAG_GPS_IFD):
            at = bytes(data).rfind(struct.pack("<H", tag))
            if at < 0:
                continue
            for typ in range(1, 14):
                mut = bytearray(data)
                mut[at + 2 : at + 4] = struct.pack("<H", typ)
                out = E.extract_exif(bytes(mut))
                assert out is None or isinstance(out, dict)
    assert time.time() - t0 < 30
