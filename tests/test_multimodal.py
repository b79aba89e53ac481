"""Multimodal plumbing tests: schema contract, Arrow batch path,
deterministic fake features, frame sampling, and the codec stub."""

from __future__ import annotations

import pytest

from lab5_lakehouse_etl_spark.functions import multimodal as M
from tests.conftest import SF_DIR

from lab5_lakehouse_etl_spark.session import load_table


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(20)
    return M.fake_media_from_documents(docs).cache()


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id",
        "payload",
        "modality",
        "mime",
        "n_bytes",
    ]
    row = media.first()
    assert isinstance(row.payload, bytearray | bytes)
    assert row.n_bytes == len(row.payload)


def test_extract_features_deterministic(spark, media):
    f1 = {r.media_id: r.features for r in M.extract_features(media).collect()}
    f2 = {r.media_id: r.features for r in M.extract_features(media).collect()}
    assert f1 == f2
    vec = next(iter(f1.values()))
    assert len(vec) == M.FEATURE_DIM
    assert all(0.0 <= x < 1.0 for x in vec)


def test_sample_frames_covers_payload(media):
    frames = M.sample_frames(media, every_n_bytes=64).collect()
    by_media: dict[int, list] = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r)
    sizes = {r.media_id: r.n_bytes for r in media.collect()}
    for mid, fr in by_media.items():
        # full coverage: every frame but the last is exactly 64 bytes,
        # and together they reproduce the whole payload — no dropped tail
        lens = [len(f.frame_payload) for f in sorted(fr, key=lambda f: f.frame_idx)]
        assert all(ln == 64 for ln in lens[:-1])
        assert sum(lens) == sizes[mid]


def test_decode_non_png_still_raises():
    # the real decode path covers PNG; other codecs remain an explicit
    # NotImplementedError, never a silent wrong answer
    with pytest.raises(NotImplementedError, match="PNG decode"):
        M.decode_image(b"\xff\xd8\xff\xe0JFIF-ish")


# ---------------------------------------------------------------- PNG codec


def _pixels(n: int, seed: int = 7) -> bytes:
    return bytes((seed * 31 + i * 17) % 256 for i in range(n))


@pytest.mark.parametrize("color_type,channels", [(0, 1), (2, 3), (4, 2), (6, 4)])
def test_png_roundtrip_all_color_types(color_type, channels):
    from lab5_lakehouse_etl_spark.functions import png

    w, h = 13, 11  # odd sizes so stride math has no power-of-two luck
    px = _pixels(w * h * channels, seed=color_type + 3)
    data = png.encode_png(w, h, px, color_type=color_type)
    assert data[:8] == png.PNG_SIGNATURE
    dw, dh, dc, dpx = png.decode_png(data)
    assert (dw, dh, dc) == (w, h, channels)
    assert dpx == px


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_roundtrip_each_filter(ftype):
    # pin every filter individually — the cycling default could in
    # principle hide a bug where two filter errors cancel
    from lab5_lakehouse_etl_spark.functions import png

    w, h = 9, 6
    px = _pixels(w * h * 3, seed=ftype + 11)
    data = png.encode_png(w, h, px, color_type=2, filter_of_row=lambda y: ftype)
    assert png.decode_png(data) == (w, h, 3, px)


def test_png_crc_corruption_fails_loudly():
    from lab5_lakehouse_etl_spark.functions import png

    data = bytearray(png.encode_png(4, 4, _pixels(48), color_type=2))
    # flip one byte inside the IDAT payload (after sig+IHDR chunk)
    idat_at = bytes(data).index(b"IDAT")
    data[idat_at + 10] ^= 0x40
    with pytest.raises(ValueError, match="CRC"):
        png.decode_png(bytes(data))


def test_png_rejects_out_of_scope_forms():
    import struct
    import zlib

    from lab5_lakehouse_etl_spark.functions import png

    with pytest.raises(ValueError, match="signature"):
        png.decode_png(b"not a png at all")
    with pytest.raises(NotImplementedError, match="color type"):
        png.encode_png(2, 2, b"\x00" * 4, color_type=3)

    def build(depth=8, color=2, interlace=0):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, color, 0, 0, interlace)
        raw = b"\x00" + b"\x01" * 6 + b"\x00" + b"\x02" * 6
        return (
            png.PNG_SIGNATURE
            + png._chunk(b"IHDR", ihdr)
            + png._chunk(b"IDAT", zlib.compress(raw))
            + png._chunk(b"IEND", b"")
        )

    with pytest.raises(NotImplementedError, match="bit depth"):
        png.decode_png(build(depth=16))
    with pytest.raises(NotImplementedError, match="interlacing"):
        png.decode_png(build(interlace=1))
    with pytest.raises(NotImplementedError, match="color type"):
        png.decode_png(build(color=3))


def test_decode_image_stats_matches_fixture_formula(spark):
    # distributed decode == the closed-form ground truth the oracle
    # states, including a NULL payload row mapping to NULL stats
    ids = spark.range(0, 25).selectExpr("id AS doc_id")
    media = M.png_media_from_ids(ids, id_col="doc_id")
    stats = {r.media_id: r for r in M.decode_image_stats(media).collect()}
    for mid in range(25):
        w = 8 + mid % 9
        h = 8 + (mid // 9) % 9
        sums = [0, 0, 0]
        for i in range(w * h * 3):
            sums[i % 3] += (mid * 31 + i) % 256
        r = stats[mid]
        assert (r.width, r.height, r.channels) == (w, h, 3)
        assert list(r.channel_sums) == sums

    null_media = media.selectExpr(
        "media_id", "CAST(NULL AS BINARY) AS payload"
    ).limit(3)
    for r in M.decode_image_stats(null_media).collect():
        assert r.width is None and r.channel_sums is None


def test_resize_preserves_prefix_and_pads(media):
    resized = M.resize_media(media, width=32, height=32)
    out = {r.media_id: r for r in resized.collect()}
    for src in media.collect():
        r = out[src.media_id]
        assert (r.width, r.height) == (32, 32)
        assert len(r.payload) == 1024
        prefix = bytes(src.payload)[:1024]
        assert bytes(r.payload)[: len(prefix)] == prefix
        assert all(b == 0 for b in bytes(r.payload)[len(prefix):])
