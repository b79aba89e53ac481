"""Multimodal plumbing tests: schema contract, Arrow batch path,
deterministic fake features, frame sampling, and the codec stub."""

from __future__ import annotations

import os

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


def test_decode_unsupported_format_still_raises():
    # the real decode paths cover PNG, JPEG and lossless WebP; other
    # formats remain an explicit NotImplementedError, never a silent
    # wrong answer — a LOSSY WebP refuses inside the VP8L codec, an
    # unknown container in the dispatcher, and a
    # JPEG-looking-but-truncated payload fails loudly in the real
    # decoder
    with pytest.raises(NotImplementedError, match="lossy VP8"):
        M.decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ")
    with pytest.raises(NotImplementedError, match="PNG, JPEG"):
        M.decode_image(b"AVIF-ish unknown container")  # no codec here
    # GIF, BMP (r12) and TIFF (r13) dispatch — truncated/hollow ones
    # fail in the codec
    with pytest.raises(ValueError):
        M.decode_image(b"GIF89a" + bytes(4))
    with pytest.raises(ValueError):
        M.decode_image(b"BM" + bytes(16))
    with pytest.raises(ValueError):
        M.decode_image(b"II*\x00" + bytes(16))
    with pytest.raises(ValueError, match="truncated JPEG"):
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
    # palette encode is IN scope since r12 but demands its palette
    with pytest.raises(ValueError, match="requires a palette"):
        png.encode_png(2, 2, b"\x00" * 4, color_type=3)
    with pytest.raises(NotImplementedError, match="color type"):
        png.encode_png(2, 2, b"\x00" * 4, color_type=5)

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
    # a palette image with no PLTE chunk is malformed, not unsupported
    with pytest.raises(ValueError, match="no PLTE"):
        png.decode_png(build(color=3))
    with pytest.raises(ValueError, match="invalid for a palette"):
        png.decode_png(build(depth=16, color=3))


def test_png_palette_roundtrip_and_trns():
    import numpy as np

    from lab5_lakehouse_etl_spark.functions import png

    rng = np.random.default_rng(9)
    w, h = 11, 7
    palette = rng.integers(0, 256, 3 * 17, dtype=np.uint8).tobytes()
    idx = rng.integers(0, 17, w * h, dtype=np.uint8).tobytes()
    data = png.encode_png(w, h, idx, color_type=3, palette=palette)
    dw, dh, dc, px = png.decode_png(data)
    assert (dw, dh, dc) == (w, h, 3)
    assert px == b"".join(palette[3 * i : 3 * i + 3] for i in idx)
    # tRNS shorter than the palette: missing entries are opaque
    data = png.encode_png(
        w, h, idx, color_type=3, palette=palette, trns=bytes([10, 20, 30])
    )
    dw, dh, dc, px = png.decode_png(data)
    assert dc == 4
    for i, x in enumerate(idx):
        assert px[4 * i : 4 * i + 3] == palette[3 * x : 3 * x + 3]
        assert px[4 * i + 3] == ([10, 20, 30][x] if x < 3 else 255)
    # out-of-range palette indices fail loudly on both sides
    with pytest.raises(ValueError, match="palette index"):
        png.encode_png(2, 2, bytes([17] * 4), color_type=3, palette=palette)


def test_png_palette_subbyte_depths():
    # 1/2/4-bit palette PNGs (the common web favicon shapes): filters
    # run over PACKED bytes with bpp=1, indices unpack big-endian —
    # hand-built streams since the encoder only emits depth 8
    import struct
    import zlib

    from lab5_lakehouse_etl_spark.functions import png

    def build(w, h, depth, indices, palette, ftype=0):
        per_byte = 8 // depth
        stride = (w * depth + 7) // 8
        raw = bytearray()
        prev = bytes(stride)
        for y in range(h):
            row = bytearray(stride)
            for x in range(w):
                shift = 8 - depth * (x % per_byte + 1)
                row[x // per_byte] |= indices[y * w + x] << shift
            raw.append(ftype)
            raw += png._filter_scanline(ftype, bytes(row), prev, 1)
            prev = bytes(row)
        ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0)
        return (
            png.PNG_SIGNATURE
            + png._chunk(b"IHDR", ihdr)
            + png._chunk(b"PLTE", palette)
            + png._chunk(b"IDAT", zlib.compress(bytes(raw)))
            + png._chunk(b"IEND", b"")
        )

    palette = bytes(range(48))  # 16 entries
    for depth, ftype in ((1, 2), (2, 1), (4, 4)):
        w, h = 9, 5  # odd width: the last byte is partially used
        nmax = 1 << depth
        indices = [(x * 3 + y * 7) % nmax for y in range(h) for x in range(w)]
        dw, dh, dc, px = png.decode_png(
            build(w, h, depth, indices, palette, ftype)
        )
        assert (dw, dh, dc) == (w, h, 3)
        assert px == b"".join(
            palette[3 * i : 3 * i + 3] for i in indices
        )
    # an index past the palette end is a loud error, not a clamp
    with pytest.raises(ValueError, match="palette index"):
        png.decode_png(build(2, 2, 4, [15, 0, 0, 0], bytes(9)))


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


# ---------------------------------------------------------------- WAV codec


def test_wav_roundtrip_both_pad_branches():
    import numpy as np

    from lab5_lakehouse_etl_spark.functions import wav

    k = np.arange(97 * 2, dtype=np.int64)
    samples = ((k * 7919 + 5) % 65536 - 32768).astype("<i2")
    # odd- and even-length LIST payloads walk both sides of the RIFF
    # pad rule; None omits the ancillary chunk entirely
    for info in (b"IARTabc", b"IARTabcd", None):
        data = wav.encode_wav(22050, 2, samples, info=info)
        rate, ch, nf, out = wav.decode_wav(data)
        assert (rate, ch, nf) == (22050, 2, 97)
        assert np.array_equal(out, samples)


def test_wav_rejects_malformed_containers():
    import struct

    import numpy as np

    from lab5_lakehouse_etl_spark.functions import wav

    samples = np.zeros(8, dtype="<i2")
    good = wav.encode_wav(8000, 1, samples)

    with pytest.raises(ValueError, match="RIFF/WAVE"):
        wav.decode_wav(b"FORMxxxxAIFF" + good[12:])
    with pytest.raises(ValueError, match="RIFF size"):
        wav.decode_wav(good[:8] + good[8:20])  # truncated body
    # non-PCM format tag
    bad = bytearray(good)
    fmt_at = bytes(good).index(b"fmt ") + 8
    struct.pack_into("<H", bad, fmt_at, 3)  # IEEE float tag
    with pytest.raises(NotImplementedError, match="format tag"):
        wav.decode_wav(bytes(bad))
    # wrong bit depth
    bad = bytearray(good)
    struct.pack_into("<H", bad, fmt_at + 14, 8)
    with pytest.raises(NotImplementedError, match="bit depth"):
        wav.decode_wav(bytes(bad))
    # inconsistent block align (bits stay 16)
    bad = bytearray(good)
    struct.pack_into("<H", bad, fmt_at + 12, 1)
    with pytest.raises(ValueError, match="block align"):
        wav.decode_wav(bytes(bad))
    # data chunk missing (RIFF size field patched to the shorter body)
    data_at = bytes(good).index(b"data")
    headless = bytearray(good[:data_at])
    struct.pack_into("<I", headless, 4, len(headless) - 8)
    with pytest.raises(ValueError, match="no data chunk"):
        wav.decode_wav(bytes(headless))
    with pytest.raises(ValueError, match="divisible"):
        wav.encode_wav(8000, 2, np.zeros(7, dtype="<i2"))


def test_decode_audio_stats_matches_fixture_formula(spark):
    ids = spark.range(0, 24).selectExpr("id AS doc_id")
    media = M.wav_media_from_ids(ids, id_col="doc_id")
    stats = {r.media_id: r for r in M.decode_audio_stats(media).collect()}
    for mid in range(24):
        rate = 8000 * (1 + mid % 3)
        ch = 1 + mid % 2
        nf = 32 + mid % 41
        vals = [((mid * 131 + k * 7919) % 65536) - 32768 for k in range(nf * ch)]
        r = stats[mid]
        assert (r.sample_rate, r.channels, r.n_frames) == (rate, ch, nf)
        assert r.sample_sum == sum(vals)
        assert r.abs_sum == sum(abs(v) for v in vals)
        assert r.peak == max(abs(v) for v in vals)

    null_media = media.selectExpr(
        "media_id", "CAST(NULL AS BINARY) AS payload"
    ).limit(3)
    for r in M.decode_audio_stats(null_media).collect():
        assert r.sample_rate is None and r.sample_sum is None


# --------------------------------------------------------------- FLAC codec


def test_flac_integrity_checks_fail_loudly():
    import numpy as np

    from lab5_lakehouse_etl_spark.functions import flac

    rng = np.random.default_rng(3)
    s = rng.integers(-32768, 32768, 500, dtype=np.int64)
    good = flac.encode_flac(44100, 1, s, block_size=128)
    with pytest.raises(ValueError, match="magic"):
        flac.decode_flac(b"RIFFxxxxWAVE")
    # frame-data corruption -> CRC-16 (or header CRC-8) mismatch
    bad = bytearray(good)
    bad[len(bad) // 2] ^= 0x10
    with pytest.raises(ValueError, match="CRC"):
        flac.decode_flac(bytes(bad))
    # STREAMINFO md5 corruption -> md5 mismatch after full decode
    bad = bytearray(good)
    bad[30] ^= 0xFF  # inside the 16-byte md5 field (offset 8+10+12..)
    with pytest.raises(ValueError, match="md5"):
        flac.decode_flac(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        flac.decode_flac(good[:-20])
    with pytest.raises(NotImplementedError, match="bit encode"):
        flac.encode_flac(8000, 1, np.zeros(4, np.int64), bits_per_sample=13)
    with pytest.raises(ValueError, match="stereo-only"):
        flac.encode_flac(
            8000, 1, np.zeros(4, np.int64), stereo_mode="mid_side"
        )
    # variable-blocksize flag refuses loudly (patch the frame header
    # bit after the 14-bit sync of the first frame)
    frame_at = 4 + 4 + 34
    bad = bytearray(good)
    bad[frame_at + 1] |= 0x01  # byte 1 low bit = blocking strategy
    with pytest.raises(NotImplementedError, match="variable-blocksize"):
        flac.decode_flac(bytes(bad))


def test_decode_audio_dispatch(spark):
    import numpy as np

    from lab5_lakehouse_etl_spark.functions import flac, wav

    s = np.arange(-50, 50, dtype=np.int64)
    w = wav.encode_wav(8000, 1, s.astype("<i2"))
    f = flac.encode_flac(8000, 1, s)
    for payload in (w, f):
        rate, ch, nf, out = M.decode_audio(payload)
        assert (rate, ch, nf) == (8000, 1, 100)
        assert np.array_equal(np.asarray(out, dtype=np.int64), s)
    with pytest.raises(NotImplementedError, match="RIFF/WAVE and FLAC"):
        M.decode_audio(b"ID3\x04mp3-ish payload")


def test_decode_audio_stats_flac_matches_fixture_formula(spark):
    ids = spark.range(0, 16).selectExpr("id AS doc_id")
    media = M.flac_media_from_ids(ids, id_col="doc_id")
    stats = {r.media_id: r for r in M.decode_audio_stats(media).collect()}
    for mid in range(16):
        rate = 8000 * (1 + mid % 3)
        ch = 1 + mid % 2
        nf = 40 + mid % 50
        vals = [
            ((mid * 31 + k * k) % 4096) - 2048 for k in range(nf * ch)
        ]
        r = stats[mid]
        assert (r.sample_rate, r.channels, r.n_frames) == (rate, ch, nf)
        assert r.sample_sum == sum(vals)
        assert r.abs_sum == sum(abs(v) for v in vals)
        assert r.peak == max(abs(v) for v in vals)
    # the stereo fixtures genuinely span all FOUR channel assignments
    # — (id // 2) % 4 over the odd (stereo) ids; read the assignment
    # nibble straight out of the first frame header byte 3
    pay = {r.media_id: bytes(r.payload) for r in media.collect()}
    frame_at = 4 + 4 + 34  # magic + block header + STREAMINFO
    assigns = {
        mid: pay[mid][frame_at + 3] >> 4 for mid in (1, 3, 5, 7)
    }
    assert assigns == {
        1: 0b0001,  # independent stereo
        3: 0b1010,  # mid/side
        5: 0b1000,  # left/side
        7: 0b1001,  # right/side
    }


# ---------------------------------------------------------------- Y4M codec


def test_y4m_roundtrip_and_stride_sampling():
    from lab5_lakehouse_etl_spark.functions import y4m

    w, h, n = 5, 3, 5
    frames = [bytes(((f * 251 + p) % 256) for p in range(3 * w * h)) for f in range(n)]
    data = y4m.encode_y4m(w, h, frames, fps=(30, 1), colorspace="C444")
    dw, dh, fps, cs, out = y4m.decode_y4m(data)
    assert (dw, dh, fps, cs) == (w, h, (30, 1), "C444")
    assert out == list(enumerate(frames))
    # stride-2 sampling keeps exactly the even frame indices, and the
    # odd frames' Xtag headers are stepped over, not mis-sliced
    _, _, _, _, sampled = y4m.decode_y4m(data, frame_stride=2)
    assert [i for i, _ in sampled] == [0, 2, 4]
    assert all(payload == frames[i] for i, payload in sampled)


def test_y4m_c420_frame_size():
    from lab5_lakehouse_etl_spark.functions import y4m

    w, h = 4, 2  # even dims: C420 chroma planes are (w/2)x(h/2)
    frame = bytes(range(int(w * h * 1.5)))
    data = y4m.encode_y4m(w, h, [frame], colorspace="C420")
    assert y4m.decode_y4m(data)[3:] == ("C420", [(0, frame)])
    with pytest.raises(ValueError, match="expected 12"):
        y4m.encode_y4m(w, h, [frame + b"x"], colorspace="C420")


def test_y4m_rejects_malformed_streams():
    from lab5_lakehouse_etl_spark.functions import y4m

    good = y4m.encode_y4m(2, 2, [bytes(12)], colorspace="C444")
    with pytest.raises(ValueError, match="magic"):
        y4m.decode_y4m(b"YUV4MPEG1 W2 H2\nFRAME\n" + bytes(12))
    with pytest.raises(ValueError, match="missing W"):
        y4m.decode_y4m(b"YUV4MPEG2 H2 C444\n")
    with pytest.raises(NotImplementedError, match="interlacing"):
        y4m.decode_y4m(b"YUV4MPEG2 W2 H2 It C444\nFRAME\n" + bytes(12))
    with pytest.raises(NotImplementedError, match="colourspace"):
        y4m.decode_y4m(b"YUV4MPEG2 W2 H2 C422\nFRAME\n" + bytes(8))
    with pytest.raises(ValueError, match="truncated frame"):
        y4m.decode_y4m(good[:-3])
    with pytest.raises(ValueError, match="FRAME marker"):
        y4m.decode_y4m(good + b"JUNK")


def test_sample_video_stats_matches_fixture_formula(spark):
    ids = spark.range(0, 24).selectExpr("id AS doc_id")
    media = M.y4m_media_from_ids(ids, id_col="doc_id")
    rows = M.sample_video_stats(media, frame_stride=2).collect()
    got = {(r.media_id, r.frame_idx): r for r in rows}
    expected_keys = set()
    for mid in range(24):
        w = 4 + mid % 5
        h = 4 + (mid // 5) % 5
        nf = 2 + mid % 4
        plane = w * h
        for f in range(0, nf, 2):
            expected_keys.add((mid, f))
            sums = [0, 0, 0]
            for p in range(3 * plane):
                sums[p // plane] += (mid * 17 + f * 251 + p) % 256
            r = got[(mid, f)]
            assert (r.width, r.height) == (w, h)
            assert [r.y_sum, r.u_sum, r.v_sum] == sums
    assert set(got) == expected_keys  # odd frames sampled out

    null_media = media.selectExpr(
        "media_id", "CAST(NULL AS BINARY) AS payload"
    ).limit(3)
    assert M.sample_video_stats(null_media).count() == 0


def test_sample_video_stats_c420_plane_layout(spark):
    # r11 advice: a C420 payload's chroma planes are quarter-size —
    # plane sums derived with C444 math would mis-slice U and zero V.
    # Build a C420 stream whose three plane sums are all distinct and
    # pin them exactly.
    import numpy as np

    from lab5_lakehouse_etl_spark.functions import y4m

    w, h = 6, 4
    yp = np.arange(w * h, dtype=np.int64) % 256
    up = (np.arange((w // 2) * (h // 2), dtype=np.int64) * 3 + 7) % 256
    vp = (np.arange((w // 2) * (h // 2), dtype=np.int64) * 5 + 11) % 256
    frame = np.concatenate([yp, up, vp]).astype(np.uint8).tobytes()
    data = y4m.encode_y4m(w, h, [frame], colorspace="C420")
    media = spark.createDataFrame(
        [(1, bytearray(data))], ["media_id", "payload"]
    )
    rows = M.sample_video_stats(media, frame_stride=1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.width, r.height, r.frame_idx) == (w, h, 0)
    assert [r.y_sum, r.u_sum, r.v_sum] == [
        int(yp.sum()),
        int(up.sum()),
        int(vp.sum()),
    ]
    # plane_sizes is the single source of the layout rule
    assert y4m.plane_sizes(w, h, "C420") == (24, 6)
    assert y4m.plane_sizes(w, h, "C444") == (24, 24)
    with pytest.raises(NotImplementedError, match="colourspace"):
        y4m.plane_sizes(w, h, "C422")


# ---------------------------------------------------------- real NN resize


@pytest.mark.parametrize("tw,th", [(16, 16), (4, 4)])
def test_resize_image_media_matches_nn_reference(spark, tw, th):
    # up- and down-scale against a brute-force nearest-neighbour
    # reference, through the full decode -> resample -> re-encode ->
    # re-decode chain (the output payload must be a valid PNG)
    from lab5_lakehouse_etl_spark.functions import png

    ids = spark.range(0, 12).selectExpr("id AS doc_id")
    media = M.png_media_from_ids(ids, id_col="doc_id")
    src = {r.media_id: bytes(r.payload) for r in media.collect()}
    out = {
        r.media_id: r
        for r in M.resize_image_media(media, width=tw, height=th).collect()
    }
    for mid, payload in src.items():
        w, h, c, px = png.decode_png(payload)
        rw, rh, rc, rpx = png.decode_png(bytes(out[mid].payload))
        assert (rw, rh, rc) == (tw, th, 3)
        for y in range(th):
            for x in range(tw):
                sy, sx = (y * h) // th, (x * w) // tw
                for ch in range(c):
                    assert (
                        rpx[(y * tw + x) * c + ch]
                        == px[(sy * w + sx) * c + ch]
                    )

    null_media = media.selectExpr(
        "media_id", "CAST(NULL AS BINARY) AS payload"
    ).limit(2)
    for r in M.resize_image_media(null_media).collect():
        assert r.payload is None


def test_resize_image_media_preserves_channel_count(spark):
    # r11 advice: non-RGB decodes (grayscale PNG/JPEG, grey+alpha,
    # RGBA) must re-encode with the MATCHING color type instead of
    # crashing in encode_png with a buffer-length error
    import numpy as np

    from lab5_lakehouse_etl_spark.functions import jpeg, png

    w, h = 10, 6
    rng = np.random.default_rng(5)
    payloads = {
        1: png.encode_png(
            w, h, rng.integers(0, 256, w * h, np.uint8).tobytes(),
            color_type=0,
        ),
        2: png.encode_png(
            w, h, rng.integers(0, 256, w * h * 2, np.uint8).tobytes(),
            color_type=4,
        ),
        4: png.encode_png(
            w, h, rng.integers(0, 256, w * h * 4, np.uint8).tobytes(),
            color_type=6,
        ),
        # grayscale JPEG decodes 1-channel through decode_image too
        5: jpeg.encode_jpeg(
            w, h, rng.integers(0, 256, w * h, np.uint8).tobytes()
        ),
    }
    media = spark.createDataFrame(
        [(mid, bytearray(p)) for mid, p in payloads.items()],
        ["media_id", "payload"],
    )
    out = {
        r.media_id: r
        for r in M.resize_image_media(media, width=4, height=4).collect()
    }
    expect_c = {1: 1, 2: 2, 4: 4, 5: 1}
    for mid, payload in payloads.items():
        sw, sh, sc, spx = M.decode_image(payload)
        rw, rh, rc, rpx = png.decode_png(bytes(out[mid].payload))
        assert (rw, rh, rc) == (4, 4, expect_c[mid])
        src = np.frombuffer(spx, np.uint8).reshape(sh, sw, sc)
        sy = (np.arange(4) * sh) // 4
        sx = (np.arange(4) * sw) // 4
        assert rpx == src[sy[:, None], sx[None, :], :].tobytes()


# --------------------------------------------------------------- JPEG codec


def test_jpeg_block_constant_exact_roundtrip():
    # the oracle-path invariant: constant 8x8 blocks + DC quantant 8
    # survive the lossy pipeline bit-exactly, across a multi-block
    # grid (DC differential coding crosses block boundaries)
    import numpy as np

    from lab5_lakehouse_etl_spark.functions import jpeg

    for mid in (0, 1, 5, 37, 123, 255):
        w = 8 * (2 + mid % 3)
        h = 8 * (2 + (mid // 3) % 3)
        bw = w // 8
        img = np.zeros((h, w), dtype=np.uint8)
        for by in range(h // 8):
            for bx in range(bw):
                img[by * 8 :, bx * 8 : bx * 8 + 8][:8] = (
                    mid * 37 + by * bw + bx
                ) % 256
        dw, dh, dc, px = jpeg.decode_jpeg(jpeg.encode_jpeg(w, h, img.tobytes()))
        assert (dw, dh, dc) == (w, h, 1)
        assert px == img.tobytes()


def test_jpeg_general_content_bounded_error():
    # with the all-ones quant table, loss reduces to coefficient
    # rounding: per-pixel error must stay tiny on arbitrary content,
    # including non-block-aligned dimensions (edge-replicated blocks)
    import numpy as np

    from lab5_lakehouse_etl_spark.functions import jpeg

    rng = np.random.default_rng(7)
    for w, h in ((40, 24), (21, 13), (8, 8), (17, 9)):
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        data = jpeg.encode_jpeg(w, h, img.tobytes(), quant=jpeg.LOSSLESS_QUANT)
        dw, dh, dc, px = jpeg.decode_jpeg(data)
        assert (dw, dh, dc) == (w, h, 1)
        err = np.abs(
            np.frombuffer(px, np.uint8).reshape(h, w).astype(int)
            - img.astype(int)
        )
        assert err.max() <= 4


def test_jpeg_entropy_coding_edge_cases():
    # ZRL (>15-zero runs) and byte stuffing: a block with exactly one
    # large AC coefficient far into the zigzag forces ZRL symbols, and
    # high-entropy content makes 0xFF bytes statistically certain
    import numpy as np

    from lab5_lakehouse_etl_spark.functions import jpeg

    # one hot pixel -> spread spectrum; checkerboard -> max-frequency AC
    img = np.zeros((8, 8), dtype=np.uint8)
    img[7, 7] = 255
    board = (np.indices((8, 8)).sum(axis=0) % 2 * 255).astype(np.uint8)
    for pic in (img, board):
        data = jpeg.encode_jpeg(8, 8, pic.tobytes(), quant=jpeg.LOSSLESS_QUANT)
        _, _, _, px = jpeg.decode_jpeg(data)
        err = np.abs(
            np.frombuffer(px, np.uint8).astype(int) - pic.reshape(-1).astype(int)
        )
        assert err.max() <= 4


def test_jpeg_rejects_malformed_and_out_of_scope():
    import struct

    import numpy as np

    from lab5_lakehouse_etl_spark.functions import jpeg

    good = jpeg.encode_jpeg(8, 8, bytes(64))
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_jpeg(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError, match="truncated JPEG segment"):
        jpeg.decode_jpeg(good[:10])
    with pytest.raises(ValueError, match="truncated JPEG entropy"):
        jpeg.decode_jpeg(good[:-4])
    # extended-sequential frame marker (SOF1) stays out of scope;
    # SOF2 progressive is SUPPORTED since r12 — flipping a baseline
    # stream's SOF to SOF2 leaves a baseline-style SOS (Se=63) that
    # the progressive scan validator rejects loudly instead
    bad = bytearray(good)
    sof_at = bytes(good).index(b"\xff\xc0")
    bad[sof_at + 1] = 0xC1
    with pytest.raises(NotImplementedError, match="SOF marker"):
        jpeg.decode_jpeg(bytes(bad))
    bad[sof_at + 1] = 0xC2
    with pytest.raises(ValueError, match="DC scan must have Se = 0"):
        jpeg.decode_jpeg(bytes(bad))
    # stream missing its SOF entirely: cut the frame segment out
    (sof_len,) = struct.unpack(">H", good[sof_at + 2 : sof_at + 4])
    with pytest.raises(ValueError, match="no SOF0"):
        jpeg.decode_jpeg(good[:sof_at] + good[sof_at + 2 + sof_len :])
    with pytest.raises(ValueError, match="expected 64"):
        jpeg.encode_jpeg(8, 8, bytes(63))
    with pytest.raises(ValueError, match="quant table entries"):
        jpeg.encode_jpeg(8, 8, bytes(64), quant=np.zeros((8, 8), int))


def test_decode_image_stats_jpeg_matches_fixture_formula(spark):
    ids = spark.range(0, 18).selectExpr("id AS doc_id")
    media = M.jpeg_media_from_ids(ids, id_col="doc_id")
    stats = {r.media_id: r for r in M.decode_image_stats(media).collect()}
    for mid in range(18):
        w = 8 * (2 + mid % 3)
        h = 8 * (2 + (mid // 3) % 3)
        expect = sum(
            64 * ((mid * 37 + bi) % 256) for bi in range((w // 8) * (h // 8))
        )
        r = stats[mid]
        assert (r.width, r.height, r.channels) == (w, h, 1)
        assert list(r.channel_sums) == [expect]


def test_decode_image_stats_jpeg420_matches_fixture_formula(spark):
    import numpy as np

    from lab5_lakehouse_etl_spark.functions import jpeg

    ids = spark.range(0, 12).selectExpr("id AS doc_id")
    media = M.jpeg420_media_from_ids(ids, id_col="doc_id")
    stats = {r.media_id: r for r in M.decode_image_stats(media).collect()}
    for mid in range(12):
        w = 16 * (1 + mid % 2)
        h = 16 * (1 + (mid // 2) % 2)
        sums = np.zeros(3, dtype=np.int64)
        for mi in range((w // 16) * (h // 16)):
            ycc = np.array(
                [
                    [
                        (mid * 11 + mi * 5 + b * 3) % 256,
                        (mid * 7 + mi * 5) % 256,
                        (mid * 13 + mi * 2) % 256,
                    ]
                    for b in range(4)
                ],
                dtype=np.float64,
            )
            sums += 64 * jpeg._ycbcr_to_rgb(ycc).astype(np.int64).sum(axis=0)
        r = stats[mid]
        assert (r.width, r.height, r.channels) == (w, h, 3)
        assert list(r.channel_sums) == sums.tolist()
    # the payloads genuinely carry subsampled chroma: the Cb/Cr planes
    # are quarter-size, so a 4:2:0 stream is smaller than the same
    # pixels at 4:4:4
    pay = {r.media_id: bytes(r.payload) for r in media.collect()}
    sof_at = pay[0].index(b"\xff\xc0")
    assert pay[0][sof_at + 11] == 0x22  # Y declared 2x2


def test_decode_image_stats_jpeg_prog_matches_fixture_formula(spark):
    import numpy as np

    from lab5_lakehouse_etl_spark.functions import jpeg

    ids = spark.range(0, 12).selectExpr("id AS doc_id")
    media = M.jpeg_prog_media_from_ids(ids, id_col="doc_id")
    stats = {r.media_id: r for r in M.decode_image_stats(media).collect()}
    for mid in range(12):
        w = 16 * (1 + mid % 2)
        h = 16 * (1 + (mid // 2) % 2)
        sums = np.zeros(3, dtype=np.int64)
        for mi in range((w // 16) * (h // 16)):
            ycc = np.array(
                [
                    [
                        (mid * 17 + mi * 7 + b * 5) % 256,
                        (mid * 5 + mi * 3) % 256,
                        (mid * 19 + mi * 11) % 256,
                    ]
                    for b in range(4)
                ],
                dtype=np.float64,
            )
            sums += 64 * jpeg._ycbcr_to_rgb(ycc).astype(np.int64).sum(axis=0)
        r = stats[mid]
        assert (r.width, r.height, r.channels) == (w, h, 3)
        assert list(r.channel_sums) == sums.tolist()
    # the payloads are genuinely PROGRESSIVE multi-scan streams: SOF2
    # frame marker, and one SOS per script entry (2 DC scans + 3
    # components x 2 bands x first+refine = 14)
    pay = bytes(
        media.filter("media_id = 0").collect()[0].payload
    )
    assert b"\xff\xc2" in pay and b"\xff\xc0" not in pay
    assert pay.count(b"\xff\xda") == 14


# -------------------------------------------------- cross-encoding dedup


def test_image_dedup_requires_decode_not_byte_hash(spark):
    # ids 0..19 with IMAGE_DEDUP_GROUPS temporarily tiny would need a
    # fixture override; instead use ids spanning one group boundary:
    # i and i+250 share pixels but not payload bytes
    ids = spark.createDataFrame(
        [(i,) for i in (0, 1, 2, 250, 251, 252, 500)], ["doc_id"]
    )
    media = M.png_variant_media_from_ids(ids, id_col="doc_id")
    rows = {r.media_id: bytes(r.payload) for r in media.collect()}
    # payload bytes DIFFER within a pixel-duplicate group (filters vary
    # with the full id) — a byte-hash dedup would find nothing
    assert rows[0] != rows[250] and rows[250] != rows[500]
    assert rows[1] != rows[251]
    # ...and the odd copies are genuinely DIFFERENT encodings: for
    # even group keys a palette PNG (the dedup must survive the PLTE
    # expansion); for odd keys a WHOLE DIFFERENT FORMAT — a lossless
    # WebP whose decoded RGBA canonicalizes to the PNG copies' RGB
    import struct

    def color_type(payload: bytes) -> int:
        ihdr_at = payload.index(b"IHDR")
        return struct.unpack(
            ">IIBBBBB", payload[ihdr_at + 4 : ihdr_at + 17]
        )[3]

    assert color_type(rows[0]) == 2 and color_type(rows[500]) == 2
    assert color_type(rows[250]) == 3  # key 0 (even): palette PNG
    assert b"PLTE" in rows[250] and b"PLTE" not in rows[0]
    assert rows[251][:4] == b"RIFF" and rows[251][8:16] == b"WEBPVP8L"
    fps = {r.media_id: r.pixel_fp for r in M.pixel_fingerprints(media).collect()}
    assert fps[0] == fps[250] == fps[500]
    assert fps[1] == fps[251]
    assert fps[2] == fps[252]
    assert len({fps[0], fps[1], fps[2]}) == 3  # distinct groups distinct
    # NULL payload -> NULL fingerprint (quarantine row)
    null_media = media.selectExpr(
        "media_id", "CAST(NULL AS BINARY) AS payload"
    ).limit(1)
    assert M.pixel_fingerprints(null_media).first().pixel_fp is None


def test_decode_or_quarantine_verdicts(spark):
    ids = spark.range(0, 21).selectExpr("id AS doc_id")
    media = M.corrupt_png_media_from_ids(ids, id_col="doc_id")
    rows = {r.media_id: r for r in M.decode_or_quarantine(media).collect()}
    for mid in range(21):
        r = rows[mid]
        if mid % 7 in (0, 3, 5):
            # PNG CRC flip / truncated VP8L (r12) / IFD-cut TIFF (r13)
            assert r.status == "corrupt" and r.width is None
        elif mid % 7 == 1:
            # r14: lossy VP8 stays 'unsupported' but the gate surfaces
            # the keyframe-header dimensions (hand-verifiable bits)
            assert r.status == "unsupported"
            assert (r.width, r.height) == (8 + mid % 9, 8 + (mid // 9) % 9)
        else:
            # kind 2 is a VALID lossless WebP (r12) and kind 4 a VALID
            # TIFF (r13): same dims formula, decoded through their own
            # real codec paths instead of PNG
            assert r.status == "ok"
            assert (r.width, r.height) == (8 + mid % 9, 8 + (mid // 9) % 9)
        # r14: EXIF presence flag — true exactly for the valid-TIFF arm
        assert r.has_exif == (mid % 7 == 4)
    # the webp/tiff kinds are genuinely those containers
    pay = {r.media_id: bytes(r.payload) for r in media.collect()}
    assert pay[2][:4] == b"RIFF" and pay[2][12:16] == b"VP8L"
    # kind 3 is the valid stream minus its last 3 bytes
    assert pay[3] == M._fixture_webp(3)[2][:-3]
    assert pay[4][:2] in (b"II", b"MM")
    # kind 5 is the valid TIFF cut 20 bytes into its trailing IFD
    assert pay[5] == M._fixture_tiff(5)[2][:-20]
    # NULL payloads get their own verdict, distinct from decode failure
    null_media = media.selectExpr(
        "media_id", "CAST(NULL AS BINARY) AS payload"
    ).limit(2)
    assert {r.status for r in M.decode_or_quarantine(null_media).collect()} == {
        "missing"
    }


def test_wav_y4m_parameter_validation():
    import numpy as np

    from lab5_lakehouse_etl_spark.functions import wav, y4m

    with pytest.raises(ValueError, match="channels >= 1"):
        wav.encode_wav(8000, 0, np.zeros(0, dtype="<i2"))
    with pytest.raises(ValueError, match="sample_rate >= 1"):
        wav.encode_wav(0, 1, np.zeros(4, dtype="<i2"))
    # C420 subsamples chroma 2x2: odd dims are unrepresentable and must
    # fail at both ends, not silently truncate the frame size
    with pytest.raises(ValueError, match="even dimensions"):
        y4m.encode_y4m(3, 2, [bytes(9)], colorspace="C420")
    with pytest.raises(ValueError, match="even dimensions"):
        y4m.decode_y4m(b"YUV4MPEG2 W3 H2 C420\nFRAME\n" + bytes(9))


def test_quarantine_catches_non_valueerror_damage(spark):
    # damage the codecs cannot pre-check: corrupt deflate bytes under a
    # RECOMPUTED (valid) CRC raise zlib.error, not ValueError — the
    # gate must classify it corrupt, never crash the batch
    import struct
    import zlib

    from lab5_lakehouse_etl_spark.functions import png

    data = bytearray(M._fixture_png(3)[2])
    idat_at = bytes(data).index(b"IDAT")
    (idat_len,) = struct.unpack(">I", data[idat_at - 4 : idat_at])
    data[idat_at + 4 + 2] ^= 0xFF  # inside the deflate stream
    payload = data[idat_at + 4 : idat_at + 4 + idat_len]
    crc = zlib.crc32(b"IDAT" + payload) & 0xFFFFFFFF
    struct.pack_into(">I", data, idat_at + 4 + idat_len, crc)
    with pytest.raises(zlib.error):
        png.decode_png(bytes(data))  # the raw codec raises zlib.error

    ids = spark.createDataFrame([(0,)], ["media_id"])
    import pandas as pd  # noqa: F401
    media = spark.createDataFrame(
        [(0, bytes(data), "image", "image/png", len(data))],
        schema=M.MEDIA_SCHEMA,
    )
    row = M.decode_or_quarantine(media).first()
    assert row.status == "corrupt" and row.width is None


# --------------------------------------------------------- color JPEG


def test_jpeg_color_block_constant_exact():
    # per-block-constant YCbCr survives the lossy pipeline exactly and
    # the decoder's half-up RGB conversion matches the reference
    # formula — across multi-block grids (three DC predictor chains)
    import numpy as np

    from lab5_lakehouse_etl_spark.functions import jpeg

    def ref(y, cb, cr):
        r = np.floor((y + 1.402 * (cr - 128.0)) + 0.5)
        g = np.floor(
            (y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)) + 0.5
        )
        b = np.floor((y + 1.772 * (cb - 128.0)) + 0.5)
        return [int(min(255, max(0, v))) for v in (r, g, b)]

    for mid in (0, 3, 7, 42, 101):
        w = 8 * (1 + mid % 2)
        h = 8 * (1 + (mid // 2) % 2)
        bw = w // 8
        img = np.zeros((h, w, 3), dtype=np.uint8)
        expect = np.zeros((h, w, 3), dtype=np.uint8)
        for by in range(h // 8):
            for bx in range(bw):
                bi = by * bw + bx
                y_, cb_, cr_ = (
                    (mid * 11 + bi * 3) % 256,
                    (mid * 7 + bi * 5) % 256,
                    (mid * 13 + bi * 2) % 256,
                )
                img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (y_, cb_, cr_)
                expect[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = ref(
                    float(y_), float(cb_), float(cr_)
                )
        data = jpeg.encode_jpeg(w, h, img.tobytes(), components=3)
        dw, dh, dc, px = jpeg.decode_jpeg(data)
        assert (dw, dh, dc) == (w, h, 3)
        assert px == expect.tobytes()


def test_jpeg_color_general_content_bounded_error():
    # decode(encode(ycc)) must equal the reference conversion of the
    # original YCbCr within the coefficient-rounding bound
    import numpy as np

    from lab5_lakehouse_etl_spark.functions import jpeg

    rng = np.random.default_rng(11)
    for w, h in ((24, 16), (21, 13)):
        ycc = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        data = jpeg.encode_jpeg(
            w, h, ycc.tobytes(), quant=jpeg.LOSSLESS_QUANT, components=3
        )
        dw, dh, dc, px = jpeg.decode_jpeg(data)
        assert (dw, dh, dc) == (w, h, 3)
        got = np.frombuffer(px, np.uint8).reshape(h, w, 3).astype(int)
        exp = jpeg._ycbcr_to_rgb(ycc).astype(int)
        assert np.abs(got - exp).max() <= 16

    # rgb -> ycbcr -> rgb inverts to within conversion rounding
    rgb = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    back = jpeg._ycbcr_to_rgb(jpeg.rgb_to_ycbcr(rgb)).astype(int)
    assert np.abs(back - rgb.astype(int)).max() <= 2


def test_jpeg_color_rejects_out_of_scope():
    import numpy as np

    from lab5_lakehouse_etl_spark.functions import jpeg

    with pytest.raises(NotImplementedError, match="component encode"):
        jpeg.encode_jpeg(8, 8, bytes(128), components=2)
    good = jpeg.encode_jpeg(
        8, 8, bytes(192), components=3, quant=jpeg.LOSSLESS_QUANT
    )
    # divisor subsampling is IN scope since r12; the scope boundary is
    # now spec-invalid factors (0 or >4) and non-divisor layouts
    bad = bytearray(good)
    sof_at = bytes(good).index(b"\xff\xc0")
    bad[sof_at + 11] = 0x02  # h=0: spec-invalid, not merely unsupported
    with pytest.raises(ValueError, match="outside 1..4"):
        jpeg.decode_jpeg(bytes(bad))
    # declaring 2x2 Y on a stream ENCODED at 4:4:4 now parses as a
    # (legal) 4:2:0 layout whose entropy stream is too short — a
    # malformed-stream error, never a silent wrong answer
    bad = bytearray(good)
    bad[sof_at + 11] = 0x22
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(bytes(bad))
    # scan covering only one of three frame components
    bad = bytearray(good)
    sos_at = bytes(good).index(b"\xff\xda")
    # rebuild a 1-component SOS in place is fiddly; instead corrupt the
    # scan's component id so it no longer matches the frame set
    bad[sos_at + 5] ^= 0x7F
    with pytest.raises(NotImplementedError, match="scan must cover"):
        jpeg.decode_jpeg(bytes(bad))
    assert np.frombuffer(
        jpeg.decode_jpeg(good)[3], np.uint8
    ).shape == (192,)


def test_decode_image_stats_jpeg_color_matches_fixture_formula(spark):
    ids = spark.range(0, 16).selectExpr("id AS doc_id")
    media = M.jpeg_color_media_from_ids(ids, id_col="doc_id")
    stats = {r.media_id: r for r in M.decode_image_stats(media).collect()}
    import numpy as np

    for mid in range(16):
        w = 8 * (1 + mid % 2)
        h = 8 * (1 + (mid // 2) % 2)
        sums = [0, 0, 0]
        for bi in range((w // 8) * (h // 8)):
            y_, cb_, cr_ = (
                float((mid * 11 + bi * 3) % 256),
                float((mid * 7 + bi * 5) % 256),
                float((mid * 13 + bi * 2) % 256),
            )
            r_ = np.floor((y_ + 1.402 * (cr_ - 128.0)) + 0.5)
            g_ = np.floor(
                (y_ - 0.344136 * (cb_ - 128.0) - 0.714136 * (cr_ - 128.0))
                + 0.5
            )
            b_ = np.floor((y_ + 1.772 * (cb_ - 128.0)) + 0.5)
            for c, v in enumerate((r_, g_, b_)):
                sums[c] += 64 * int(min(255, max(0, v)))
        row = stats[mid]
        assert (row.width, row.height, row.channels) == (w, h, 3)
        assert list(row.channel_sums) == sums


def test_image_histogram_features_match_fixture(spark):
    ids = spark.range(0, 12).selectExpr("id AS doc_id")
    media = M.png_media_from_ids(ids, id_col="doc_id")
    rows = {r.media_id: r for r in M.image_histogram_features(media).collect()}
    for mid in range(12):
        w = 8 + mid % 9
        h = 8 + (mid // 9) % 9
        expect = [0] * 8
        for i in range(w * h * 3):
            expect[((mid * 31 + i) % 256) // 32] += 1
        got = [getattr(rows[mid], f"h{i}") for i in range(8)]
        assert got == expect
        assert sum(got) == w * h * 3  # every sample lands in a bin
    null_media = media.selectExpr(
        "media_id", "CAST(NULL AS BINARY) AS payload"
    ).limit(2)
    for r in M.image_histogram_features(null_media).collect():
        assert all(getattr(r, f"h{i}") is None for i in range(8))


def test_av_quarantine_classifies_every_failure_kind(spark):
    """The audio/video gate's verdicts, pinned kind by kind — and the
    damaged payloads fail for the RIGHT reason (the FLAC flip is
    caught by the frame CRC-16, the WAV truncation by the chunk
    walk), not by accident of an earlier parse error."""
    import pytest

    from lab5_lakehouse_etl_spark.functions import flac, wav

    ids = spark.range(0, 16).selectExpr("id AS doc_id")
    media = M.corrupt_av_media_from_ids(ids, id_col="doc_id")
    out = {r.media_id: r for r in M.decode_or_quarantine_av(media).collect()}
    for mid in range(16):
        r = out[mid]
        kind = mid % 8
        assert r.modality == ("video" if kind in (6, 7) else "audio")
        want = {
            0: "ok", 1: "ok", 2: "corrupt", 3: "corrupt",
            4: "unsupported", 5: "missing", 6: "ok", 7: "corrupt",
        }[kind]
        assert r.status == want, (mid, kind, r.status)
        if kind == 0:
            assert r.n_frames == 32 + mid % 41
        elif kind == 1:
            assert r.n_frames == 40 + mid % 50
        elif kind == 6:
            assert r.n_frames == 2 + mid % 4
        else:
            assert r.n_frames is None
    # failure-reason pins (driver-side, no Spark)
    bad_flac = bytearray(M._fixture_flac(2)[3])
    bad_flac[-1] ^= 0x5A
    with pytest.raises(ValueError, match="CRC"):
        flac.decode_flac(bytes(bad_flac))
    good_wav = M._fixture_wav(3)[3]
    with pytest.raises(ValueError):
        wav.decode_wav(good_wav[: len(good_wav) // 2])


def test_tiff_decodes_java_imageio_goldens():
    """TIFF-LZW interop against an INDEPENDENT encoder: the committed
    goldens under tests/data/ were written by Java ImageIO's TIFF
    plugin (javax.imageio, JDK 17 — generation is documented in the
    r13 build notes: a deterministic LCG raster encoded with
    compression type "LZW").  The random 60x40 RGB stream crosses the
    9→10-bit width boundary hundreds of times, so the EARLY-change
    convention (functions/tiff.py `_lzw_decode`; GIF widens one code
    later) is pinned by external interop, not merely self-round-trip
    — getting the convention wrong desyncs within one boundary and
    cannot reproduce the raster."""
    import os

    import numpy as np

    from lab5_lakehouse_etl_spark.functions import tiff

    data_dir = os.path.join(os.path.dirname(__file__), "data")

    # LCG raster: s = s*6364136223846793005 + 1442695040888963407,
    # pixel = (s >> 40) & 0xFFFFFF as RGB
    w, h = 60, 40
    truth = open(os.path.join(data_dir, "golden_lzw_rand.rgb"), "rb").read()
    payload = open(
        os.path.join(data_dir, "golden_lzw_rand.tiff"), "rb"
    ).read()
    assert tiff.decode_tiff(payload) == (w, h, 3, truth)

    # formula raster: sample i = (7*23 + i*3) % 256 at 40x30
    payload = open(
        os.path.join(data_dir, "golden_lzw_formula.tiff"), "rb"
    ).read()
    W, H, C, px = tiff.decode_tiff(payload)
    assert (W, H, C) == (40, 30, 3)
    i = np.arange(40 * 30 * 3, dtype=np.int64)
    assert px == ((7 * 23 + i * 3) % 256).astype(np.uint8).tobytes()

    # PackBits + Deflate goldens (same ImageIO writer, 41x29 LCG
    # raster with planted constant runs so PackBits carries BOTH
    # packet kinds; ZLib-compressed twin for the deflate path)
    truth = open(
        os.path.join(data_dir, "golden_packbits_deflate.rgb"), "rb"
    ).read()
    for name in ("golden_packbits.tiff", "golden_deflate.tiff"):
        payload = open(os.path.join(data_dir, name), "rb").read()
        assert tiff.decode_tiff(payload) == (41, 29, 3, truth), name


def test_decode_image_dispatches_tiff(spark):
    """decode_image routes both TIFF byte orders by magic; the media
    fixture kinds all decode through decode_image_stats with the
    channel counts the oracle states."""
    import numpy as np

    from lab5_lakehouse_etl_spark.functions import tiff

    # magic routing, both byte orders
    gray = bytes(np.arange(12, dtype=np.uint8))
    for be in (False, True):
        payload = tiff.encode_tiff(4, 3, gray, channels=1, big_endian=be)
        assert M.decode_image(payload) == (4, 3, 1, gray)

    docs = load_table(spark, SF_DIR, "documents").limit(25)
    stats = M.decode_image_stats(
        M.tiff_media_from_ids(docs, id_col="doc_id")
    ).collect()
    assert len(stats) == 25
    for r in stats:
        kind = r.media_id % 9
        assert r.channels == (1 if kind in (0, 6, 7, 8) else 3)
        assert r.width == 8 + r.media_id % 9
        assert r.height == 8 + (r.media_id // 9) % 9


def test_g4_decodes_java_imageio_goldens():
    """CCITT G4 interop against an independent implementation: the
    committed goldens were written by Java ImageIO's "CCITT T.6"
    compressor.  golden_g4_sweep.tiff is the EXHAUSTIVE code-table
    verifier — 2700x5402, odd row y carrying a white run of exactly
    y//2 then black, even rows all white, so horizontal-mode MH codes
    for EVERY white and black run length 0..2700 appear and a single
    wrong table entry desynchronizes the row that exercises it.
    golden_g4_rand.tiff mixes sparse-document and noise content
    (vertical/pass-mode coverage) against a committed raw raster."""
    import os

    import numpy as np

    from lab5_lakehouse_etl_spark.functions import tiff

    data_dir = os.path.join(os.path.dirname(__file__), "data")
    payload = open(os.path.join(data_dir, "golden_g4_sweep.tiff"), "rb").read()
    W, H, C, px = tiff.decode_tiff(payload)
    assert (W, H, C) == (2700, 5402, 1)
    a = np.frombuffer(px, np.uint8).reshape(H, W)
    runs = np.where(np.arange(H) % 2 == 0, W, np.arange(H) // 2)
    exp = (np.arange(W)[None, :] < runs[:, None]).astype(np.uint8) * 255
    assert np.array_equal(a, exp)

    payload = open(os.path.join(data_dir, "golden_g4_rand.tiff"), "rb").read()
    truth = open(os.path.join(data_dir, "golden_g4_rand.gray"), "rb").read()
    assert tiff.decode_tiff(payload) == (321, 200, 1, truth)


def test_tiled_tiff_decodes_java_imageio_goldens():
    """Tiled TIFF interop: golden_tiled_lzw.tiff (32x32 LZW tiles)
    and golden_tiled_g4.tiff (32x16 CCITT G4 tiles) were written by
    Java ImageIO with explicit tiling over a 75x53 LCG raster —
    edge tiles are stored FULL SIZE and clipped on decode, and each
    tile is an independent compressed stream (our encoder's tiled
    output reads back through ImageIO too, checked at build time)."""
    import os

    from lab5_lakehouse_etl_spark.functions import tiff

    data_dir = os.path.join(os.path.dirname(__file__), "data")
    truth = open(os.path.join(data_dir, "golden_tiled.rgb"), "rb").read()
    payload = open(
        os.path.join(data_dir, "golden_tiled_lzw.tiff"), "rb"
    ).read()
    assert tiff.decode_tiff(payload) == (75, 53, 3, truth)
    truth = open(os.path.join(data_dir, "golden_tiled_g4.gray"), "rb").read()
    payload = open(
        os.path.join(data_dir, "golden_tiled_g4.tiff"), "rb"
    ).read()
    assert tiff.decode_tiff(payload) == (75, 53, 1, truth)


def test_g3_mh_decode_java_imageio_goldens():
    """Modified-Huffman (Compression 2, "CCITT RLE") and Group 3
    (Compression 3, "CCITT T.4" — which ImageIO writes in 2-D mode,
    T4Options=1, EOL + tag-bit rows) interop: both goldens carry the
    same 61x40 sparse-ink raster; our encoder's mh / g3-1D / g3-2D
    outputs read back through ImageIO at build time."""
    import os

    from lab5_lakehouse_etl_spark.functions import tiff

    data_dir = os.path.join(os.path.dirname(__file__), "data")
    truth = open(os.path.join(data_dir, "golden_g3.gray"), "rb").read()
    for name in ("golden_g3_mh.tiff", "golden_g3_t4.tiff"):
        payload = open(os.path.join(data_dir, name), "rb").read()
        assert tiff.decode_tiff(payload) == (61, 40, 1, truth), name


def test_phash_fixture_margins_and_exact_zero_recall():
    """The q_image_dedup_phash contract, pinned on ground truth:
    (a) exact pixel fingerprints score ZERO recall on every
    cross-variant planted pair (resize changes dims+pixels, JPEG
    changes pixels) — the gap the perceptual hash exists to close;
    (b) dHash puts every within-group pair at Hamming <= 2 and every
    cross-group pair at >= threshold+2, so the banded match with
    max_hamming=3 recovers exactly the mod-150 groups."""
    import hashlib
    import itertools

    import numpy as np

    from lab5_lakehouse_etl_spark.functions import multimodal as MM

    def payload(mid):
        # reuse the fixture's own encoder via a 1-row driver call is
        # heavyweight; replicate through the public cell grid instead
        from lab5_lakehouse_etl_spark.functions import jpeg, png

        g = mid % MM.PHASH_GROUPS
        copy = mid // MM.PHASH_GROUPS
        variant = copy % 3
        if variant == 2:
            cells = MM._phash_cells(g, flip=(1, 2))
            px = np.repeat(np.repeat(cells, 8, 0), 8, 1)
            return jpeg.encode_jpeg(
                72, 64, px.astype(np.uint8).tobytes(), restart_interval=copy
            )
        cells = MM._phash_cells(g)
        s = 16 if variant == 1 else 8
        px = np.repeat(np.repeat(cells, s, 0), s, 1)
        return png.encode_png(
            9 * s, 8 * s, px.astype(np.uint8).tobytes(), color_type=0,
            filter_of_row=lambda y: (y + copy) % 5,
        )

    def exact_fp(p):
        w, h, c, px = MM.decode_image(p)
        return hashlib.md5(f"{w}x{h}x{c}".encode() + px).hexdigest()

    def dh(p):
        w, h, c, px = MM.decode_image(p)
        img = np.frombuffer(px, np.uint8).reshape(h, w, c)
        luma = img[:, :, 0].astype(float)
        ys = [(j * h) // 8 for j in range(9)]
        xs = [(i * w) // 9 for i in range(10)]
        cells = np.empty((8, 9))
        for j in range(8):
            for i in range(9):
                cells[j, i] = luma[ys[j]:ys[j + 1], xs[i]:xs[i + 1]].mean()
        bits = 0
        for j in range(8):
            for i in range(8):
                if cells[j, i + 1] > cells[j, i]:
                    bits |= 1 << (j * 8 + i)
        return bits

    groups = list(range(0, 150, 11))
    worst_in, exact_hits = 0, 0
    hashes = {}
    for g in groups:
        trio = [payload(g), payload(g + 150), payload(g + 300)]
        fps = [exact_fp(p) for p in trio]
        # (a) exact fingerprints: all three variants pairwise distinct
        exact_hits += sum(a == b for a, b in itertools.combinations(fps, 2))
        hs = [dh(p) for p in trio]
        hashes[g] = hs[0]
        worst_in = max(
            worst_in,
            max(bin(a ^ b).count("1")
                for a, b in itertools.combinations(hs, 2)),
        )
    assert exact_hits == 0          # zero recall for the exact pass
    assert worst_in <= 2            # within-group: always matchable
    best_cross = min(
        bin(hashes[a] ^ hashes[b]).count("1")
        for a, b in itertools.combinations(groups, 2)
    )
    assert best_cross >= 5          # threshold 3 + >=2 bits headroom


def test_phash_dedup_groups_end_to_end(spark):
    """Distributed recall/precision pin at fixture scale: the banded
    dHash dedup recovers EXACTLY the planted mod-150 groups (recall
    1.0, no cross-group merge) on 450 media spanning all three
    variants."""
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id")
        .filter("doc_id < 450")  # ids 0..449: exactly 3 variants/group
    )
    media = M.phash_variant_media_from_ids(docs, id_col="doc_id")
    got = M.phash_dedup_groups(media, max_hamming=3).collect()
    assert len(got) == 450
    for r in got:
        assert r.canonical_id == r.media_id % 150
        assert r.group_size == 3


def test_afp_fixture_margins_and_exact_zero_recall(spark):
    """q_audio_dedup_fp ground truth: exact decoded-sample
    fingerprints score zero recall on every cross-variant planted
    pair (gain scaling and the DC+flip FLAC re-encode change every
    sample), while the energy hash keeps within-group pairs at
    Hamming <= 2 and distinct groups >= threshold+2 apart; the
    distributed matcher recovers exactly the mod-120 groups."""
    import hashlib
    import itertools

    import numpy as np

    from lab5_lakehouse_etl_spark.functions import flac, wav
    from lab5_lakehouse_etl_spark.functions import multimodal as MM

    def payload(mid):
        g = mid % MM.AFP_GROUPS
        copy = mid // MM.AFP_GROUPS
        v = copy % 3
        if v == 2:
            s = MM._afp_samples(g, flip=5) + 100
            return flac.encode_flac(8000, 1, s.astype("<i2"))
        s = MM._afp_samples(g)
        if v == 1:
            s = (s // 2).astype("<i2")
        return wav.encode_wav(8000, 1, s, info=f"copy{copy}".encode())

    def fp64(p):
        _r, ch, _n, samples = MM.decode_audio(p)
        x = np.asarray(samples, float)
        n = len(x) // 65
        x = x[: n * 65].reshape(65, n)
        x = x - x.mean(axis=1, keepdims=True)
        rms = np.sqrt((x * x).mean(axis=1))
        return sum(
            1 << f for f in range(64) if rms[f + 1] > rms[f]
        )

    groups = list(range(0, 120, 13))
    worst_in, exact_hits = 0, 0
    hashes = {}
    for g in groups:
        trio = [payload(g), payload(g + 120), payload(g + 240)]
        sample_fps = [
            hashlib.md5(
                np.asarray(MM.decode_audio(p)[3]).tobytes()
            ).hexdigest()
            for p in trio
        ]
        exact_hits += sum(
            a == b for a, b in itertools.combinations(sample_fps, 2)
        )
        hs = [fp64(p) for p in trio]
        hashes[g] = hs[0]
        worst_in = max(
            worst_in,
            max(bin(a ^ b).count("1")
                for a, b in itertools.combinations(hs, 2)),
        )
    assert exact_hits == 0
    assert worst_in <= 2
    best_cross = min(
        bin(hashes[a] ^ hashes[b]).count("1")
        for a, b in itertools.combinations(groups, 2)
    )
    assert best_cross >= 5
    # distributed end-to-end: exactly the planted groups
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id")
        .filter("doc_id < 360")  # ids 0..359: exactly 3 variants/group
    )
    got = M.afp_dedup_groups(
        M.afp_variant_media_from_ids(docs, id_col="doc_id")
    ).collect()
    assert len(got) == 360
    for r in got:
        assert r.canonical_id == r.media_id % 120
        assert r.group_size == 3


def test_jpeg_decodes_imageio_golden():
    """JPEG DECODE against an independent implementation — the
    validator class the r14 WebP refusal said lossy codecs need:
    bit-exact round-trip self-tests cannot catch a consistently-wrong
    IDCT, but JDK-17 javax.imageio ships an independent JPEG codec
    in-container.  ``golden_jpeg_ac.jpg`` was ENCODED by ImageIO
    (TYPE_BYTE_GRAY writer, default quality) from the closed-form
    AC-rich source below, and ``golden_jpeg_ac.gray`` is ImageIO's
    OWN decode of it (generation: tests/data/JpegProbe.java).  Our
    decoder must land within +-1 of ImageIO's on every sample — the
    JPEG-spec IDCT variance bound; a wrong IDCT constant or
    dequantization slip is a gross, not +-1, error."""
    import numpy as np

    DATA_DIR = os.path.join(os.path.dirname(__file__), "data")
    data = open(os.path.join(DATA_DIR, "golden_jpeg_ac.jpg"), "rb").read()
    w, h, c, px = M.decode_image(data)
    assert (w, h, c) == (48, 40, 1)
    ours = np.frombuffer(px, np.uint8).astype(int)
    their = np.frombuffer(
        open(os.path.join(DATA_DIR, "golden_jpeg_ac.gray"), "rb").read(),
        np.uint8,
    ).astype(int)
    d = np.abs(ours - their)
    assert d.max() <= 1
    assert float((d > 0).mean()) < 0.10  # agreement, not coincidence
    # and both stay near the closed-form source (lossy-quality bound)
    i = np.arange(w * h)
    src = ((i * 37 + (i // w) * 11 + (i % w) * (i // w) + 7) % 256).astype(int)
    assert np.abs(ours - src).max() <= 48  # measured 34 + margin


def test_jpeg_encode_imageio_decodes_live():
    """The ENCODE direction, live: ImageIO (via the committed
    JpegProbe class, JDK 17) decodes OUR encoder's output — both the
    block-flat phash fixture and an AC-rich gradient — and must agree
    with our decoder within the same +-1 IDCT bound.  Catches a
    consistently-wrong forward DCT / quantization / Huffman table in
    the encoder that our own decoder would silently invert."""
    import shutil
    import subprocess
    import tempfile

    import numpy as np

    from lab5_lakehouse_etl_spark.functions import jpeg
    from lab5_lakehouse_etl_spark.functions import multimodal as MM

    if shutil.which("java") is None:
        pytest.skip("no java runtime")
    DATA_DIR = os.path.join(os.path.dirname(__file__), "data")
    w, h = 48, 40
    i = np.arange(w * h)
    ac = ((i * 29 + (i % w) * (i // w) * 3 + 11) % 256).astype(np.uint8)
    flat = (
        np.repeat(np.repeat(MM._phash_cells(3), 8, 0), 8, 1)
        .astype(np.uint8)
        .reshape(-1)
    )
    for name, (ww, hh, px) in {
        "ac": (w, h, ac),
        "flat": (72, 64, flat),
    }.items():
        payload = jpeg.encode_jpeg(ww, hh, px.tobytes())
        with tempfile.TemporaryDirectory() as td:
            jp = os.path.join(td, "x.jpg")
            raw = os.path.join(td, "x.raw")
            open(jp, "wb").write(payload)
            r = subprocess.run(
                ["java", "-cp", DATA_DIR, "JpegProbe", "decode", jp, raw],
                capture_output=True, text=True, timeout=60,
            )
            assert r.returncode == 0, r.stderr[:300]
            assert r.stdout.split()[:3] == [str(ww), str(hh), "1"]
            their = np.frombuffer(
                open(raw, "rb").read(), np.uint8
            ).astype(int)
        _w, _h, _c, ourpx = M.decode_image(payload)
        ours = np.frombuffer(ourpx, np.uint8).astype(int)
        assert np.abs(ours - their).max() <= 1, name


def test_png_imageio_decodes_ours_bit_exact():
    """PNG interop, live: ImageIO (independent inflate + unfilter +
    color handling) decodes OUR encoder's output BIT-EXACTLY for all
    five color types — the default filter_of_row cycles all five
    scanline filters, so Paeth/avg/up/sub reconstruction is pinned
    against a second implementation, not just our own round trip.
    Palette PNGs come back from ImageIO as raw INDICES (its
    IndexColorModel raster); mapping them through the fixture's PLTE
    must reproduce our expanded RGB."""
    import shutil
    import subprocess
    import tempfile

    import numpy as np

    from lab5_lakehouse_etl_spark.functions import png

    if shutil.which("java") is None:
        pytest.skip("no java runtime")
    DATA_DIR = os.path.join(os.path.dirname(__file__), "data")
    w, h = 13, 9

    def imageio_decode(payload):
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "x.png")
            raw = os.path.join(td, "x.raw")
            open(p, "wb").write(payload)
            r = subprocess.run(
                ["java", "-cp", DATA_DIR, "JpegProbe", "decode", p, raw],
                capture_output=True, text=True, timeout=60,
            )
            assert r.returncode == 0, r.stderr[:300]
            ww, hh, b = map(int, r.stdout.split()[:3])
            return ww, hh, b, open(raw, "rb").read()

    cases = {
        0: bytes((x * 17 + y * 31) % 256 for y in range(h) for x in range(w)),
        2: bytes(
            (x * 7 + y * 13 + c * 41) % 256
            for y in range(h) for x in range(w) for c in range(3)
        ),
        4: bytes(
            (x * 9 + y * 27 + c * 101) % 256
            for y in range(h) for x in range(w) for c in range(2)
        ),
        6: bytes(
            (x * 3 + y * 5 + c * 23) % 256
            for y in range(h) for x in range(w) for c in range(4)
        ),
    }
    for ctype, px in cases.items():
        payload = png.encode_png(w, h, px, color_type=ctype)
        ww, hh, b, their = imageio_decode(payload)
        _w, _h, c, ours = M.decode_image(payload)
        assert (ww, hh, b) == (w, h, c), ctype
        assert their == ours, f"color_type {ctype} not bit-exact"
    # palette: ImageIO dumps indices; PLTE-map them to our RGB
    idx = bytes((x + y) % 5 for y in range(h) for x in range(w))
    pal = bytes((i * 37 + k * 11) % 256 for i in range(5) for k in range(3))
    payload = png.encode_png(w, h, idx, color_type=3, palette=pal)
    ww, hh, b, their_idx = imageio_decode(payload)
    assert (ww, hh, b) == (w, h, 1)
    _w, _h, c, ours = M.decode_image(payload)
    assert c == 3
    mapped = b"".join(pal[3 * i : 3 * i + 3] for i in their_idx)
    assert mapped == ours
    # and ImageIO's indices are OUR indices
    assert their_idx == idx


def test_gif_bmp_imageio_interop():
    """GIF + BMP interop, live: ImageIO decodes OUR encoders' output
    — BMP bit-exactly in BOTH row orders (bottom-up is the format's
    quirk an independent reader must agree on), GIF as raw palette
    indices that must equal OUR indices for both sequential and
    INTERLACED streams (the 4-pass interlace reconstruction pinned
    against a second implementation) and PLTE-map to our expanded
    RGBA."""
    import shutil
    import subprocess
    import tempfile

    from lab5_lakehouse_etl_spark.functions import bmp, gif

    if shutil.which("java") is None:
        pytest.skip("no java runtime")
    DATA_DIR = os.path.join(os.path.dirname(__file__), "data")

    def imageio_decode(payload, ext):
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "x." + ext)
            raw = os.path.join(td, "x.raw")
            open(p, "wb").write(payload)
            r = subprocess.run(
                ["java", "-cp", DATA_DIR, "JpegProbe", "decode", p, raw],
                capture_output=True, text=True, timeout=60,
            )
            assert r.returncode == 0, r.stderr[:300]
            ww, hh, b = map(int, r.stdout.split()[:3])
            return ww, hh, b, open(raw, "rb").read()

    w, h = 13, 9
    rgb = bytes(
        (x * 7 + y * 13 + c * 41) % 256
        for y in range(h) for x in range(w) for c in range(3)
    )
    for top_down in (False, True):
        payload = bmp.encode_bmp(w, h, rgb, top_down=top_down)
        ww, hh, b, their = imageio_decode(payload, "bmp")
        _w, _h, c, ours = M.decode_image(payload)
        assert (ww, hh, b) == (w, h, 3) and c == 3
        assert their == ours, f"bmp top_down={top_down}"

    idx = bytes((x * 2 + y) % 6 for y in range(h) for x in range(w))
    pal = bytes((i * 31 + k * 7) % 256 for i in range(6) for k in range(3))
    for interlace in (False, True):
        payload = gif.encode_gif(w, h, idx, pal, interlace=interlace)
        ww, hh, b, their_idx = imageio_decode(payload, "gif")
        assert (ww, hh, b) == (w, h, 1)
        assert their_idx == idx, f"gif interlace={interlace}"
        _w, _h, c, ours = M.decode_image(payload)
        assert c == 4
        mapped = b"".join(
            pal[3 * i : 3 * i + 3] + b"\xff" for i in their_idx
        )
        assert mapped == ours


def test_wav_javax_sound_interop():
    """WAV interop, live: javax.sound.sampled (an independent RIFF
    chunk walker) reads OUR encoder's output — format fields and
    sample bytes bit-exact, including the ancillary LIST/INFO chunk
    an independent reader must skip (generation:
    tests/data/WavProbe.java).  Also the reverse: our decoder reads
    the afp fixture's mono stream to the same samples javax dumps."""
    import shutil
    import subprocess
    import tempfile

    import numpy as np

    from lab5_lakehouse_etl_spark.functions import wav
    from lab5_lakehouse_etl_spark.functions import multimodal as MM

    if shutil.which("java") is None:
        pytest.skip("no java runtime")
    DATA_DIR = os.path.join(os.path.dirname(__file__), "data")

    def javax_decode(payload):
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "x.wav")
            raw = os.path.join(td, "x.raw")
            open(p, "wb").write(payload)
            r = subprocess.run(
                ["java", "-cp", DATA_DIR, "WavProbe", p, raw],
                capture_output=True, text=True, timeout=60,
            )
            assert r.returncode == 0, r.stderr[:300]
            rate, ch, bits, endian, _n = r.stdout.split()
            return (
                int(rate), int(ch), int(bits), endian,
                open(raw, "rb").read(),
            )

    s = (np.arange(4000) * 173 % 30000 - 15000).astype("<i2")
    payload = wav.encode_wav(8000, 2, s, info=b"interop")
    rate, ch, bits, endian, their = javax_decode(payload)
    assert (rate, ch, bits, endian) == (8000, 2, 16, "LE")
    _r, _c, _n, ours = M.decode_audio(payload)
    assert np.asarray(ours, "<i2").tobytes() == their

    # the perceptual-audio fixture's waveform through both readers
    fx = wav.encode_wav(8000, 1, MM._afp_samples(9), info=b"copy0")
    rate, ch, _b, _e, their = javax_decode(fx)
    assert (rate, ch) == (8000, 1)
    _r, _c, _n, ours = M.decode_audio(fx)
    assert np.asarray(ours, "<i2").tobytes() == their


def test_vfp_fixture_margins_and_end_to_end(spark):
    """q_video_dedup_fp ground truth: exact decoded-frame
    fingerprints score zero recall cross-variant (rescale changes
    dims+bytes, gain changes every luma), the temporal hash keeps
    within-group pairs at Hamming <= 2 vs cross-group >= threshold+2,
    and the distributed matcher recovers exactly the mod-100
    groups."""
    import hashlib
    import itertools

    import numpy as np

    from lab5_lakehouse_etl_spark.functions import multimodal as MM
    from lab5_lakehouse_etl_spark.functions import y4m

    def payload(mid):
        g = mid % MM.VFP_GROUPS
        copy = mid // MM.VFP_GROUPS
        v = copy % 3
        if v == 1:
            w, h, cs = 32, 24, "C420jpeg"
            lumas = MM._vfp_frame_lumas(g)
            fps = (25, 1)
        elif v == 2:
            w, h, cs = 16, 12, "C444"
            lumas = MM._vfp_frame_lumas(g, flip=5) // 2
            fps = (30, 1)
        else:
            w, h, cs = 16, 12, "C444"
            lumas = MM._vfp_frame_lumas(g)
            fps = (25, 1)
        cn = (w // 2) * (h // 2) if cs.startswith("C420") else w * h
        frames = [
            bytes([int(y)]) * (w * h) + bytes([128]) * (2 * cn)
            for y in lumas
        ]
        return y4m.encode_y4m(w, h, frames, fps=fps, colorspace=cs)

    def fp64(p):
        w, h, _f, _cs, frames = y4m.decode_y4m(p)
        means = [
            np.frombuffer(f[: w * h], np.uint8).mean()
            for _i, f in frames[:65]
        ]
        return sum(1 << f for f in range(64) if means[f + 1] > means[f])

    groups = list(range(0, 100, 9))
    worst_in, exact_hits = 0, 0
    hashes = {}
    for g in groups:
        trio = [payload(g), payload(g + 100), payload(g + 200)]
        frame_fps = [
            hashlib.md5(b"".join(f for _i, f in y4m.decode_y4m(p)[4])).hexdigest()
            for p in trio
        ]
        exact_hits += sum(
            a == b for a, b in itertools.combinations(frame_fps, 2)
        )
        hs = [fp64(p) for p in trio]
        hashes[g] = hs[0]
        worst_in = max(
            worst_in,
            max(bin(a ^ b).count("1")
                for a, b in itertools.combinations(hs, 2)),
        )
    assert exact_hits == 0
    assert worst_in <= 2
    best_cross = min(
        bin(hashes[a] ^ hashes[b]).count("1")
        for a, b in itertools.combinations(groups, 2)
    )
    assert best_cross >= 5
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id")
        .filter("doc_id < 300")  # ids 0..299: exactly 3 variants/group
    )
    got = M.vfp_dedup_groups(
        M.vfp_variant_media_from_ids(docs, id_col="doc_id")
    ).collect()
    assert len(got) == 300
    for r in got:
        assert r.canonical_id == r.media_id % 100
        assert r.group_size == 3


def test_chain_closure_is_load_bearing(spark):
    """q_image_dedup_chain's negative control: on the PATH-topology
    fixture (d(v0,v1)=d(v1,v2)=2, d(v0,v2)=4, threshold 3), the
    min-neighbor closure labels every v2 with v1's id — wrong — while
    closure='components' recovers exactly the planted mod-150 groups.
    Distances pinned on ground truth first so the test fails loudly
    if the fixture drifts rather than silently passing both
    closures."""
    import itertools

    import numpy as np

    from lab5_lakehouse_etl_spark.functions import multimodal as MM

    def dh(cells):
        bits = 0
        for j in range(8):
            for i in range(8):
                if cells[j, i + 1] > cells[j, i]:
                    bits |= 1 << (j * 8 + i)
        return bits

    for g in range(0, 150, 17):
        h0 = dh(MM._phash_cells(g))
        h1 = dh(MM._phash_cells(g, flips=((1, 2),)))
        h2 = dh(MM._phash_cells(g, flips=((1, 2), (3, 5))))
        assert bin(h0 ^ h1).count("1") == 2
        assert bin(h1 ^ h2).count("1") == 2
        assert bin(h0 ^ h2).count("1") == 4  # over threshold: a PATH

    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id")
        .filter("doc_id < 450")
    )
    media = MM.phash_chain_media_from_ids(docs, id_col="doc_id")
    fp = MM.dhash64(media).cache()
    fp.count()
    comp = MM.hamming_fp_groups(fp, max_hamming=3, closure="components")
    got = comp.collect()
    assert len(got) == 450
    for r in got:
        assert r.canonical_id == r.media_id % 150
        assert r.group_size == 3
    # the negative control: min-neighbor mislabels every v2
    naive = {
        r.media_id: r.canonical_id
        for r in MM.hamming_fp_groups(
            fp, max_hamming=3, closure="neighbors"
        ).collect()
    }
    wrong = [m for m in range(300, 450) if naive[m] != m % 150]
    assert len(wrong) == 150  # every chain tail, not an accident
    assert all(naive[m] == m % 150 + 150 for m in wrong)  # labeled v1
    fp.unpersist()


def test_hamming_matcher_viral_copy_guard(spark):
    """The exact-duplicate collapse, pinned at hostile scale: 50,000
    copies of ONE hash (the viral-boilerplate shape) plus two small
    near classes.  Pre-collapse this self-join emits ~10^10 candidate
    pairs (minutes-to-OOM); post-collapse the matcher sees 3 distinct
    hashes and finishes in seconds with the copies rejoined into one
    50,002-member group.  A wall-time bound makes the quadratic
    regression loud."""
    import time

    from pyspark.sql import functions as F

    from lab5_lakehouse_etl_spark.functions import multimodal as MM

    viral = spark.range(50_000).select(
        F.col("id").alias("media_id"), F.lit(0x5A5A5A5A).alias("phash")
    )
    near = spark.createDataFrame(
        [(90_000, 0x5A5A5A5B), (90_001, 0x5A5A0000)],
        "media_id long, phash long",
    )  # hamming 1 (joins the viral class) and 17 (its own class)
    t0 = time.time()
    out = MM.hamming_fp_groups(
        viral.unionByName(near), max_hamming=3
    ).collect()
    assert time.time() - t0 < 60
    by_canon = {}
    for r in out:
        by_canon.setdefault(r.canonical_id, []).append(r)
    assert len(by_canon[0]) == 50_001          # viral class + near dup
    assert all(r.group_size == 50_001 for r in by_canon[0])
    assert [r.media_id for r in by_canon[90_001]] == [90_001]
