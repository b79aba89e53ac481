"""Property-based round-trip tests for the pure-Python media codecs.

Hypothesis drives the shapes and contents the hand-written fixtures
can't enumerate: arbitrary dimensions (including 1-pixel-wide strides
and non-block-aligned JPEG edges), arbitrary payload bytes, every
PNG color type / filter mix, odd and even ancillary-chunk lengths.
The invariants are the codec contracts:

* PNG / WAV / Y4M are LOSSLESS — decode(encode(x)) == x exactly;
* baseline JPEG with the all-ones quant table is NEAR-lossless — the
  only loss is DCT-coefficient rounding, which bounds per-pixel error.

Examples are capped small (dims <= 24, frames <= 4) so the whole file
runs in seconds; the goal is branch coverage of the codecs' stride /
padding / entropy math, not data volume.
"""

from __future__ import annotations

import numpy as np
import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover - hypothesis is baked in
    pytest.skip("hypothesis not installed", allow_module_level=True)

from lab5_lakehouse_etl_spark.functions import flac, jpeg, png, wav, y4m

_SETTINGS = {"max_examples": 40, "deadline": None}


@settings(**_SETTINGS)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    color_type=st.sampled_from([0, 2, 4, 6]),
    seed=st.integers(0, 2**32 - 1),
)
def test_png_roundtrip_property(w, h, color_type, seed):
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, w * h * channels, dtype=np.uint8).tobytes()
    # filter choice keyed off the seed so all five filters rotate
    data = png.encode_png(
        w, h, px, color_type=color_type, filter_of_row=lambda y: (y + seed) % 5
    )
    assert png.decode_png(data) == (w, h, channels, px)


@settings(**_SETTINGS)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    n_entries=st.integers(1, 256),
    with_trns=st.booleans(),
    seed=st.integers(0, 2**32 - 1),
)
def test_png_palette_roundtrip_property(w, h, n_entries, with_trns, seed):
    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, 3 * n_entries, dtype=np.uint8).tobytes()
    idx = rng.integers(0, n_entries, w * h, dtype=np.uint8).tobytes()
    trns = (
        rng.integers(0, 256, rng.integers(0, n_entries + 1), dtype=np.uint8)
        .tobytes()
        if with_trns
        else None
    )
    data = png.encode_png(
        w,
        h,
        idx,
        color_type=3,
        palette=palette,
        trns=trns,
        filter_of_row=lambda y: (y + seed) % 5,
    )
    dw, dh, dc, px = png.decode_png(data)
    assert (dw, dh) == (w, h)
    if trns is None:
        assert dc == 3
        assert px == b"".join(palette[3 * i : 3 * i + 3] for i in idx)
    else:
        assert dc == 4
        assert px == b"".join(
            palette[3 * i : 3 * i + 3]
            + bytes([trns[i] if i < len(trns) else 255])
            for i in idx
        )


@settings(**_SETTINGS)
@given(
    rate=st.integers(1, 192_000),
    channels=st.integers(1, 4),
    frames=st.integers(0, 64),
    seed=st.integers(0, 2**32 - 1),
    info_len=st.one_of(st.none(), st.integers(0, 9)),
)
def test_wav_roundtrip_property(rate, channels, frames, seed, info_len):
    rng = np.random.default_rng(seed)
    samples = rng.integers(
        -32768, 32768, frames * channels, dtype=np.int64
    ).astype("<i2")
    info = None if info_len is None else b"IART" + b"x" * info_len
    out = wav.decode_wav(wav.encode_wav(rate, channels, samples, info=info))
    assert out[:3] == (rate, channels, frames)
    assert np.array_equal(out[3], samples)


@settings(**_SETTINGS)
@given(
    channels=st.integers(1, 2),
    frames=st.integers(0, 300),
    block_size=st.sampled_from([16, 64, 256, 300]),
    bits=st.sampled_from([8, 12, 16, 20, 24]),
    mode=st.sampled_from(
        ["independent", "mid_side", "left_side", "right_side"]
    ),
    shape=st.sampled_from(["noise", "smooth", "constant", "mixed"]),
    seed=st.integers(0, 2**32 - 1),
)
def test_flac_roundtrip_property(
    channels, frames, block_size, bits, mode, shape, seed
):
    # FLAC is LOSSLESS: decode(encode(x)) == x exactly for every
    # content shape (noise routes VERBATIM, smooth routes FIXED+Rice,
    # constant routes CONSTANT, mixed exercises per-block choice),
    # every stereo decorrelation mode, block size (incl. non-power-of
    # -two and 16-bit end-of-header forms) and sample width
    if mode != "independent" and channels != 2:
        mode = "independent"
    rng = np.random.default_rng(seed)
    n = frames * channels
    hi = 1 << (bits - 1)
    if shape == "noise":
        samples = rng.integers(-hi, hi, n, dtype=np.int64)
    elif shape == "constant":
        samples = np.full(n, int(rng.integers(-hi, hi)), dtype=np.int64)
    elif shape == "smooth":
        t = np.arange(n)
        samples = ((hi // 2) * np.sin(t / 9)).astype(np.int64)
    else:
        t = np.arange(n)
        samples = ((hi // 4) * np.sin(t / 5)).astype(
            np.int64
        ) + rng.integers(-3, 4, n)
    data = flac.encode_flac(
        44100,
        channels,
        samples,
        block_size=block_size,
        bits_per_sample=bits,
        stereo_mode=mode,
    )
    rate, ch, nf, out = flac.decode_flac(data)
    assert (rate, ch, nf) == (44100, channels, frames)
    assert np.array_equal(out, samples)


@settings(**_SETTINGS)
@given(
    w=st.integers(1, 16),
    h=st.integers(1, 16),
    n=st.integers(0, 4),
    stride=st.integers(1, 3),
    seed=st.integers(0, 2**32 - 1),
)
def test_y4m_roundtrip_and_stride_property(w, h, n, stride, seed):
    rng = np.random.default_rng(seed)
    frames = [
        rng.integers(0, 256, 3 * w * h, dtype=np.uint8).tobytes()
        for _ in range(n)
    ]
    data = y4m.encode_y4m(w, h, frames, colorspace="C444")
    dw, dh, _fps, _cs, out = y4m.decode_y4m(data, frame_stride=stride)
    assert (dw, dh) == (w, h)
    assert out == [(i, frames[i]) for i in range(0, n, stride)]


@settings(**_SETTINGS)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    seed=st.integers(0, 2**32 - 1),
)
def test_jpeg_bounded_error_property(w, h, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    data = jpeg.encode_jpeg(w, h, img.tobytes(), quant=jpeg.LOSSLESS_QUANT)
    dw, dh, dc, px = jpeg.decode_jpeg(data)
    assert (dw, dh, dc) == (w, h, 1)
    err = np.abs(
        np.frombuffer(px, np.uint8).reshape(h, w).astype(int) - img.astype(int)
    )
    assert err.max() <= 4


@settings(**_SETTINGS)
@given(
    bw=st.integers(1, 3),
    bh=st.integers(1, 3),
    seed=st.integers(0, 2**32 - 1),
)
def test_jpeg_block_constant_exact_property(bw, bh, seed):
    # the oracle-path invariant generalized: ANY per-block-constant
    # image decodes bit-exactly under the DC-quantant-8 table
    rng = np.random.default_rng(seed)
    img = np.repeat(
        np.repeat(rng.integers(0, 256, (bh, bw), dtype=np.uint8), 8, axis=0),
        8,
        axis=1,
    )
    data = jpeg.encode_jpeg(bw * 8, bh * 8, img.tobytes())
    assert jpeg.decode_jpeg(data)[3] == img.tobytes()


@settings(**_SETTINGS)
@given(
    bw=st.integers(1, 3),
    bh=st.integers(1, 3),
    seed=st.integers(0, 2**32 - 1),
)
def test_jpeg_color_block_constant_exact_property(bw, bh, seed):
    # ANY per-block-constant YCbCr image decodes to exactly the
    # reference conversion under the DC-quantant-8 table — the color
    # oracle-path invariant generalized beyond the fixture formula
    rng = np.random.default_rng(seed)
    blocks = rng.integers(0, 256, (bh, bw, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    data = jpeg.encode_jpeg(bw * 8, bh * 8, img.tobytes(), components=3)
    dw, dh, dc, px = jpeg.decode_jpeg(data)
    assert (dw, dh, dc) == (bw * 8, bh * 8, 3)
    assert px == jpeg._ycbcr_to_rgb(img).tobytes()


def _subsample_model(ycc: np.ndarray, sampling) -> np.ndarray:
    """Reference model of the subsampled round trip MINUS quantization:
    per-component half-up box downsample then replication upsample —
    computed independently of the codec's own helpers' call path."""
    h, w, _ = ycc.shape
    hmax = max(sh for sh, _ in sampling)
    vmax = max(sv for _, sv in sampling)
    out = np.empty_like(ycc)
    for c, (sh, sv) in enumerate(sampling):
        ry, rx = vmax // sv, hmax // sh
        oh, ow = -(-h // ry), -(-w // rx)
        padded = np.pad(
            ycc[..., c], ((0, oh * ry - h), (0, ow * rx - w)), mode="edge"
        ).astype(np.int64)
        s = padded.reshape(oh, ry, ow, rx).sum(axis=(1, 3))
        small = (2 * s + ry * rx) // (2 * ry * rx)
        rows = (np.arange(h) * sv) // vmax
        cols = (np.arange(w) * sh) // hmax
        out[..., c] = small[rows][:, cols].astype(np.uint8)
    return out


@settings(**_SETTINGS)
@given(
    mw=st.integers(1, 3),
    mh=st.integers(1, 3),
    sampling=st.sampled_from(
        [
            [(2, 2), (1, 1), (1, 1)],  # 4:2:0
            [(2, 1), (1, 1), (1, 1)],  # 4:2:2
            [(1, 2), (1, 1), (1, 1)],  # 4:4:0 (vertical-only)
            [(4, 1), (1, 1), (1, 1)],  # 4:1:1
            [(2, 2), (2, 1), (1, 1)],  # mixed divisor layout
        ]
    ),
    seed=st.integers(0, 2**32 - 1),
)
def test_jpeg_subsampled_mcu_constant_exact_property(mw, mh, sampling, seed):
    # the 4:2:0-oracle invariant generalized to every divisor layout:
    # Y constant per 8x8 DATA UNIT (so the within-MCU walk order is
    # load-bearing at full-pixel-array grain, not just in sums),
    # chroma constant per MCU -> box downsample, quantization and
    # replication upsample are all exact, leaving only the half-up
    # conversion between input and output
    rng = np.random.default_rng(seed)
    hmax = max(sh for sh, _ in sampling)
    vmax = max(sv for _, sv in sampling)
    w, h = mw * 8 * hmax, mh * 8 * vmax
    img = np.zeros((h, w, 3), dtype=np.uint8)
    for my in range(mh):
        for mx in range(mw):
            cb, cr = rng.integers(0, 256, 2)
            r0, c0 = my * 8 * vmax, mx * 8 * hmax
            img[r0 : r0 + 8 * vmax, c0 : c0 + 8 * hmax, 1] = cb
            img[r0 : r0 + 8 * vmax, c0 : c0 + 8 * hmax, 2] = cr
            for by in range(vmax):
                for bx in range(hmax):
                    img[
                        r0 + by * 8 : r0 + by * 8 + 8,
                        c0 + bx * 8 : c0 + bx * 8 + 8,
                        0,
                    ] = rng.integers(0, 256)
    # chroma must also be constant per ITS OWN data unit: constant per
    # MCU guarantees that for every divisor layout above
    data = jpeg.encode_jpeg(
        w, h, img.tobytes(), components=3, sampling=sampling
    )
    dw, dh, dc, px = jpeg.decode_jpeg(data)
    assert (dw, dh, dc) == (w, h, 3)
    assert px == jpeg._ycbcr_to_rgb(_subsample_model(img, sampling)).tobytes()
    # and for these MCU-constant-chroma fixtures the model's
    # downsample/upsample is the identity, so the conversion of the
    # ORIGINAL pixels is the same pin stated two ways
    assert px == jpeg._ycbcr_to_rgb(img).tobytes()


@settings(**_SETTINGS)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    sampling=st.sampled_from(
        [[(2, 2), (1, 1), (1, 1)], [(2, 1), (1, 1), (1, 1)]]
    ),
    seed=st.integers(0, 2**32 - 1),
)
def test_jpeg_subsampled_boundary_bounded_error_property(w, h, sampling, seed):
    # subsampling-boundary pin (r11 verdict next-round #1): ARBITRARY
    # dims — odd widths, 1-pixel images, non-MCU-aligned edges — with
    # ARBITRARY content.  The decode must equal the reference model
    # (half-up box downsample + replication upsample, computed
    # independently above) to within DCT-coefficient rounding of each
    # plane through the conversion's coefficient mass (<= ~2 + 2*2.2).
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    data = jpeg.encode_jpeg(
        w,
        h,
        img.tobytes(),
        quant=jpeg.LOSSLESS_QUANT,
        components=3,
        sampling=sampling,
    )
    dw, dh, dc, px = jpeg.decode_jpeg(data)
    assert (dw, dh, dc) == (w, h, 3)
    model = jpeg._ycbcr_to_rgb(_subsample_model(img, sampling)).astype(int)
    got = np.frombuffer(px, np.uint8).reshape(h, w, 3).astype(int)
    assert np.abs(got - model).max() <= 8


def test_jpeg_subsampling_scope_and_single_component_rules():
    # non-divisor layouts refuse loudly on BOTH sides
    with pytest.raises(NotImplementedError, match="non-divisor"):
        jpeg.encode_jpeg(
            8,
            8,
            bytes(8 * 8 * 3),
            components=3,
            sampling=[(3, 1), (2, 1), (1, 1)],
        )
    good = jpeg.encode_jpeg(
        16,
        16,
        bytes(16 * 16 * 3),
        components=3,
        sampling=[(2, 2), (1, 1), (1, 1)],
    )
    sof_at = bytes(good).index(b"\xff\xc0")
    bad = bytearray(good)
    bad[sof_at + 11] = 0x32  # comp 0: 3x2 vs comp 1's 2x? -> non-divisor
    bad[sof_at + 14] = 0x21
    with pytest.raises(NotImplementedError, match="non-divisor"):
        jpeg.decode_jpeg(bytes(bad))
    # factor 0 / >4 is spec-invalid, not merely unsupported
    bad = bytearray(good)
    bad[sof_at + 11] = 0x50
    with pytest.raises(ValueError, match="outside 1..4"):
        jpeg.decode_jpeg(bytes(bad))
    # a single-component scan is NON-interleaved: declared sampling
    # factors must not change the decode (T.81 A.2.2)
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    gray = jpeg.encode_jpeg(
        16, 16, img.tobytes(), quant=jpeg.LOSSLESS_QUANT
    )
    sof_at = bytes(gray).index(b"\xff\xc0")
    patched = bytearray(gray)
    assert patched[sof_at + 11] == 0x11
    patched[sof_at + 11] = 0x22
    assert jpeg.decode_jpeg(bytes(patched)) == jpeg.decode_jpeg(gray)


@settings(**_SETTINGS)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 20),
    seed=st.integers(0, 2**32 - 1),
)
def test_jpeg_color_bounded_error_property(w, h, seed):
    rng = np.random.default_rng(seed)
    ycc = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    data = jpeg.encode_jpeg(
        w, h, ycc.tobytes(), quant=jpeg.LOSSLESS_QUANT, components=3
    )
    dw, dh, dc, px = jpeg.decode_jpeg(data)
    assert (dw, dh, dc) == (w, h, 3)
    got = np.frombuffer(px, np.uint8).reshape(h, w, 3).astype(int)
    exp = jpeg._ycbcr_to_rgb(ycc).astype(int)
    assert np.abs(got - exp).max() <= 16


@settings(**_SETTINGS)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    layout=st.sampled_from(
        [
            (1, None),
            (3, [(1, 1), (1, 1), (1, 1)]),
            (3, [(2, 2), (1, 1), (1, 1)]),
            (3, [(2, 1), (1, 1), (1, 1)]),
            (3, [(1, 2), (1, 1), (1, 1)]),
        ]
    ),
    lossless=st.booleans(),
    seed=st.integers(0, 2**32 - 1),
)
def test_jpeg_progressive_equals_baseline_property(w, h, layout, lossless, seed):
    """Progressive transmission is LOSSLESS: once every scan lands,
    the accumulated coefficients equal the baseline encoding's
    bit-for-bit, so decode(progressive(x)) must equal
    decode(baseline(x)) BYTE-IDENTICALLY for arbitrary content — this
    one invariant pins the whole multi-scan entropy layer (DC
    first/refine, AC first/refine, cross-block EOB runs, buffered
    correction bits, ZRL-in-refinement) against the already-pinned
    baseline path, on every sampling layout and both quant tables."""
    comps, sampling = layout
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=w * h * comps, dtype=np.uint8).tobytes()
    quant = jpeg.LOSSLESS_QUANT if lossless else jpeg.ORACLE_QUANT
    base = jpeg.encode_jpeg(
        w, h, px, quant=quant, components=comps, sampling=sampling
    )
    prog = jpeg.encode_jpeg_progressive(
        w, h, px, quant=quant, components=comps, sampling=sampling
    )
    assert jpeg.decode_jpeg(prog) == jpeg.decode_jpeg(base)


@settings(**_SETTINGS)
@given(
    w=st.integers(17, 64),
    h=st.integers(17, 64),
    n_spikes=st.integers(0, 6),
    seed=st.integers(0, 2**32 - 1),
)
def test_jpeg_progressive_sparse_content_property(w, h, n_spikes, seed):
    """Mostly-flat images with isolated spikes drive the progressive
    entropy coder's rare branches: multi-block EOB runs with embedded
    correction bits (a spike block's neighbours are pure EOB), ZRL
    runs inside refinement scans (long zero gaps before a
    high-frequency newly-nonzero coefficient), and the
    buffered-bit-ordering split between a pending EOB run's bits and
    the current block's bits."""
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 128, np.uint8)
    for _ in range(n_spikes):
        img[rng.integers(0, h), rng.integers(0, w)] = rng.integers(0, 256)
    px = img.tobytes()
    base = jpeg.encode_jpeg(w, h, px, quant=jpeg.LOSSLESS_QUANT)
    prog = jpeg.encode_jpeg_progressive(w, h, px, quant=jpeg.LOSSLESS_QUANT)
    assert jpeg.decode_jpeg(prog) == jpeg.decode_jpeg(base)


@settings(**_SETTINGS)
@given(
    w=st.integers(1, 48),
    h=st.integers(1, 48),
    comps=st.sampled_from([1, 3]),
    dri=st.integers(1, 7),
    progressive=st.booleans(),
    seed=st.integers(0, 2**32 - 1),
)
def test_jpeg_restart_interval_property(w, h, comps, dri, progressive, seed):
    """Restart intervals are pure resync structure: a stream encoded
    with DRI/RSTn markers (DC predictors reset, EOB runs flushed at
    every boundary) must decode byte-identically to the same pixels
    encoded without restarts — for baseline AND progressive, any
    interval, any sampling layout."""
    rng = np.random.default_rng(seed)
    sampling = None if comps == 1 else [(2, 2), (1, 1), (1, 1)]
    px = rng.integers(0, 256, size=w * h * comps, dtype=np.uint8).tobytes()
    enc = jpeg.encode_jpeg_progressive if progressive else jpeg.encode_jpeg
    plain = enc(w, h, px, components=comps, sampling=sampling)
    rst = enc(
        w, h, px, components=comps, sampling=sampling, restart_interval=dri
    )
    assert jpeg.decode_jpeg(rst) == jpeg.decode_jpeg(plain)
    # interval 1 on a multi-MCU image genuinely carries RST markers
    if dri == 1 and (w > 8 * (2 if comps == 3 else 1) or h > 8 * (2 if comps == 3 else 1)):
        assert any(
            bytes([0xFF, 0xD0 + i]) in rst for i in range(8)
        )


def test_jpeg_restart_sync_loss_fails_loudly():
    """A missing/mangled RSTn marker is lost sync — the decoder must
    raise, never emit silently wrong pixels."""
    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, size=32 * 32, dtype=np.uint8).tobytes()
    data = bytearray(jpeg.encode_jpeg(32, 32, px, restart_interval=1))
    at = data.index(bytes([0xFF, 0xD0]))
    data[at + 1] = 0xD5  # wrong sequence number
    with pytest.raises(ValueError, match="restart"):
        jpeg.decode_jpeg(bytes(data))


from lab5_lakehouse_etl_spark.functions import webp  # noqa: E402


@settings(**_SETTINGS)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    shape=st.sampled_from(
        ["plain", "sg", "pred", "ct", "cache", "stack"]
    ),
    mode=st.integers(0, 13),
    seed=st.integers(0, 2**32 - 1),
)
def test_webp_roundtrip_property(w, h, shape, mode, seed):
    """VP8L is LOSSLESS: decode(encode(x)) == x byte-for-byte for
    arbitrary RGBA content under every encoding shape — literals,
    subtract-green, each of the 14 predictor modes, arbitrary color
    transforms, the color cache, and stacked transforms."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, w * h * 4, dtype=np.uint8).tobytes()
    kwargs = {
        "plain": {},
        "sg": {"subtract_green": True},
        "pred": {"predictor_mode": mode},
        "ct": {
            "color_transform": tuple(
                int(v) for v in rng.integers(0, 256, 3)
            )
        },
        "cache": {"cache_bits": 1 + mode % 11},
        "stack": {
            "predictor_mode": mode,
            "color_transform": (34, 200, 17),
            "subtract_green": True,
        },
    }[shape]
    data = webp.encode_webp(w, h, px, **kwargs)
    assert webp.decode_webp(data) == (w, h, 4, px)


@settings(**_SETTINGS)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    n_colors=st.integers(1, 17),
    rle=st.booleans(),
    seed=st.integers(0, 2**32 - 1),
)
def test_webp_palette_and_rle_roundtrip_property(w, h, n_colors, rle, seed):
    """Palette images round-trip across every bundling width (1/2/4/8
    bits per index) and RLE runs through the real length/distance
    prefix machinery."""
    rng = np.random.default_rng(seed)
    colors = rng.integers(0, 256, (max(n_colors, 2), 4), dtype=np.uint8)
    idx = rng.integers(0, len(colors), w * h)
    px = colors[idx].reshape(-1).tobytes()
    data = webp.encode_webp(w, h, px, palette=not rle, rle=rle)
    assert webp.decode_webp(data) == (w, h, 4, px)


def test_webp_distance_map_matches_spec():
    """The generated 120-entry LZ77 neighborhood table equals the
    published spec table (spot-pinned at the head, documented interior
    landmarks, and the tail)."""
    m = webp._DIST_MAP
    assert len(m) == 120
    assert m[:16] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    ]
    assert m[34] == (0, 5) and m[96] == (8, 0) and m[97] == (4, 7)
    assert m[-4:] == [(7, 7), (-7, 7), (8, 6), (8, 7)]


def test_webp_rejects_malformed_and_out_of_scope():
    import numpy as np

    with pytest.raises(ValueError, match="RIFF"):
        webp.decode_webp(b"not webp")
    with pytest.raises(NotImplementedError, match="VP8L"):
        webp.decode_webp(b"RIFF\x24\x00\x00\x00WEBPVP8 " + bytes(24))
    with pytest.raises(NotImplementedError, match="VP8X"):
        webp.decode_webp(b"RIFF\x24\x00\x00\x00WEBPVP8X" + bytes(24))
    good = webp.encode_webp(4, 4, bytes(64))
    with pytest.raises(ValueError, match="truncated"):
        webp.decode_webp(good[:-3])
    with pytest.raises(ValueError, match="signature"):
        webp.decode_webp(good[:20] + b"\x00" + good[21:])
    with pytest.raises(ValueError):
        webp.encode_webp(4, 4, bytes(63))


def test_vp8_lossy_dimensions_header_bits():
    """The lossy-VP8 keyframe header is plain bit fields (RFC 6386
    §9.1) — hand-built streams pin the frame tag / start code / 14-bit
    dimension parsing, and every refusal path stays loud.  Pixel
    decode remains NotImplementedError (the r14 spike's documented
    refusal: no external VP8 validator exists in this container)."""
    import struct

    def vp8(frame: bytes) -> bytes:
        chunk = b"VP8 " + struct.pack("<I", len(frame)) + frame
        return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk

    def frame(w, h, tag=(1 << 4) | (8 << 5)):
        return (
            bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
            + b"\x9d\x01\x2a"
            + bytes([w & 0xFF, w >> 8, h & 0xFF, h >> 8])
            + bytes(8)
        )

    assert webp.vp8_lossy_dimensions(vp8(frame(320, 240))) == (320, 240)
    # 14-bit fields with upscale hints in the top 2 bits: masked off
    wv = 0x3FFF | (2 << 14)
    hv = 1 | (3 << 14)
    assert webp.vp8_lossy_dimensions(vp8(frame(wv, hv))) == (0x3FFF, 1)
    # pixel decode still refuses on the same container
    with pytest.raises(NotImplementedError, match="VP8L"):
        webp.decode_webp(vp8(frame(320, 240)))
    with pytest.raises(ValueError, match="interframe"):  # frame-type bit
        webp.vp8_lossy_dimensions(vp8(frame(320, 240, tag=1)))
    with pytest.raises(ValueError, match="start code"):
        bad = frame(320, 240)
        webp.vp8_lossy_dimensions(vp8(bad[:3] + b"\x9d\x01\x2b" + bad[6:]))
    with pytest.raises(ValueError, match="truncated"):
        webp.vp8_lossy_dimensions(vp8(frame(320, 240)[:8]))
    with pytest.raises(ValueError, match="zero"):
        webp.vp8_lossy_dimensions(vp8(frame(0, 240)))
    with pytest.raises(ValueError, match="lossy"):
        webp.vp8_lossy_dimensions(b"RIFF\x24\x00\x00\x00WEBPVP8L" + bytes(24))


def _vp8l_header(w, width, height):
    w.write(0x2F, 8)
    w.write(width - 1, 14)
    w.write(height - 1, 14)
    w.write(0, 1)  # alpha hint
    w.write(0, 3)  # version


def _wrap_vp8l(body: bytes) -> bytes:
    import struct

    chunk = b"VP8L" + struct.pack("<I", len(body)) + body + (
        b"\x00" if len(body) & 1 else b""
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def test_webp_meta_prefix_groups_decode():
    """Decoder path the fixture encoder never emits: a META prefix
    image splitting the image into two tile columns, each with its own
    prefix-code group (single-symbol codes -> zero bits per pixel).
    Left tile must decode to color A, right tile to color B — group
    selection per (red << 8 | green) of the entropy-image pixel."""
    w = webp._LsbWriter()
    _vp8l_header(w, 16, 1)
    w.write(0, 1)  # no transforms
    w.write(0, 1)  # no color cache
    w.write(1, 1)  # meta prefix image present
    w.write(0, 3)  # meta_bits = 3 (8-px tiles) -> entropy image 2x1
    # entropy image (nested): no cache bit=0, then 5 codes; green must
    # emit group indices 0 then 1 -> two-symbol simple code, others
    # single-symbol
    w.write(0, 1)  # nested cache bit
    w.write(1, 1)  # green: simple
    w.write(1, 1)  # 2 symbols
    w.write(0, 1)  # first symbol in 1 bit
    w.write(0, 1)  # symbol 0
    w.write(1, 8)  # symbol 1
    for _ in range(3):  # red, blue, alpha = 0
        webp._write_code_single(w, 0)
    webp._write_code_single(w, 0)  # distance
    w.write(0, 1)  # entropy pixel (0,0): green=0 (code 0, 1 bit)
    w.write(1, 1)  # entropy pixel (1,0): green=1
    # two groups, constant colors A=(a=255, r=1, g=2, b=3), B=(255,9,8,7)
    for r_, g_, b_ in ((1, 2, 3), (9, 8, 7)):
        webp._write_code_single(w, g_)  # green
        webp._write_code_single(w, r_)  # red
        webp._write_code_single(w, b_)  # blue
        webp._write_code_single(w, 255)  # alpha
        webp._write_code_single(w, 0)  # distance
    # pixels: all codes single-symbol -> zero bits
    dw, dh, dc, px = webp.decode_webp(_wrap_vp8l(w.flush()))
    assert (dw, dh, dc) == (16, 1, 4)
    import numpy as np

    arr = np.frombuffer(px, np.uint8).reshape(16, 4)
    assert (arr[:8] == [1, 2, 3, 255]).all()
    assert (arr[8:] == [9, 8, 7, 255]).all()


def test_webp_clc_repeats_and_max_symbol_decode():
    """Decoder paths the fixture encoder never emits: zero-run repeat
    op 18 and the MAX-SYMBOL limit field.  Green lengths [1, 2, 2]
    (complete: 1/2 + 1/4 + 1/4) are transmitted as three literals and
    an 18-run for the tail, with the max-symbol field capping the CLC
    reads at exactly 4; then two pixels decode through the resulting
    code."""
    clc_lengths = {18: 2, 1: 2, 2: 2, 16: 2}
    w2 = webp._LsbWriter()
    _vp8l_header(w2, 2, 1)
    w2.write(0, 1); w2.write(0, 1); w2.write(0, 1)
    w2.write(0, 1)  # not simple
    w2.write(19 - 4, 4)
    for sym in webp._CLC_ORDER:
        w2.write(clc_lengths.get(sym, 0), 3)
    w2.write(1, 1)  # max-symbol field present
    w2.write(0, 3)  # length_nbits = 2
    w2.write(2, 2)  # max_symbol = 2 + 2 = 4 CLC reads allowed

    def clc2(sym):
        # CLC canonical over {1,2,16,18}, all length 2, symbol order
        code = {1: 0b00, 2: 0b01, 16: 0b10, 18: 0b11}[sym]
        w2.write(webp._rev(code, 2), 2)

    clc2(1)         # lengths[0] = 1
    clc2(2)         # lengths[1] = 2
    clc2(2)         # lengths[2] = 2
    clc2(18)        # zero run covers the tail
    w2.write(127, 7)
    # green canonical: 0 -> "0", 1 -> "10", 2 -> "11"
    for v in (5, 6, 255):
        webp._write_code_single(w2, v)
    webp._write_code_single(w2, 0)
    w2.write(webp._rev(0b10, 2), 2)  # pixel 0: green 1
    w2.write(webp._rev(0b11, 2), 2)  # pixel 1: green 2
    dw, dh, dc, px = webp.decode_webp(_wrap_vp8l(w2.flush()))
    import numpy as np

    arr = np.frombuffer(px, np.uint8).reshape(2, 4)
    assert (arr[0] == [5, 1, 6, 255]).all()
    assert (arr[1] == [5, 2, 6, 255]).all()


def test_webp_clc_repeat16_decode():
    """Repeat op 16 (copy previous nonzero length 3-6 times): build
    green lengths [2,2,2,2] via literal 2 + repeat-16 x3, a complete
    4-symbol code, and decode all four symbols."""
    w = webp._LsbWriter()
    _vp8l_header(w, 4, 1)
    w.write(0, 1); w.write(0, 1); w.write(0, 1)
    w.write(0, 1)  # not simple
    w.write(19 - 4, 4)
    clc_lengths = {18: 2, 2: 2, 16: 2, 0: 2}
    for sym in webp._CLC_ORDER:
        w.write(clc_lengths.get(sym, 0), 3)
    w.write(0, 1)  # no max-symbol field
    # CLC canonical over {0,2,16,18} all len 2: 0->00, 2->01, 16->10, 18->11
    def clc(sym):
        code = {0: 0b00, 2: 0b01, 16: 0b10, 18: 0b11}[sym]
        w.write(webp._rev(code, 2), 2)
    clc(2)          # lengths[0] = 2
    clc(16)         # repeat prev (2) 3 + bits(2) times
    w.write(0, 2)   # -> lengths[1..3] = 2
    clc(18)         # zero-run to cover the rest (276 = 11 + 127 + ...)
    w.write(127, 7)  # 138
    clc(18)
    w.write(127, 7)  # 138 -> 276 total zeros
    # green canonical: 0->00, 1->01, 2->10, 3->11
    for v in (40, 41, 255):
        webp._write_code_single(w, v)
    webp._write_code_single(w, 0)
    for g in (0, 1, 2, 3):
        w.write(webp._rev(g, 2), 2)
    dw, dh, dc, px = webp.decode_webp(_wrap_vp8l(w.flush()))
    import numpy as np

    arr = np.frombuffer(px, np.uint8).reshape(4, 4)
    assert list(arr[:, 1]) == [0, 1, 2, 3]  # greens
    assert (arr[:, 0] == 40).all() and (arr[:, 2] == 41).all()


@settings(max_examples=60, deadline=None)
@given(
    codec=st.sampled_from(
        ["png", "jpeg", "jpeg_prog", "flac", "wav", "y4m", "webp",
         "gif", "bmp", "tiff"]
    ),
    flip_at=st.integers(0, 10**6),
    flip_bits=st.integers(1, 255),
    seed=st.integers(0, 2**31 - 1),
)
def test_codec_corruption_always_terminates(codec, flip_at, flip_bits, seed):
    """Quarantine-gate precondition, fuzzed: a single corrupted byte
    anywhere in a valid stream must make decode TERMINATE promptly —
    either raising (ValueError / NotImplementedError / zlib / struct /
    overflow: the gate classifies any exception as corrupt) or
    returning some decode (damage in uncheckable payload regions) —
    never hanging an executor task or escaping as a crash the
    per-record try/except cannot catch."""
    import zlib

    from lab5_lakehouse_etl_spark.functions import (
        bmp, flac, gif, jpeg, png, wav, webp, y4m,
    )

    rng = np.random.default_rng(seed)
    if codec == "png":
        data = png.encode_png(9, 7, bytes(rng.integers(0, 256, 189, dtype=np.uint8)), color_type=2)
        dec = png.decode_png
    elif codec == "jpeg":
        data = jpeg.encode_jpeg(17, 9, bytes(rng.integers(0, 256, 153, dtype=np.uint8)), restart_interval=2)
        dec = jpeg.decode_jpeg
    elif codec == "jpeg_prog":
        data = jpeg.encode_jpeg_progressive(17, 9, bytes(rng.integers(0, 256, 153, dtype=np.uint8)))
        dec = jpeg.decode_jpeg
    elif codec == "flac":
        samples = np.asarray(rng.integers(-2048, 2048, 120), dtype=np.int64)
        data = flac.encode_flac(8000, 2, samples, block_size=16)
        dec = flac.decode_flac
    elif codec == "wav":
        data = wav.encode_wav(8000, 1, np.asarray(rng.integers(-100, 100, 50), dtype="<i2"))
        dec = wav.decode_wav
    elif codec == "y4m":
        frames = [bytes(rng.integers(0, 256, 48, dtype=np.uint8)) for _ in range(2)]
        data = y4m.encode_y4m(4, 4, frames, colorspace="C444")
        dec = y4m.decode_y4m
    elif codec == "webp":
        data = webp.encode_webp(7, 5, bytes(rng.integers(0, 256, 140, dtype=np.uint8)), cache_bits=3)
        dec = webp.decode_webp
    elif codec == "gif":
        data = gif.encode_gif(9, 6, bytes(rng.integers(0, 8, 54, dtype=np.uint8)), bytes(rng.integers(0, 256, 24, dtype=np.uint8)), interlace=True)
        dec = gif.decode_gif
    elif codec == "tiff":
        from lab5_lakehouse_etl_spark.functions import tiff

        comp = ("lzw", "deflate", "packbits", "g4", "mh", "g3_2d")[seed % 6]
        if comp in ("g4", "mh", "g3_2d"):
            gray = (rng.integers(0, 2, 54, dtype=np.uint8) * 255).tobytes()
            data = tiff.encode_tiff(9, 6, gray, compression=comp, rows_per_strip=2)
        else:
            data = tiff.encode_tiff(9, 6, bytes(rng.integers(0, 256, 162, dtype=np.uint8)), channels=3, compression=comp, predictor=2 if comp != "packbits" else 1, rows_per_strip=2)
        dec = tiff.decode_tiff
    else:
        data = bmp.encode_bmp(9, 6, bytes(rng.integers(0, 256, 162, dtype=np.uint8)))
        dec = bmp.decode_bmp
    bad = bytearray(data)
    bad[flip_at % len(bad)] ^= flip_bits
    try:
        dec(bytes(bad))
    except (ValueError, NotImplementedError, zlib.error, OverflowError,
            IndexError, KeyError, EOFError, MemoryError) as e:
        assert not isinstance(e, MemoryError)  # bounded failure only
    except Exception as e:  # struct.error and friends
        import struct as _struct

        assert isinstance(e, _struct.error), type(e)


from lab5_lakehouse_etl_spark.functions import gif  # noqa: E402


@settings(**_SETTINGS)
@given(
    w=st.integers(1, 32),
    h=st.integers(1, 32),
    n_colors=st.integers(1, 256),
    interlace=st.booleans(),
    transparent=st.booleans(),
    seed=st.integers(0, 2**32 - 1),
)
def test_gif_roundtrip_property(w, h, n_colors, interlace, transparent, seed):
    """GIF is LOSSLESS for palette content: decode(encode(x))
    reproduces every palette RGB exactly, interlaced or not, across
    all LZW width boundaries; the transparent index decodes to
    alpha 0 with its palette RGB preserved."""
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, 3 * n_colors, dtype=np.uint8).tobytes()
    idx = rng.integers(0, n_colors, w * h, dtype=np.uint8)
    t = int(rng.integers(0, n_colors)) if transparent else None
    data = gif.encode_gif(
        w, h, idx.tobytes(), pal, interlace=interlace, transparent=t
    )
    dw, dh, dc, px = gif.decode_gif(data)
    assert (dw, dh, dc) == (w, h, 4)
    arr = np.frombuffer(px, np.uint8).reshape(h, w, 4)
    p = np.frombuffer(pal, np.uint8).reshape(n_colors, 3)
    ii = idx.reshape(h, w)
    assert (arr[..., :3] == p[ii]).all()
    want_a = np.full((h, w), 255, np.uint8)
    if t is not None:
        want_a[ii == t] = 0
    assert (arr[..., 3] == want_a).all()


def test_gif_lzw_width_boundaries_and_reset():
    """A large random 256-color image crosses every LZW code width
    (9..12 bits) and forces the pre-4096 CLEAR reset; a structured
    image exercises long dictionary chains.  Byte-exact both ways."""
    rng = np.random.default_rng(11)
    for idx in (
        rng.integers(0, 256, 300 * 200, dtype=np.uint8),
        ((np.arange(300 * 200) * 7919) % 16).astype(np.uint8),
    ):
        n = int(idx.max()) + 1
        pal = rng.integers(0, 256, 3 * n, dtype=np.uint8).tobytes()
        data = gif.encode_gif(300, 200, idx.tobytes(), pal)
        _, _, _, px = gif.decode_gif(data)
        arr = np.frombuffer(px, np.uint8).reshape(200, 300, 4)
        p = np.frombuffer(pal, np.uint8).reshape(n, 3)
        assert (arr[..., :3] == p[idx.reshape(200, 300)]).all()


def test_gif_rejects_malformed():
    import numpy as np

    with pytest.raises(ValueError, match="magic"):
        gif.decode_gif(b"GIF99a" + bytes(16))
    pal = bytes(range(6))
    good = gif.encode_gif(4, 3, bytes([0, 1] * 6), pal)
    with pytest.raises(ValueError):
        gif.decode_gif(good[: len(good) // 2])
    # palette index beyond the table fails loudly on encode
    with pytest.raises(ValueError, match="index out of range"):
        gif.encode_gif(2, 1, bytes([5, 0]), pal)
    assert gif.gif_frame_count(good) == 1


from lab5_lakehouse_etl_spark.functions import bmp  # noqa: E402


@settings(**_SETTINGS)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 30),
    depth=st.sampled_from([8, 24, 32]),
    top_down=st.booleans(),
    seed=st.integers(0, 2**32 - 1),
)
def test_bmp_roundtrip_property(w, h, depth, top_down, seed):
    """BMP is uncompressed: decode(encode(x)) == x exactly across
    depths, BOTH row orders (bottom-up vs top-down must invert — a
    sum-invariant bug the oracle can't see), stride padding at every
    width, and palette expansion through the BGRX color table."""
    rng = np.random.default_rng(seed)
    if depth == 8:
        n = int(rng.integers(1, 257))
        pal = rng.integers(0, 256, 3 * n, dtype=np.uint8).tobytes()
        idx = rng.integers(0, n, w * h, dtype=np.uint8).tobytes()
        data = bmp.encode_bmp(
            w, h, idx, depth=8, palette=pal, top_down=top_down
        )
        p = np.frombuffer(pal, np.uint8).reshape(n, 3)
        want = (w, h, 3, p[np.frombuffer(idx, np.uint8)].tobytes())
    else:
        ch = depth // 8
        raw = rng.integers(0, 256, w * h * ch, dtype=np.uint8).tobytes()
        data = bmp.encode_bmp(w, h, raw, depth=depth, top_down=top_down)
        want = (w, h, ch, raw)
    assert bmp.decode_bmp(data) == want


def test_bmp_rejects_out_of_scope():
    with pytest.raises(ValueError, match="magic"):
        bmp.decode_bmp(b"not a bmp")
    good = bmp.encode_bmp(3, 2, bytes(18))
    with pytest.raises(ValueError, match="truncated"):
        bmp.decode_bmp(good[:-5])
    # RLE8 compression refused loudly
    bad = bytearray(good)
    bad[30] = 1
    with pytest.raises(NotImplementedError, match="compression"):
        bmp.decode_bmp(bytes(bad))
    # 16-bit depth refused loudly
    bad = bytearray(good)
    bad[28] = 16
    with pytest.raises(NotImplementedError, match="16-bit"):
        bmp.decode_bmp(bytes(bad))


from lab5_lakehouse_etl_spark.functions import tiff  # noqa: E402


@settings(**_SETTINGS)
@given(
    w=st.integers(1, 32),
    h=st.integers(1, 24),
    shape=st.sampled_from(["gray", "gray_wiz", "rgb", "rgba", "palette"]),
    compression=st.sampled_from(
        ["none", "lzw", "lzw_p2", "deflate", "deflate_p2", "packbits"]
    ),
    big_endian=st.booleans(),
    rps=st.integers(0, 7),
    seed=st.integers(0, 2**32 - 1),
)
def test_tiff_roundtrip_property(w, h, shape, compression, big_endian, rps, seed):
    """TIFF is LOSSLESS in every supported shape: decode(encode(x))
    == x exactly across byte orders, photometrics (incl. the
    WhiteIsZero storage inversion), TIFF-LZW / Deflate / PackBits
    with and without the horizontal-differencing predictor, and
    arbitrary strip splits (every strip is an independent compressed
    stream — a strip-boundary bug breaks this at rps < h)."""
    if shape == "palette" and compression.endswith("_p2"):
        compression = compression[:-3]  # predictor over indices: out of scope
    rng = np.random.default_rng(seed)
    kw = dict(
        compression=compression.removesuffix("_p2"),
        predictor=2 if compression.endswith("_p2") else 1,
        big_endian=big_endian,
        rows_per_strip=rps or None,
    )
    if shape == "palette":
        n = int(rng.integers(1, 257))
        pal = rng.integers(0, 256, 3 * n, dtype=np.uint8).tobytes()
        idx = rng.integers(0, n, w * h, dtype=np.uint8).tobytes()
        data = tiff.encode_tiff(w, h, idx, palette=pal, **kw)
        p = np.frombuffer(pal, np.uint8).reshape(n, 3)
        want = (w, h, 3, p[np.frombuffer(idx, np.uint8)].tobytes())
    else:
        ch = {"gray": 1, "gray_wiz": 1, "rgb": 3, "rgba": 4}[shape]
        raw = rng.integers(0, 256, w * h * ch, dtype=np.uint8).tobytes()
        data = tiff.encode_tiff(
            w, h, raw, channels=ch,
            white_is_zero=(shape == "gray_wiz"), **kw
        )
        want = (w, h, ch, raw)
    assert tiff.decode_tiff(data) == want


def test_tiff_lzw_width_boundaries_and_reset():
    """A large random RGB image crosses every TIFF-LZW code width
    (9..12 bits, the EARLY-change boundaries) and forces the pre-4094
    CLEAR reset; byte-exact both ways, with and without predictor.
    The same raster also round-trips PackBits (worst case: all
    literal packets) and Deflate."""
    rng = np.random.default_rng(13)
    raw = rng.integers(0, 256, 300 * 200 * 3, dtype=np.uint8).tobytes()
    for pred in (1, 2):
        data = tiff.encode_tiff(
            300, 200, raw, channels=3, compression="lzw", predictor=pred
        )
        assert tiff.decode_tiff(data) == (300, 200, 3, raw)
    for comp in ("packbits", "deflate"):
        data = tiff.encode_tiff(300, 200, raw, channels=3, compression=comp)
        assert tiff.decode_tiff(data) == (300, 200, 3, raw)


def test_tiff_rejects_out_of_scope():
    with pytest.raises(ValueError, match="magic"):
        tiff.decode_tiff(b"not a tiff at all")
    good = tiff.encode_tiff(3, 2, bytes(18))
    with pytest.raises(ValueError):
        tiff.decode_tiff(good[:12])
    # CCITT compression refused loudly (flip the compression tag)
    import struct

    def with_tag(data: bytes, tag: int, value: int) -> bytes:
        (ifd_at,) = struct.unpack("<I", data[4:8])
        (n,) = struct.unpack("<H", data[ifd_at : ifd_at + 2])
        out = bytearray(data)
        for i in range(n):
            at = ifd_at + 2 + 12 * i
            t, typ = struct.unpack("<HH", data[at : at + 4])
            if t == tag:
                out[at + 8 : at + 12] = struct.pack("<I", value)
                return bytes(out)
        # tag absent: append an entry before the next-IFD pointer (the
        # IFD is the file's last structure, so no offset shifts)
        entry = struct.pack("<HHII", tag, 3, 1, value)
        at = ifd_at + 2 + 12 * n
        out[ifd_at : ifd_at + 2] = struct.pack("<H", n + 1)
        return bytes(out[:at]) + entry + bytes(out[at:])

    with pytest.raises(NotImplementedError, match="compression"):
        tiff.decode_tiff(with_tag(good, 259, 7))  # JPEG-in-TIFF
    # CCITT coding over a non-bilevel image is malformed, not merely
    # unsupported (MH/G3/G4 are all IN scope for bilevel since r13)
    with pytest.raises(ValueError, match="bilevel"):
        tiff.decode_tiff(with_tag(good, 259, 2))
    with pytest.raises(NotImplementedError, match="Planar"):
        tiff.decode_tiff(with_tag(good, 284, 2))
    # FillOrder 2 (LSB-first bit packing) stays a loud refusal even
    # though tiled layout (tag 322) decodes since r13
    with pytest.raises(NotImplementedError, match="FillOrder"):
        tiff.decode_tiff(with_tag(good, 266, 2))


def _assert_tiff_word_aligned(data: bytes) -> None:
    """TIFF 6.0 requires every offset (IFD starts, out-of-line tag
    values, strip/tile data) to be word-aligned.  Our decoder and
    Java ImageIO tolerate odd offsets, but strict readers may not —
    so the encoder must pad (r13 advice, tiff.py:_layout_page)."""
    import struct

    bo = "<" if data[:2] == b"II" else ">"
    sizes = {1: 1, 2: 1, 3: 2, 4: 4}
    (ifd_at,) = struct.unpack(bo + "I", data[4:8])
    while ifd_at:
        assert ifd_at % 2 == 0, f"odd IFD offset {ifd_at}"
        (n,) = struct.unpack(bo + "H", data[ifd_at : ifd_at + 2])
        for i in range(n):
            at = ifd_at + 2 + 12 * i
            tag, typ = struct.unpack(bo + "HH", data[at : at + 4])
            (count,) = struct.unpack(bo + "I", data[at + 4 : at + 8])
            if typ in sizes and sizes[typ] * count > 4:
                (off,) = struct.unpack(bo + "I", data[at + 8 : at + 12])
                assert off % 2 == 0, f"odd value offset for tag {tag}"
        from lab5_lakehouse_etl_spark.functions.tiff import _read_ifd

        tags = _read_ifd(data, bo, ifd_at)
        for off_tag in (273, 324):
            for off in tags.get(off_tag, []):
                assert off % 2 == 0, f"odd data offset via tag {off_tag}"
        at = ifd_at + 2 + 12 * n
        (ifd_at,) = struct.unpack(bo + "I", data[at : at + 4])


@settings(**_SETTINGS)
@given(
    n_pages=st.integers(1, 3),
    big_endian=st.booleans(),
    seed=st.integers(0, 2**32 - 1),
)
def test_tiff_encoder_word_alignment(n_pages, big_endian, seed):
    """Encoder output satisfies TIFF 6.0 word alignment for every
    offset, including odd-length compressed strips and odd-count
    out-of-line BYTE values, across multi-page layouts."""
    rng = np.random.default_rng(seed)
    pages = []
    for i in range(n_pages):
        w = int(rng.integers(1, 23))
        h = int(rng.integers(1, 17))
        ch = int(rng.choice([1, 3]))
        raw = rng.integers(0, 256, w * h * ch, dtype=np.uint8).tobytes()
        pages.append(
            {
                "width": w, "height": h, "pixels": raw, "channels": ch,
                "compression": ["none", "lzw", "deflate", "packbits"][i % 4],
                "rows_per_strip": int(rng.integers(1, h + 1)),
            }
        )
    data = tiff.encode_tiff_pages(pages, big_endian=big_endian)
    _assert_tiff_word_aligned(data)
    for i, p in enumerate(pages):
        got = tiff.decode_tiff(data, page=i)
        assert got == (p["width"], p["height"], p["channels"], p["pixels"])


@settings(**_SETTINGS)
@given(
    n_pages=st.integers(1, 4),
    big_endian=st.booleans(),
    seed=st.integers(0, 2**32 - 1),
)
def test_tiff_multipage_roundtrip_property(n_pages, big_endian, seed):
    """Multi-page TIFF: the IFD chain decodes every page exactly, each
    page free to differ in dims / compression / photometric; page
    count walks the chain; an out-of-range page refuses loudly."""
    rng = np.random.default_rng(seed)
    comps = ["none", "lzw", "deflate", "packbits"]
    pages = []
    truths = []
    for i in range(n_pages):
        w = int(rng.integers(1, 20))
        h = int(rng.integers(1, 16))
        ch = int(rng.choice([1, 3]))
        raw = rng.integers(0, 256, w * h * ch, dtype=np.uint8).tobytes()
        pages.append(
            {
                "width": w, "height": h, "pixels": raw,
                "channels": ch, "compression": comps[i % 4],
            }
        )
        truths.append((w, h, ch, raw))
    data = tiff.encode_tiff_pages(pages, big_endian=big_endian)
    assert tiff.tiff_page_count(data) == n_pages
    for i, want in enumerate(truths):
        assert tiff.decode_tiff(data, page=i) == want
    with pytest.raises(ValueError, match="no page"):
        tiff.decode_tiff(data, page=n_pages)


@settings(**_SETTINGS)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 24),
    shape=st.sampled_from(["noise", "sparse", "stripes", "blank"]),
    compression=st.sampled_from(["none", "g4", "mh", "g3", "g3_2d"]),
    rps=st.integers(0, 7),
    seed=st.integers(0, 2**32 - 1),
)
def test_tiff_bilevel_roundtrip_property(w, h, shape, compression, rps, seed):
    """Bilevel TIFF is LOSSLESS: packed-bit and CCITT G4 strips both
    reproduce the 0/255 gray raster exactly across content shapes
    (noise exercises horizontal MH runs, stripes the vertical modes,
    sparse the pass mode, blank the all-white degenerate row), the
    whole CCITT fax family (G4, byte-aligned MH, EOL-framed G3 1-D
    and tag-bit 2-D) and arbitrary strip splits (each strip is an
    independent stream whose reference line resets — a carry-over
    bug breaks rps < h)."""
    rng = np.random.default_rng(seed)
    if shape == "noise":
        ink = rng.random((h, w)) < 0.5
    elif shape == "sparse":
        ink = rng.random((h, w)) < 0.05
    elif shape == "stripes":
        k = int(rng.integers(1, 6))
        ink = (np.indices((h, w))[1] // k) % 2 == 0
    else:
        ink = np.zeros((h, w), bool)
    gray = np.where(ink, 0, 255).astype(np.uint8).tobytes()
    data = tiff.encode_tiff(
        w, h, gray, compression=compression, bilevel=True,
        rows_per_strip=rps or None,
    )
    assert tiff.decode_tiff(data) == (w, h, 1, gray)


def test_g4_rejects_malformed():
    from lab5_lakehouse_etl_spark.functions import ccitt

    with pytest.raises(ValueError, match="truncated"):
        ccitt.g4_decode(b"", 4, 4)
    # EOFB before the rows fill
    with pytest.raises(ValueError, match="ended before"):
        ccitt.g4_decode(bytes(8), 4, 4)
    gray = bytes([255] * 12)
    good = tiff.encode_tiff(4, 3, gray, compression="g4")
    # G4 over non-bilevel refused at the container level
    with pytest.raises(NotImplementedError, match="bilevel encode"):
        tiff.encode_tiff(4, 3, gray, bilevel=True, compression="lzw")


@settings(**_SETTINGS)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 30),
    tw=st.sampled_from([8, 16, 32]),
    th=st.sampled_from([8, 16, 32]),
    shape=st.sampled_from(["rgb_lzw_p2", "rgb_none", "gray_deflate",
                           "palette", "bilevel_g4"]),
    seed=st.integers(0, 2**32 - 1),
)
def test_tiff_tiled_roundtrip_property(w, h, tw, th, shape, seed):
    """Tiled TIFF is LOSSLESS across tile grids that divide the image
    unevenly (edge tiles stored full-size, clipped on decode), every
    compression incl. per-tile G4 streams, and the per-tile predictor
    restart (a cross-tile differencing bug breaks any w > tw case)."""
    rng = np.random.default_rng(seed)
    if shape == "bilevel_g4":
        ink = rng.random((h, w)) < 0.4
        gray = np.where(ink, 0, 255).astype(np.uint8).tobytes()
        data = tiff.encode_tiff(
            w, h, gray, compression="g4", tile=(tw, th)
        )
        assert tiff.decode_tiff(data) == (w, h, 1, gray)
        return
    if shape == "palette":
        n = int(rng.integers(1, 257))
        pal = rng.integers(0, 256, 3 * n, dtype=np.uint8).tobytes()
        idx = rng.integers(0, n, w * h, dtype=np.uint8).tobytes()
        data = tiff.encode_tiff(w, h, idx, palette=pal, tile=(tw, th))
        p = np.frombuffer(pal, np.uint8).reshape(n, 3)
        assert tiff.decode_tiff(data) == (
            w, h, 3, p[np.frombuffer(idx, np.uint8)].tobytes()
        )
        return
    ch, comp, pred = {
        "rgb_lzw_p2": (3, "lzw", 2),
        "rgb_none": (3, "none", 1),
        "gray_deflate": (1, "deflate", 2),
    }[shape]
    raw = rng.integers(0, 256, w * h * ch, dtype=np.uint8).tobytes()
    data = tiff.encode_tiff(
        w, h, raw, channels=ch, compression=comp, predictor=pred,
        tile=(tw, th),
    )
    assert tiff.decode_tiff(data) == (w, h, ch, raw)
