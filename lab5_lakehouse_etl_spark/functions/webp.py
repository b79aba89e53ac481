"""Pure Python/numpy WebP LOSSLESS (VP8L) codec — the last image
format on the multimodal pillar's refused list that is decodable
without a native library (AVIF would need a full AV1 decoder; lossy
WebP a full VP8 one — both stay refused).

No reference file:line — the reference repo has no multimodal surface.
Implements the public VP8L bitstream (RIFF container + the
"WebP Lossless Bitstream Specification"): LSB-first bit reading,
canonical prefix codes transmitted either as SIMPLE codes (1–2
symbols) or via the 19-symbol code-length code (repeat ops 16/17/18,
optional max-symbol limit field), the five-code group (green+length+
cache / red / blue / alpha / distance), LZ77 backward references with
the 120-entry 2-D distance neighborhood map, the color cache
(0x1e35a7bd multiplicative hashing, updated on EVERY emitted pixel),
and all four transforms inverted in reverse read order:

* PREDICTOR (14 per-tile modes incl. the clamped-gradient and
  Select modes, exact 8-bit wraparound arithmetic),
* COLOR (per-tile signed 3.5-fixed-point green→red/green→blue/
  red→blue deltas),
* SUBTRACT-GREEN,
* COLOR-INDEXING (palette, incl. sub-byte pixel BUNDLING for
  palettes ≤ 16 entries).

The matching :func:`encode_webp` generates spec-valid streams for
fixtures: literals under complete two-length canonical codes, any
combination of the four transforms (constant-mode transform images
are encoded with one-symbol codes, costing zero bits per tile — a
spec trick real encoders also use), optional color cache, and an RLE
LZ77 mode (distance-1 runs through the real length/distance prefix
machinery).  VP8L is LOSSLESS: decode(encode(x)) == x bit-for-bit,
so the q_multimodal_webp oracle states exact per-channel sums from
the fixture formula while the payload's ENCODING varies per id.

Scale: pure per-record CPU inside Arrow-batched ``mapInPandas``
(functions/multimodal.py); payload bytes never cross a shuffle.  In
production the body swaps for libwebp (Pillow/pyvips) behind the
same ``(width, height, channels, pixels)`` contract.

Out of scope (explicit ``NotImplementedError``, never a wrong
answer): lossy VP8 PIXEL DECODE, the VP8X extended container
(animation/EXIF), and alpha-compressed lossy streams.  The r14 spike
(README "Lossy WebP (VP8)") recorded the refusal rationale: VP8
mandates BIT-EXACT reconstruction, RFC 6386 publishes reference code
but no conformance vectors, and this container has no external VP8
validator (ImageIO has no WebP plugin; pip/apt blocked) — so a
self-built decoder could only be pinned against itself, which the
lossless VP8L round-trip argument does not transfer to.  What IS
shipped from the lossy path: :func:`vp8_lossy_dimensions`, the
frame header's uncompressed bit fields (hand-verifiable), feeding
the quarantine gate's triage metadata.
"""

from __future__ import annotations

import struct

import numpy as np

#: code-length code symbol transmission order (spec §"Code Length Code")
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

#: green/length/cache alphabet base size: 256 literals + 24 length prefixes
_GREEN_BASE = 280
_NUM_DIST = 40

#: color-cache multiplicative hash (spec constant)
_HASH_MUL = 0x1E35A7BD


def _distance_map() -> list[tuple[int, int]]:
    """The 120-entry 2-D neighborhood table for short LZ77 distances:
    all (dx, dy) offsets with dy 0..7, dx -7..8 (dx >= 1 when dy == 0),
    ordered by squared euclidean distance then by dy DESCENDING then
    positive dx before negative — reproduces the spec's table exactly
    (pinned by tests against published entries)."""
    cands = []
    for dy in range(8):
        for dx in range(-7, 9):
            if dy == 0 and dx < 1:
                continue
            cands.append((dx, dy))
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], p[0] < 0))
    return cands[:120]


_DIST_MAP = _distance_map()
_DIST_CODE: dict[tuple[int, int], int] = {
    p: i + 1 for i, p in enumerate(_DIST_MAP)
}


class _LsbReader:
    """LSB-first bit reader over the VP8L payload.

    ``bits`` extracts the whole n-bit group from an int view of the
    touched bytes (one ``int.from_bytes`` + shift instead of a
    per-bit loop — the loop was the profile's hottest line across the
    whole WebP decode)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos
        last_byte = (p + n - 1) >> 3
        if last_byte >= len(self.data):
            raise ValueError("truncated VP8L bitstream")
        chunk = int.from_bytes(self.data[p >> 3 : last_byte + 1], "little")
        self.pos = p + n
        return (chunk >> (p & 7)) & ((1 << n) - 1)

    def bit(self) -> int:
        p = self.pos
        byte = p >> 3
        if byte >= len(self.data):
            raise ValueError("truncated VP8L bitstream")
        self.pos = p + 1
        return (self.data[byte] >> (p & 7)) & 1


class _LsbWriter:
    """LSB-first bit writer (accumulator form: bits land in an int and
    leave as whole bytes — byte-identical output to the per-bit form
    it replaced, at one call-free shift per write)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, v: int, n: int) -> None:
        self._acc |= (v & ((1 << n) - 1)) << self._n
        self._n += n
        while self._n >= 8:
            self.out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def flush(self) -> bytes:
        """Single-use terminator: pads the pending partial byte with
        zeros and returns the stream.  NOT idempotent — a second flush
        (or writes after flush) would misalign the output, so it is
        refused instead of silently corrupting (r15 ADVICE; the old
        bitpos form tolerated repeated flushes, this contract makes
        the accumulator form's single-use nature explicit)."""
        if self._n < 0:
            raise ValueError("_LsbWriter.flush called twice")
        if self._n:
            self.out.append(self._acc & 0xFF)
            self._acc = 0
        self._n = -1
        return bytes(self.out)


def _canonical_from_lengths(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), DEFLATE-style canonical: codes assigned
    in increasing length then symbol order.  Raises on over-subscribed
    codes; a code may be incomplete only in the single-symbol case
    (handled by callers)."""
    out: dict[int, tuple[int, int]] = {}
    # one pass to bucket symbols by length (symbol order preserved),
    # instead of re-scanning the whole alphabet once per length value
    bylen: dict[int, list[int]] = {}
    for sym, sl in enumerate(lengths):
        if sl:
            bylen.setdefault(sl, []).append(sym)
    code = 0
    maxlen = max(bylen, default=0)
    for ln in range(1, maxlen + 1):
        for sym in bylen.get(ln, ()):
            out[sym] = (code, ln)
            code += 1
        code <<= 1
    if maxlen and code > (2 << maxlen):
        raise ValueError("over-subscribed prefix code")
    return out


class _Tree:
    """Prefix-code decode table: (length, code) -> symbol, read one
    MSB-appended bit at a time; or a 0-bit single-symbol code."""

    def __init__(
        self, table: dict[tuple[int, int], int], single: int | None = None
    ) -> None:
        self.table = table
        self.single = single

    @classmethod
    def from_lengths(cls, lengths: list[int]) -> "_Tree":
        used = [s for s, ln in enumerate(lengths) if ln > 0]
        if len(used) == 0:
            raise ValueError("empty prefix code")
        if len(used) == 1:
            return cls({}, single=used[0])
        # completeness check (Kraft == 1) — an incomplete multi-symbol
        # code is a spec violation that would mis-sync the stream
        kraft = sum(1 / (1 << ln) for ln in lengths if ln)
        if abs(kraft - 1.0) > 1e-12:
            raise ValueError("incomplete prefix code")
        codes = _canonical_from_lengths(lengths)
        return cls({(ln, c): s for s, (c, ln) in codes.items()})

    def read(self, r: _LsbReader) -> int:
        # hot path: called once per prefix symbol — bit extraction is
        # inlined against the reader's buffer (a r.bit() call per bit
        # tripled the cost of the whole symbol loop)
        if self.single is not None:
            return self.single
        data = r.data
        nbits = len(data) << 3
        p = r.pos
        code, ln = 0, 0
        table = self.table
        while ln < 16:
            if p >= nbits:
                raise ValueError("truncated VP8L bitstream")
            code = (code << 1) | ((data[p >> 3] >> (p & 7)) & 1)
            p += 1
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                r.pos = p
                return sym
        raise ValueError("invalid VP8L prefix code")


def _read_code(r: _LsbReader, alphabet_size: int) -> _Tree:
    """Read one prefix code (spec §"Decoding of Meta Prefix Codes"):
    SIMPLE (1–2 symbols) or normal (code-length-coded lengths)."""
    if r.bit():  # simple code
        n_sym = r.bit() + 1
        if r.bit():  # first symbol is 8 bits
            s0 = r.bits(8)
        else:
            s0 = r.bit()
        if n_sym == 2:
            s1 = r.bits(8)
            lengths = [0] * alphabet_size
            if max(s0, s1) >= alphabet_size:
                raise ValueError("simple-code symbol out of range")
            lengths[s0] = 1
            lengths[s1] = 1
            return _Tree.from_lengths(lengths)
        if s0 >= alphabet_size:
            raise ValueError("simple-code symbol out of range")
        return _Tree({}, single=s0)
    # normal: code lengths for the code-length code
    n_codes = 4 + r.bits(4)
    cl_lengths = [0] * 19
    for i in range(n_codes):
        cl_lengths[_CLC_ORDER[i]] = r.bits(3)
    cl_tree = _Tree.from_lengths(cl_lengths)
    # optional max-symbol limit
    if r.bit():
        length_nbits = 2 + 2 * r.bits(3)
        max_symbol = 2 + r.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = cl_tree.read(r)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + r.bits(2)
            for _ in range(rep):
                if i < alphabet_size:
                    lengths[i] = prev
                    i += 1
        elif s == 17:
            i += 3 + r.bits(3)
        else:  # 18
            i += 11 + r.bits(7)
    return _Tree.from_lengths(lengths)


def _prefix_decode(r: _LsbReader, sym: int) -> int:
    """LZ77 length/distance prefix symbol -> value (>= 1)."""
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + r.bits(extra) + 1


def _prefix_encode(v: int) -> tuple[int, int, int]:
    """value (>= 1) -> (prefix symbol, extra-bit count, extra bits)."""
    v -= 1
    if v < 4:
        return v, 0, 0
    extra = v.bit_length() - 2
    offset = v - ((2 + ((v >> extra) & 1)) << extra)
    return 2 * extra + ((v >> extra) & 1) + 2, extra, offset


def _read_entropy_image(
    r: _LsbReader, width: int, height: int
) -> np.ndarray:
    """Decode a nested ARGB image (transform data / entropy image):
    same pixel loop, no transforms, no meta codes, own color cache."""
    return _decode_pixels(r, width, height, allow_meta=False)


def _decode_pixels(
    r: _LsbReader, width: int, height: int, allow_meta: bool
) -> np.ndarray:
    """The spec's main decode loop over an ARGB image: meta prefix
    groups (optional), color cache (optional), literals, LZ77 copies,
    cache references.  Returns uint32 ARGB array (height, width)."""
    cache_bits = 0
    if r.bit():
        cache_bits = r.bits(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError(f"color-cache bits {cache_bits} out of 1..11")
    meta = None
    meta_bits = 0
    n_groups = 1
    if allow_meta and r.bit():
        meta_bits = 3 + r.bits(3)
        mw = -(-width // (1 << meta_bits))
        mh = -(-height // (1 << meta_bits))
        meta = _read_entropy_image(r, mw, mh)
        # group index = (red << 8) | green of the entropy image pixel
        n_groups = int(((meta >> 8) & 0xFFFF).max()) + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = []
    for _ in range(n_groups):
        green = _read_code(r, _GREEN_BASE + cache_size)
        red = _read_code(r, 256)
        blue = _read_code(r, 256)
        alpha = _read_code(r, 256)
        dist = _read_code(r, _NUM_DIST)
        groups.append((green, red, blue, alpha, dist))
    cache = [0] * cache_size
    out = np.zeros(height * width, dtype=np.uint32)
    pos = 0
    n = height * width

    def cache_insert(argb: int) -> None:
        if cache_bits:
            cache[(argb * _HASH_MUL & 0xFFFFFFFF) >> (32 - cache_bits)] = argb

    group = groups[0]
    last_meta_key = -1
    while pos < n:
        if meta is not None:
            x, y = pos % width, pos // width
            key = (y >> meta_bits) * meta.shape[1] + (x >> meta_bits)
            if key != last_meta_key:
                mpix = int(meta[y >> meta_bits, x >> meta_bits])
                group = groups[(mpix >> 8) & 0xFFFF]
                last_meta_key = key
        g = group[0].read(r)
        if g < 256:  # literal
            red = group[1].read(r)
            blue = group[2].read(r)
            alpha = group[3].read(r)
            argb = (alpha << 24) | (red << 16) | (g << 8) | blue
            out[pos] = argb
            cache_insert(argb)
            pos += 1
        elif g < 280:  # LZ77 backward reference
            length = _prefix_decode(r, g - 256)
            dsym = group[4].read(r)
            dcode = _prefix_decode(r, dsym)
            if dcode > 120:
                dist = dcode - 120
            else:
                dx, dy = _DIST_MAP[dcode - 1]
                dist = dy * width + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n:
                raise ValueError("LZ77 reference out of range")
            for _ in range(length):
                argb = int(out[pos - dist])
                out[pos] = argb
                cache_insert(argb)
                pos += 1
        else:  # color-cache reference
            idx = g - 280
            if idx >= cache_size:
                raise ValueError("color-cache index out of range")
            out[pos] = cache[idx]
            # spec: cache refs re-insert (no-op value-wise) — skip
            pos += 1
    return out.reshape(height, width)


# ---------------------------------------------------------------- transforms


def _inv_subtract_green(img: np.ndarray) -> np.ndarray:
    a = (img >> 24) & 0xFF
    red = (img >> 16) & 0xFF
    g = (img >> 8) & 0xFF
    b = img & 0xFF
    red = (red + g) & 0xFF
    b = (b + g) & 0xFF
    return (a << 24) | (red << 16) | (g << 8) | b


def _cdelta(t: int, c: int) -> int:
    """Signed 3.5 fixed-point color-transform delta (spec
    ColorTransformDelta): (int8(t) * int8(c)) >> 5."""
    t = t - 256 if t >= 128 else t
    c = c - 256 if c >= 128 else c
    return (t * c) >> 5


def _inv_color_transform(
    img: np.ndarray, tiles: np.ndarray, bits: int
) -> np.ndarray:
    """Invert the color transform: per-tile multipliers are packed in
    the transform pixel as green_to_red = bits 0-7 (blue channel),
    green_to_blue = bits 8-15, red_to_blue = bits 16-23 (libwebp
    ColorCodeToMultipliers); deltas are signed-3.5 products added
    back, red first (blue's red_to_blue term reads the RESTORED
    red)."""
    h, w = img.shape
    out = img.copy()
    for y in range(h):
        trow = tiles[y >> bits]
        for x in range(w):
            t = int(trow[x >> bits])
            g2r = t & 0xFF
            g2b = (t >> 8) & 0xFF
            r2b = (t >> 16) & 0xFF
            argb = int(out[y, x])
            a = (argb >> 24) & 0xFF
            red = (argb >> 16) & 0xFF
            g = (argb >> 8) & 0xFF
            b = argb & 0xFF
            red = (red + _cdelta(g2r, g)) & 0xFF
            b = (b + _cdelta(g2b, g) + _cdelta(r2b, red)) & 0xFF
            out[y, x] = (a << 24) | (red << 16) | (g << 8) | b
    return out


def _inv_predictor(
    img: np.ndarray, tiles: np.ndarray, bits: int
) -> np.ndarray:
    """Invert the predictor transform: residual + prediction per pixel
    (mod-256 per channel), scanning in raster order so predictions see
    fully reconstructed neighbors.  Pixel (0,0) predicts opaque black;
    the rest of row 0 predicts LEFT; column 0 predicts TOP.  The
    top-right of the last column is the CURRENT row's first pixel —
    the spec's contiguous-memory addressing (upper_row[x+1] runs one
    past the previous row), which libwebp inherits and the format
    therefore requires."""
    h, w = img.shape
    out = img.copy()
    helper = _PredHelper(out)
    for y in range(h):
        trow = tiles[y >> bits]
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(out[0, x - 1])
            elif x == 0:
                pred = int(out[y - 1, 0])
            else:
                mode = (int(trow[x >> bits]) >> 8) & 0xFF
                if mode > 13:
                    raise ValueError(f"predictor mode {mode} invalid")
                pred = helper.predict(y, x, mode)
            res = int(out[y, x])
            o = 0
            for sh in (24, 16, 8, 0):
                o |= (
                    (((res >> sh) & 0xFF) + ((pred >> sh) & 0xFF)) & 0xFF
                ) << sh
            out[y, x] = o
    return out


def _inv_color_indexing(
    img: np.ndarray, palette: np.ndarray, width: int
) -> np.ndarray:
    """Expand palette indices (green channel) to ARGB; when the
    palette has <= 16 entries the sub-resolution image BUNDLES several
    indices per pixel (spec pixel bundling)."""
    n = len(palette)
    if n <= 2:
        ibits = 3
    elif n <= 4:
        ibits = 2
    elif n <= 16:
        ibits = 1
    else:
        ibits = 0
    h = img.shape[0]
    out = np.zeros((h, width), dtype=np.uint32)
    per = 1 << ibits
    depth = 8 >> ibits
    mask = (1 << depth) - 1
    for y in range(h):
        for x in range(width):
            packed = int(img[y, x // per])
            idx = ((packed >> 8) >> (depth * (x % per))) & mask
            if idx >= n:
                # spec: out-of-range palette index decodes as
                # transparent black in libwebp; we refuse loudly —
                # a training pipeline wants the quarantine verdict
                raise ValueError("palette index out of range")
            out[y, x] = palette[idx]
    return out


def vp8_lossy_dimensions(data: bytes) -> tuple[int, int]:
    """Width/height of a LOSSY (VP8) WebP from the frame header's
    UNCOMPRESSED leading bytes (RFC 6386 §9.1) — the one part of the
    lossy path that is plain bit fields, verifiable by hand, and
    therefore shippable under the never-a-wrong-answer doctrine while
    pixel decode stays refused (r14 spike decision, README "Lossy
    WebP (VP8)"): 3-byte little-endian frame tag (bit 0 = frame type,
    must be key frame — interframes carry no dimensions), the
    ``9d 01 2a`` start code, then two 16-bit LE fields whose low 14
    bits are width/height (high 2 bits are the upscale hints).

    Used by the ingest quarantine gate so codec-less lossy payloads
    surface their dimensions next to the ``unsupported`` verdict —
    triage metadata, never a decode claim."""
    if len(data) < 20 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP: bad RIFF/WEBP header")
    if data[12:16] != b"VP8 ":
        raise ValueError("not a lossy (VP8) WebP chunk")
    (size,) = struct.unpack("<I", data[16:20])
    p = data[20 : 20 + size]
    if len(p) < 10:
        raise ValueError("truncated VP8 frame header")
    tag = p[0] | (p[1] << 8) | (p[2] << 16)
    if tag & 1:
        raise ValueError("VP8 interframe: no dimensions in header")
    if p[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 keyframe start code")
    w = (p[6] | (p[7] << 8)) & 0x3FFF
    h = (p[8] | (p[9] << 8)) & 0x3FFF
    if not w or not h:
        raise ValueError("VP8 frame header declares zero dimension")
    return w, h


def decode_webp(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a lossless (VP8L) WebP to ``(width, height, 4,
    RGBA bytes)``.  Lossy VP8 and extended VP8X containers raise
    ``NotImplementedError``; malformed streams raise ``ValueError``."""
    if len(data) < 16 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP: bad RIFF/WEBP header")
    fourcc = data[12:16]
    if fourcc == b"VP8 ":
        raise NotImplementedError(
            "lossy VP8 decode needs libwebp; only VP8L is implemented"
        )
    if fourcc == b"VP8X":
        raise NotImplementedError(
            "extended (VP8X) WebP containers are unsupported"
        )
    if fourcc != b"VP8L":
        raise ValueError(f"unknown WebP chunk {fourcc!r}")
    if len(data) < 20:
        raise ValueError("truncated VP8L chunk header")
    (size,) = struct.unpack("<I", data[16:20])
    payload = data[20 : 20 + size]
    if len(payload) != size:
        raise ValueError("truncated VP8L chunk")
    if not payload or payload[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    r = _LsbReader(payload)
    r.bits(8)
    width = r.bits(14) + 1
    height = r.bits(14) + 1
    r.bit()  # alpha hint
    if r.bits(3) != 0:
        raise ValueError("unknown VP8L version")
    # transforms, in stream order
    transforms: list[tuple[int, object]] = []
    seen: set[int] = set()
    xsize = width  # color-indexing shrinks the coded width
    while r.bit():
        ttype = r.bits(2)
        if ttype in seen:
            raise ValueError("duplicate VP8L transform")
        seen.add(ttype)
        if ttype == 0 or ttype == 1:  # predictor / color
            bits = r.bits(3) + 2
            tw = -(-xsize // (1 << bits))
            th = -(-height // (1 << bits))
            tiles = _read_entropy_image(r, tw, th)
            transforms.append((ttype, (tiles, bits)))
        elif ttype == 2:  # subtract-green
            transforms.append((2, None))
        else:  # color indexing
            n_colors = r.bits(8) + 1
            pal_img = _read_entropy_image(r, n_colors, 1)
            # palette entries are delta-coded component-wise
            pal = np.zeros(n_colors, dtype=np.uint32)
            prev = 0
            for i in range(n_colors):
                cur = int(pal_img[0, i])
                o = 0
                for sh in (24, 16, 8, 0):
                    o |= ((((cur >> sh) & 0xFF) + ((prev >> sh) & 0xFF)) & 0xFF) << sh
                pal[i] = o
                prev = o
            transforms.append((3, pal))
            if n_colors <= 2:
                xsize = -(-xsize // 8)
            elif n_colors <= 4:
                xsize = -(-xsize // 4)
            elif n_colors <= 16:
                xsize = -(-xsize // 2)
    img = _decode_pixels(r, xsize, height, allow_meta=True)
    for ttype, tdata in reversed(transforms):
        if ttype == 3:
            img = _inv_color_indexing(img, tdata, width)
        elif ttype == 2:
            img = _inv_subtract_green(img)
        elif ttype == 1:
            tiles, bits = tdata
            img = _inv_color_transform(img, tiles, bits)
        else:
            tiles, bits = tdata
            img = _inv_predictor(img, tiles, bits)
    a = ((img >> 24) & 0xFF).astype(np.uint8)
    red = ((img >> 16) & 0xFF).astype(np.uint8)
    g = ((img >> 8) & 0xFF).astype(np.uint8)
    b = (img & 0xFF).astype(np.uint8)
    rgba = np.stack([red, g, b, a], axis=-1)
    return width, height, 4, rgba.tobytes()


# ------------------------------------------------------------------ encoder


def _write_code_single(w: _LsbWriter, sym: int) -> None:
    """SIMPLE code, one symbol (zero bits per use)."""
    w.write(1, 1)  # simple
    w.write(0, 1)  # 1 symbol
    if sym < 2:
        w.write(0, 1)
        w.write(sym, 1)
    else:
        w.write(1, 1)
        w.write(sym, 8)


def _write_code_lengths(
    w: _LsbWriter, lengths: list[int]
) -> dict[int, tuple[int, int]]:
    """Transmit a normal prefix code via the code-length code (plain,
    one CLC symbol per length, no repeat ops — fixtures favor
    simplicity over stream size); returns the canonical
    (code, length) map for payload emission."""
    need = sorted({ln for ln in lengths})
    if len(need) == 1:
        # a complete CLC needs >= 2 symbols; admit a harmless extra
        need = sorted(set(need) | ({0} if need[0] else {1}))
    # pad the CLC symbol set to a power of two so equal-length codes
    # are complete (Kraft == 1); padded symbols are never emitted
    need = list(need)
    while len(need) & (len(need) - 1):
        need.append(next(c for c in range(19) if c not in need))
    bits_per = (len(need) - 1).bit_length()
    if bits_per > 7:
        raise ValueError("code-length code exceeds 3-bit length field")
    cl_lengths = [0] * 19
    for sym in need:
        cl_lengths[sym] = bits_per
    n_codes = max(
        i + 1 for i, sym in enumerate(_CLC_ORDER) if cl_lengths[sym]
    )
    n_codes = max(n_codes, 4)
    w.write(0, 1)  # not simple
    w.write(n_codes - 4, 4)
    for i in range(n_codes):
        w.write(cl_lengths[_CLC_ORDER[i]], 3)
    w.write(0, 1)  # no max-symbol field
    clc = _canonical_from_lengths(cl_lengths)
    for ln in lengths:
        code, n = clc[ln]
        w.write(_rev(code, n), n)
    return _canonical_from_lengths(lengths)


def _rev(code: int, n: int) -> int:
    """Prefix codes are read MSB-of-code-first from the LSB-first
    stream: emit the code's bits in walk order."""
    out = 0
    for i in range(n):
        out = (out << 1) | ((code >> i) & 1)
    return out


def _complete_lengths(n_used: int, alphabet: int) -> list[int]:
    """Uniform-ish COMPLETE code lengths for the first ``n_used``
    symbols of ``alphabet``: with L = floor(log2(n)), x = 2^(L+1) - n
    symbols get length L and the rest length L+1 — Kraft sum exactly
    1 for every n >= 2."""
    if n_used < 2:
        raise ValueError("need >= 2 symbols")
    lo = n_used.bit_length() - 1
    x = (1 << (lo + 1)) - n_used
    lengths = [0] * alphabet
    for i in range(n_used):
        lengths[i] = lo if i < x else lo + 1
    return lengths


def _emit_sym(w: _LsbWriter, codes: dict[int, tuple[int, int]], s: int) -> None:
    code, n = codes[s]
    w.write(_rev(code, n), n)


def encode_webp(
    width: int,
    height: int,
    pixels: bytes,
    *,
    subtract_green: bool = False,
    predictor_mode: int | None = None,
    color_transform: tuple[int, int, int] | None = None,
    palette: bool = False,
    cache_bits: int = 0,
    rle: bool = False,
) -> bytes:
    """Encode RGBA pixels as a lossless VP8L WebP.

    Fixture-oriented but spec-valid: literals travel under COMPLETE
    two-length canonical codes; ``subtract_green``/``predictor_mode``
    (0..13, constant over the image via a one-symbol transform image)/
    ``color_transform`` (constant (g2r, g2b, r2b) elements)/``palette``
    (color indexing with sub-byte bundling when <= 16 colors) stack in
    spec order; ``cache_bits`` > 0 enables the color cache (greedy hit
    emission); ``rle`` emits distance-1 LZ77 runs for repeated pixels.
    Decoding reproduces ``pixels`` bit-for-bit (VP8L is lossless)."""
    if len(pixels) != width * height * 4:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes; "
            f"expected {width * height * 4}"
        )
    px = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, 4)
    argb = (
        (px[..., 3].astype(np.uint32) << 24)
        | (px[..., 0].astype(np.uint32) << 16)
        | (px[..., 1].astype(np.uint32) << 8)
        | px[..., 2].astype(np.uint32)
    )
    w = _LsbWriter()
    w.write(0x2F, 8)
    w.write(width - 1, 14)
    w.write(height - 1, 14)
    w.write(1 if (px[..., 3] != 255).any() else 0, 1)
    w.write(0, 3)  # version

    img = argb.copy()
    xsize = width

    # forward transforms in the order the decoder will read them;
    # the decoder inverts in reverse, so FORWARD application order
    # here must be the reverse of the stream order.  Stream order
    # chosen: predictor, color, subtract-green, color-indexing —
    # forward apply: palette-ize first?  For fixture simplicity each
    # transform is standalone-composable; tests cover the shipped
    # combinations (palette excludes the pixel-space transforms).
    if palette and (
        subtract_green or predictor_mode is not None or color_transform
    ):
        raise ValueError("palette fixtures don't stack with other transforms")

    if predictor_mode is not None:
        if not (0 <= predictor_mode <= 13):
            raise ValueError("predictor mode out of 0..13")
        w.write(1, 1)
        w.write(0, 2)  # PREDICTOR
        bits = 4
        w.write(bits - 2, 3)
        # one-symbol transform image: every tile uses predictor_mode
        _write_transform_const(w, (0xFF << 24) | (predictor_mode << 8))
        img = _forward_predictor(img, predictor_mode)
    if color_transform is not None:
        g2r, g2b, r2b = (v & 0xFF for v in color_transform)
        w.write(1, 1)
        w.write(1, 2)  # COLOR
        bits = 4
        w.write(bits - 2, 3)
        _write_transform_const(
            w, (0xFF << 24) | (r2b << 16) | (g2b << 8) | g2r
        )
        img = _forward_color_transform(img, g2r, g2b, r2b)
    if subtract_green:
        w.write(1, 1)
        w.write(2, 2)  # SUBTRACT_GREEN
        a = (img >> 24) & 0xFF
        red = (img >> 16) & 0xFF
        g = (img >> 8) & 0xFF
        b = img & 0xFF
        img = (a << 24) | (((red - g) & 0xFF) << 16) | (g << 8) | ((b - g) & 0xFF)
    if palette:
        colors = list(dict.fromkeys(int(v) for v in argb.reshape(-1)))
        if len(colors) > 256:
            raise ValueError("palette fixture has > 256 colors")
        w.write(1, 1)
        w.write(3, 2)  # COLOR_INDEXING
        w.write(len(colors) - 1, 8)
        _write_palette(w, colors)
        index = {c: i for i, c in enumerate(colors)}
        n = len(colors)
        ibits = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
        per = 1 << ibits
        depth = 8 >> ibits
        xsize = -(-width // per)
        packed = np.zeros((height, xsize), dtype=np.uint32)
        for y in range(height):
            for x in range(width):
                packed[y, x // per] |= np.uint32(
                    index[int(argb[y, x])] << (depth * (x % per))
                ) << np.uint32(8)
        img = (np.uint32(0xFF) << np.uint32(24)) | packed
    w.write(0, 1)  # end of transforms

    _write_pixels(w, img, xsize, cache_bits=cache_bits, rle=rle)
    body = w.flush()
    chunk = (
        b"VP8L"
        + struct.pack("<I", len(body))
        + body
        + (b"\x00" if len(body) & 1 else b"")  # RIFF even-size pad
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _write_transform_const(w: _LsbWriter, value: int) -> None:
    """Entropy-code a transform image whose every pixel equals
    ``value``: no cache, one-symbol codes per channel — zero bits per
    tile, the trick real encoders use for uniform transforms."""
    w.write(0, 1)  # no color cache
    _write_code_single(w, (value >> 8) & 0xFF)  # green
    _write_code_single(w, (value >> 16) & 0xFF)  # red
    _write_code_single(w, value & 0xFF)  # blue
    _write_code_single(w, (value >> 24) & 0xFF)  # alpha
    _write_code_single(w, 0)  # distance (unused)


def _write_palette(w: _LsbWriter, colors: list[int]) -> None:
    """Palette is a 1-pixel-tall image, entries DELTA-coded
    component-wise; emitted with full literal codes."""
    deltas = []
    prev = 0
    for c in colors:
        d = 0
        for sh in (24, 16, 8, 0):
            d |= (((c >> sh) - (prev >> sh)) & 0xFF) << sh
        deltas.append(d)
        prev = c
    img = np.array([deltas], dtype=np.uint32)
    _write_pixels(w, img, len(colors), cache_bits=0, rle=False, top_level=False)


def _forward_predictor(img: np.ndarray, mode: int) -> np.ndarray:
    """Forward predictor transform (residuals) for a constant mode —
    predictions read the ORIGINAL image (the decoder's reconstruction
    equals it pixel-by-pixel as it walks), so this is the exact
    inverse of :func:`_inv_predictor`."""
    h, w = img.shape
    helper = _PredHelper(img)
    out = np.zeros_like(img)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(img[0, x - 1])
            elif x == 0:
                pred = int(img[y - 1, 0])
            else:
                pred = helper.predict(y, x, mode)
            o = 0
            for sh in (24, 16, 8, 0):
                o |= (
                    (((int(img[y, x]) >> sh) & 0xFF) - ((pred >> sh) & 0xFF))
                    & 0xFF
                ) << sh
            out[y, x] = o
    return out


class _PredHelper:
    """Prediction arithmetic over a known image (shared by the forward
    transform; the decoder's :func:`_inv_predictor` inlines the same
    expressions over the reconstructed image)."""

    def __init__(self, img: np.ndarray) -> None:
        self.img = img
        self.h, self.w = img.shape

    def predict(self, y: int, x: int, mode: int) -> int:
        img = self.img

        def unpack(p):
            return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF

        def avg2(p0, p1):
            a0, r0, g0, b0 = unpack(p0)
            a1, r1, g1, b1 = unpack(p1)
            return (
                (((a0 + a1) // 2) << 24)
                | (((r0 + r1) // 2) << 16)
                | (((g0 + g1) // 2) << 8)
                | ((b0 + b1) // 2)
            )

        if x == 0 and y == 0:
            return 0xFF000000
        if y == 0:
            return int(img[0, x - 1])
        if x == 0:
            return int(img[y - 1, 0])
        left = int(img[y, x - 1])
        top = int(img[y - 1, x])
        tl = int(img[y - 1, x - 1])
        # top-right of the last column = CURRENT row's first pixel
        # (contiguous-memory addressing the spec/libwebp require)
        tr = int(img[y - 1, x + 1]) if x + 1 < self.w else int(img[y, 0])
        if mode == 0:
            return 0xFF000000
        if mode == 1:
            return left
        if mode == 2:
            return top
        if mode == 3:
            return tr
        if mode == 4:
            return tl
        if mode == 5:
            return avg2(avg2(left, tr), top)
        if mode == 6:
            return avg2(left, tl)
        if mode == 7:
            return avg2(left, top)
        if mode == 8:
            return avg2(tl, top)
        if mode == 9:
            return avg2(top, tr)
        if mode == 10:
            return avg2(avg2(left, tl), avg2(top, tr))
        if mode == 11:
            al, rl, gl, bl = unpack(left)
            at, rt, gt, bt = unpack(tl)
            aa, ra, ga, ba = unpack(top)
            p_a = al + aa - at
            p_r = rl + ra - rt
            p_g = gl + ga - gt
            p_b = bl + ba - bt
            dl = abs(p_a - al) + abs(p_r - rl) + abs(p_g - gl) + abs(p_b - bl)
            dt = abs(p_a - aa) + abs(p_r - ra) + abs(p_g - ga) + abs(p_b - ba)
            return left if dl < dt else top
        if mode == 12:
            o = 0
            for sh in (24, 16, 8, 0):
                v = ((left >> sh) & 0xFF) + ((top >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
                o |= max(0, min(255, v)) << sh
            return o
        if mode == 13:
            # ClampAddSubtractHalf: (a - b) / 2 truncates toward ZERO
            # (C integer division), NOT floor
            pavg = avg2(left, top)
            o = 0
            for sh in (24, 16, 8, 0):
                av = (pavg >> sh) & 0xFF
                t = (tl >> sh) & 0xFF
                d = av - t
                v = av + (abs(d) // 2 if d >= 0 else -(abs(d) // 2))
                o |= max(0, min(255, v)) << sh
            return o
        raise ValueError(f"predictor mode {mode} invalid")


def _forward_color_transform(
    img: np.ndarray, g2r: int, g2b: int, r2b: int
) -> np.ndarray:
    """Forward color transform (libwebp VP8LTransformColor): residual
    red = red - delta(g2r, green); residual blue subtracts BOTH green
    and ORIGINAL-red terms (the inverse adds them back using the
    restored red)."""
    h, w = img.shape
    out = np.zeros_like(img)
    for y in range(h):
        for x in range(w):
            argb = int(img[y, x])
            a = (argb >> 24) & 0xFF
            red = (argb >> 16) & 0xFF
            g = (argb >> 8) & 0xFF
            b = argb & 0xFF
            nr = (red - _cdelta(g2r, g)) & 0xFF
            nb = (b - _cdelta(g2b, g) - _cdelta(r2b, red)) & 0xFF
            out[y, x] = (a << 24) | (nr << 16) | (g << 8) | nb
    return out


def _write_pixels(
    w: _LsbWriter,
    img: np.ndarray,
    width: int,
    cache_bits: int,
    rle: bool,
    top_level: bool = True,
) -> None:
    """Emit one entropy-coded ARGB image: optional color cache, no
    meta codes, complete literal codes, optional distance-1 RLE.
    Nested images (palette / transform data) carry the cache bit but
    NO meta-prefix bit — the spec reads that bit only at level 0."""
    h = img.shape[0]
    flat = [int(v) for v in img.reshape(-1)]
    n = len(flat)
    w.write(1 if cache_bits else 0, 1)
    if cache_bits:
        w.write(cache_bits, 4)
    if top_level:
        w.write(0, 1)  # no meta prefix image
    cache_size = (1 << cache_bits) if cache_bits else 0
    # plan the token stream first so each code's symbol set is known
    tokens: list[tuple[str, int]] = []  # (kind, value)
    cache = [None] * cache_size
    i = 0
    while i < n:
        v = flat[i]
        if rle and i > 0 and flat[i - 1] == v:
            run = 1
            while i + run < n and flat[i + run] == v:
                run += 1
            if run >= 3:
                tokens.append(("copy", run))
                if cache_bits:
                    key = (v * _HASH_MUL & 0xFFFFFFFF) >> (32 - cache_bits)
                    cache[key] = v
                i += run
                continue
        if cache_bits:
            key = (v * _HASH_MUL & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[key] == v:
                tokens.append(("cacheref", key))
                i += 1
                continue
            cache[key] = v
        tokens.append(("lit", v))
        i += 1
    # green alphabet usage
    alphabet = _GREEN_BASE + cache_size
    green_used: set[int] = set()
    for kind, val in tokens:
        if kind == "lit":
            green_used.add((val >> 8) & 0xFF)
        elif kind == "copy":
            green_used.add(256 + _prefix_encode(val)[0])
        else:
            green_used.add(280 + val)
    # assign complete lengths over a contiguous prefix covering the
    # used symbols (simplicity over optimality — fixtures are tiny)
    hi = max(green_used) + 1
    green_lengths = _complete_lengths(max(hi, 2), alphabet)
    green_codes = _write_code_lengths(w, green_lengths)
    chan_codes = []
    for _ in range(3):  # red, blue, alpha: full byte alphabets
        chan_codes.append(_write_code_lengths(w, _complete_lengths(256, 256)))
    # distance: only code 1+120 used when rle, else single-symbol
    if rle:
        dist_lengths = _complete_lengths(
            max(_prefix_encode(_DIST_CODE[(1, 0)])[0] + 1, 2), _NUM_DIST
        )
        dist_codes = _write_code_lengths(w, dist_lengths)
    else:
        _write_code_single(w, 0)
        dist_codes = None
    for kind, val in tokens:
        if kind == "lit":
            _emit_sym(w, green_codes, (val >> 8) & 0xFF)
            _emit_sym(w, chan_codes[0], (val >> 16) & 0xFF)
            _emit_sym(w, chan_codes[1], val & 0xFF)
            _emit_sym(w, chan_codes[2], (val >> 24) & 0xFF)
        elif kind == "copy":
            sym, nbits, extra = _prefix_encode(val)
            _emit_sym(w, green_codes, 256 + sym)
            if nbits:
                w.write(extra, nbits)
            # distance 1 via the NEIGHBORHOOD MAP ((dx,dy)=(1,0) ->
            # code 2), not the raw +120 form — so every RLE round trip
            # exercises the decoder's 2-D distance-map branch
            dsym, dnbits, dextra = _prefix_encode(_DIST_CODE[(1, 0)])
            _emit_sym(w, dist_codes, dsym)
            if dnbits:
                w.write(dextra, dnbits)
        else:
            _emit_sym(w, green_codes, 280 + val)
