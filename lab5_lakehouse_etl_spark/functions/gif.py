"""Pure Python/numpy GIF codec (GIF87a/GIF89a) — LZW-compressed
palette images, the web's other ubiquitous legacy format, completing
the image pillar alongside PNG / JPEG / WebP-VP8L.

No reference file:line — the reference repo has no multimodal surface.
Implements the public GIF specification: header + logical screen
descriptor, global/local color tables, the variable-width LZW decoder
(clear/EOI codes, the KwKwK self-reference case, width growth at each
filled power of two up to 12 bits, dictionary reset on CLEAR,
lenient cap-at-4096 when an encoder defers its clear), 255-byte
sub-block de-packaging, 4-pass INTERLACE reordering, and GIF89a
graphic-control transparency (the flagged palette index decodes to
alpha 0).  Decode returns the FIRST image frame as RGBA — for
animations the remaining frames are counted but not rendered (a
training pipeline samples frames explicitly; see
:func:`gif_frame_count`).

The matching :func:`encode_gif` generates spec-valid streams for
fixtures: real LZW compression (dictionary build, width management
mirroring the decoder, CLEAR emission before the 4096 ceiling),
optional interlace, optional transparency, any palette <= 256.  GIF
is LOSSLESS for palette content, so decode(encode(x)) == x and the
q_multimodal_gif oracle states exact channel sums in closed form.

Scale: pure per-record CPU inside Arrow-batched ``mapInPandas``
(functions/multimodal.py); payload bytes never cross a shuffle.  In
production the body swaps for Pillow behind the same contract.

Out of scope (explicit ``NotImplementedError``, never a wrong
answer): rendering animation frames past the first (plain-text and
application extensions are skipped per spec; LOCAL color tables on
the first frame are supported).
"""

from __future__ import annotations

import struct

import numpy as np

_MAGICS = (b"GIF87a", b"GIF89a")

#: interlace pass layout: (first row, stride) per the spec's 4 passes
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(mcs: int, data: bytes, n_expected: int) -> bytes:
    """Variable-width GIF-LZW decode of the concatenated sub-block
    payload; returns exactly ``n_expected`` palette indices (a stream
    yielding more is clipped per the lenient convention; fewer raises).
    """
    if not (2 <= mcs <= 8):
        raise ValueError(f"LZW minimum code size {mcs} out of 2..8")
    clear = 1 << mcs
    eoi = clear + 1
    width = mcs + 1
    # dictionary as (prefix code, last byte); singles are implicit
    prefix: list[int] = [0] * 4096
    suffix: list[int] = [0] * 4096
    next_index = eoi + 1
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev = -1

    def entry(code: int) -> bytes:
        s = bytearray()
        while code >= clear:
            s.append(suffix[code])
            code = prefix[code]
        s.append(code)
        return bytes(reversed(s))

    while len(out) < n_expected:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            width = mcs + 1
            next_index = eoi + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:
            if code >= clear:
                raise ValueError("GIF LZW: first code after clear not a root")
            out.append(code)
        else:
            if code < next_index:
                s = entry(code)
            elif code == next_index:
                p = entry(prev)
                s = p + p[:1]  # KwKwK
            else:
                raise ValueError("GIF LZW code out of range")
            out += s
            if next_index < 4096:
                prefix[next_index] = prev
                suffix[next_index] = s[0]
                next_index += 1
                if next_index == (1 << width) and width < 12:
                    width += 1
        prev = code
    if len(out) < n_expected:
        raise ValueError("GIF LZW stream ended before the frame filled")
    return bytes(out[:n_expected])


def _lzw_encode(mcs: int, indices: bytes) -> bytes:
    """GIF-LZW encode; width management mirrors the decoder exactly
    (bump when the NEXT free slot reaches the current width's ceiling,
    CLEAR + reset before the 4096 dictionary fills)."""
    clear = 1 << mcs
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = mcs + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, width)
    cur = b""
    for b in indices:
        cand = cur + bytes([b])
        if cand in table:
            cur = cand
            continue
        emit(table[cur], width)
        # mirror the DECODER's growth: the decoder learns each entry
        # one code LATER than the encoder adds it (it needs the next
        # code's first byte), so its next free slot is always
        # next_code - 1; it widens when THAT hits 1 << width — i.e.
        # the encoder widens at next_code == (1 << width) + 1.
        # Widening at (1 << width) instead is TIFF's "early change",
        # which desyncs GIF decoders at every width boundary.
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4095:  # reset before the ceiling
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = mcs + 1
        cur = bytes([b])
    if cur:
        emit(table[cur], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _subblocks(payload: bytes) -> bytes:
    out = bytearray()
    at = 0
    while at < len(payload):
        chunk = payload[at : at + 255]
        out.append(len(chunk))
        out += chunk
        at += 255
    out.append(0)  # block terminator
    return bytes(out)


def decode_gif(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a GIF to ``(width, height, 4, RGBA bytes)`` — the first
    frame, composed onto the logical screen at its frame offset with
    the background outside it; GIF89a transparency maps the flagged
    index to alpha 0."""
    if len(data) < 13 or data[:6] not in _MAGICS:
        raise ValueError("not a GIF: bad magic")
    sw, sh, flags, bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], np.uint8)
        if len(gct) != 3 * n:
            raise ValueError("truncated GIF global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n
    transparent = -1
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            raise ValueError("GIF has no image descriptor")
        if block == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("truncated GIF extension")
            label = data[pos]
            pos += 1
            # graphic control: pick up the transparency flag/index
            if label == 0xF9 and pos + 6 <= len(data) and data[pos] == 4:
                gc_flags = data[pos + 1]
                if gc_flags & 0x01:
                    transparent = data[pos + 4]
            # skip the sub-blocks of ANY extension
            while True:
                if pos >= len(data):
                    raise ValueError("truncated GIF extension blocks")
                n = data[pos]
                pos += 1
                if n == 0:
                    break
                pos += n
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
        break
    else:
        raise ValueError("GIF has no image descriptor")
    if pos + 9 > len(data):
        raise ValueError("truncated GIF image descriptor")
    fx, fy, fw, fh, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
    pos += 9
    if fw == 0 or fh == 0 or fx + fw > sw or fy + fh > sh:
        raise ValueError("GIF frame rectangle outside the logical screen")
    table = gct
    if iflags & 0x80:  # local color table
        n = 2 << (iflags & 0x07)
        lct = np.frombuffer(data[pos : pos + 3 * n], np.uint8)
        if len(lct) != 3 * n:
            raise ValueError("truncated GIF local color table")
        table = lct.reshape(n, 3)
        pos += 3 * n
    if table is None:
        raise ValueError("GIF frame has no color table")
    if pos >= len(data):
        raise ValueError("truncated GIF before LZW data")
    mcs = data[pos]
    pos += 1
    lzw = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF image sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            break
        lzw += data[pos : pos + n]
        pos += n
    idx = np.frombuffer(
        _lzw_decode(mcs, bytes(lzw), fw * fh), np.uint8
    ).reshape(fh, fw)
    if (iflags & 0x40) and fh > 1:  # interlaced: reorder the 4 passes
        rows = []
        for first, stride in _INTERLACE:
            rows += list(range(first, fh, stride))
        un = np.zeros_like(idx)
        un[np.array(rows)] = idx
        idx = un
    if int(idx.max()) >= len(table):
        raise ValueError("GIF palette index out of range")
    frame = np.zeros((fh, fw, 4), np.uint8)
    frame[..., :3] = table[idx]
    frame[..., 3] = 255
    if transparent >= 0:
        frame[idx == transparent, 3] = 0
    # compose onto the logical screen: background color, opaque,
    # outside the frame rectangle (first-frame semantics)
    out = np.zeros((sh, sw, 4), np.uint8)
    if gct is not None and bg < len(gct):
        out[..., :3] = gct[bg]
    out[..., 3] = 255
    out[fy : fy + fh, fx : fx + fw] = frame
    return sw, sh, 4, out.tobytes()


def gif_frame_count(data: bytes) -> int:
    """Number of image descriptors in the stream (animation length)
    without decoding any pixels — a container-walk metadata op."""
    if len(data) < 13 or data[:6] not in _MAGICS:
        raise ValueError("not a GIF: bad magic")
    flags = data[10]
    pos = 13
    if flags & 0x80:
        pos += 3 * (2 << (flags & 0x07))
    count = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            pos += 1
            while True:
                n = data[pos]
                pos += 1
                if n == 0:
                    break
                pos += n
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
        _fx, _fy, fw, fh, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        if iflags & 0x80:
            pos += 3 * (2 << (iflags & 0x07))
        pos += 1  # LZW minimum code size
        while True:
            n = data[pos]
            pos += 1
            if n == 0:
                break
            pos += n
        count += 1
    return count


def encode_gif(
    width: int,
    height: int,
    indices: bytes,
    palette: bytes,
    *,
    interlace: bool = False,
    transparent: int | None = None,
) -> bytes:
    """Encode palette indices as a GIF (89a when ``transparent`` is
    set, else 87a): real LZW compression, optional 4-pass interlace
    row reordering, optional transparency via a graphic-control
    extension.  ``palette`` is packed RGB (<= 256 entries); the color
    table is padded to the next power of two per spec."""
    if len(indices) != width * height:
        raise ValueError(
            f"index buffer is {len(indices)} bytes; expected {width * height}"
        )
    n = len(palette) // 3
    if len(palette) != 3 * n or not (1 <= n <= 256):
        raise ValueError("palette must be 1..256 packed RGB entries")
    if max(indices, default=0) >= n:
        raise ValueError("palette index out of range")
    if transparent is not None and not (0 <= transparent < n):
        raise ValueError("transparent index out of range")
    size_field = max(1, (max(n, 2) - 1).bit_length())  # table = 2^size
    table = palette + bytes(3 * ((1 << size_field) - n))
    flags = 0x80 | (size_field - 1)
    magic = b"GIF89a" if transparent is not None else b"GIF87a"
    out = bytearray(magic)
    out += struct.pack("<HHBBB", width, height, flags, 0, 0)
    out += table
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    iflags = 0x40 if interlace else 0x00
    out += bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, width, height, iflags)
    idx = np.frombuffer(indices, np.uint8).reshape(height, width)
    if interlace and height > 1:
        rows = []
        for first, stride in _INTERLACE:
            rows += list(range(first, height, stride))
        idx = idx[np.array(rows)]
    mcs = max(2, size_field)
    out += bytes([mcs])
    out += _subblocks(_lzw_encode(mcs, idx.tobytes()))
    out += bytes([0x3B])  # trailer
    return bytes(out)
