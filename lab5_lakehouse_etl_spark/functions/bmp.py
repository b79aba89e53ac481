"""Pure Python/numpy BMP (Windows DIB) codec — the last common
legacy raster format in scraped corpora, alongside PNG / JPEG / WebP /
GIF.

No reference file:line — the reference repo has no multimodal surface.
Implements the uncompressed BITMAPINFOHEADER forms a corpus actually
contains: 24-bit BGR and 32-bit BGRA pixel data, 8-bit palette
(BGRX color table) images, 4-byte row stride padding, and BOTH row
orders (positive height = bottom-up, the overwhelmingly common form;
negative = top-down).  The matching :func:`encode_bmp` emits all of
them for fixtures.  BMP is uncompressed, so decode(encode(x)) == x
bit-for-bit and the q_multimodal_bmp oracle states exact channel sums
in closed form.

Scale: pure per-record CPU inside Arrow-batched ``mapInPandas``
(functions/multimodal.py); payload bytes never cross a shuffle.

Out of scope (explicit ``NotImplementedError``, never a wrong
answer): RLE4/RLE8 compression, 1/4/16-bit depths, BITFIELDS masks,
and OS/2 BITMAPCOREHEADER files — rare in web corpora; production
swaps in Pillow behind the same contract.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_bmp(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode an uncompressed BMP to ``(width, height, channels,
    pixels)``: 24-bit → RGB (3 channels), 32-bit → RGBA, 8-bit
    palette → RGB via the BGRX color table."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP: bad magic")
    (pix_at,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise NotImplementedError(
            f"BMP header size {hdr_size} unsupported (BITMAPINFOHEADER+)"
        )
    width, height_raw = struct.unpack("<ii", data[18:26])
    planes, depth = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    (colors_used,) = struct.unpack("<I", data[46:50])
    if planes != 1:
        raise ValueError(f"BMP planes {planes} != 1")
    if compression != 0:
        raise NotImplementedError(
            f"BMP compression {compression} unsupported (BI_RGB only)"
        )
    if depth not in (8, 24, 32):
        raise NotImplementedError(f"{depth}-bit BMP unsupported")
    if width <= 0 or height_raw == 0:
        raise ValueError("BMP dimensions invalid")
    top_down = height_raw < 0
    height = -height_raw if top_down else height_raw
    palette = None
    if depth == 8:
        n = colors_used or 256
        pal_at = 14 + hdr_size
        raw = data[pal_at : pal_at + 4 * n]
        if len(raw) != 4 * n:
            raise ValueError("truncated BMP color table")
        bgra = np.frombuffer(raw, np.uint8).reshape(n, 4)
        palette = bgra[:, [2, 1, 0]]  # BGRX -> RGB
    bypp = depth // 8
    stride = (width * bypp + 3) & ~3
    need = stride * height
    if len(data) < pix_at + need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        data[pix_at : pix_at + need], np.uint8
    ).reshape(height, stride)[:, : width * bypp]
    if not top_down:
        rows = rows[::-1]
    if depth == 8:
        idx = rows
        if int(idx.max()) >= len(palette):
            raise ValueError("BMP palette index out of range")
        return width, height, 3, palette[idx].tobytes()
    px = rows.reshape(height, width, bypp)
    if depth == 24:
        return width, height, 3, px[..., [2, 1, 0]].tobytes()
    return width, height, 4, px[..., [2, 1, 0, 3]].tobytes()


def encode_bmp(
    width: int,
    height: int,
    pixels: bytes,
    *,
    depth: int = 24,
    palette: bytes | None = None,
    top_down: bool = False,
) -> bytes:
    """Encode as an uncompressed BITMAPINFOHEADER BMP.

    ``depth=24``: ``pixels`` is RGB; ``depth=32``: RGBA;
    ``depth=8``: palette indices with ``palette`` packed RGB
    (<= 256 entries, stored as the BGRX color table).  ``top_down``
    writes a negative height (rows in natural order) instead of the
    default bottom-up layout."""
    if depth not in (8, 24, 32):
        raise NotImplementedError(f"{depth}-bit BMP encode unsupported")
    ch = {8: 1, 24: 3, 32: 4}[depth]
    if len(pixels) != width * height * ch:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes; "
            f"expected {width * height * ch}"
        )
    table = b""
    n = 0
    if depth == 8:
        if palette is None:
            raise ValueError("8-bit BMP requires a palette")
        n = len(palette) // 3
        if len(palette) != 3 * n or not (1 <= n <= 256):
            raise ValueError("palette must be 1..256 packed RGB entries")
        if max(pixels, default=0) >= n:
            raise ValueError("palette index out of range")
        table = b"".join(
            bytes([palette[3 * i + 2], palette[3 * i + 1], palette[3 * i], 0])
            for i in range(n)
        )
    arr = np.frombuffer(pixels, np.uint8).reshape(height, width, ch)
    if depth == 24:
        arr = arr[..., [2, 1, 0]]
    elif depth == 32:
        arr = arr[..., [2, 1, 0, 3]]
    if not top_down:
        arr = arr[::-1]
    bypp = depth // 8
    stride = (width * bypp + 3) & ~3
    body = bytearray()
    pad = bytes(stride - width * bypp)
    for row in arr:
        body += row.tobytes() + pad
    pix_at = 14 + 40 + len(table)
    hdr = b"BM" + struct.pack(
        "<IHHI", pix_at + len(body), 0, 0, pix_at
    ) + struct.pack(
        "<IiiHHIIiiII",
        40,
        width,
        -height if top_down else height,
        1,
        depth,
        0,
        len(body),
        2835,
        2835,
        n,
        0,
    )
    return hdr + table + bytes(body)
