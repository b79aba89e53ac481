"""Pure Python CCITT Group 4 (ITU-T T.6) codec — the bilevel fax/scan
compression that dominates archival document corpora (TIFF
Compression=4).

No reference file:line — the reference repo has no multimodal surface.
T.6 is the pure 2-D scheme: every line is coded against the previous
(reference) line with vertical (V0, VR1-3, VL1-3), pass and horizontal
modes; horizontal mode falls back to the T.4 modified-Huffman
run-length alphabets (per-colour terminating codes 0..63 + makeup
codes to 1728, plus the colour-agnostic extended makeups to 2560).

The code tables below are transcribed from the public ITU-T T.4
standard and then EMPIRICALLY verified entry-by-entry against an
independent implementation: tests/test_multimodal.py's build-time
validation (and the committed goldens) drive Java ImageIO's
"CCITT T.6" writer across every run length 0..2560+ and random/
structured documents in both directions, so a transcription error in
any single code cannot survive (it desynchronizes the exact image
that exercises that run length).

Bit order is MSB-first (TIFF FillOrder 1, the default and what
ImageIO writes).  The encoder terminates with EOFB; the decoder stops
after ``height`` rows and accepts either ending — TIFF readers key on
ImageLength, not EOFB.

Pixel convention: 1 = black, 0 = white (photometric mapping to gray
bytes is ``functions/tiff.py``'s job).

Scale: same contract as every codec here — per-record CPU inside
Arrow-batched ``mapInPandas``; payload bytes never cross a shuffle.
"""

from __future__ import annotations

from bisect import bisect_right

# ---------------------------------------------------------- T.4 tables
# (value, bitstring) — transcribed from ITU-T T.4; empirically pinned
# per entry by the Java-ImageIO run-length sweep (module docstring).

_WHITE_TERM = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011",
    14: "110100", 15: "110101", 16: "101010", 17: "101011",
    18: "0100111", 19: "0001100", 20: "0001000", 21: "0010111",
    22: "0000011", 23: "0000100", 24: "0101000", 25: "0101011",
    26: "0010011", 27: "0100100", 28: "0011000", 29: "00000010",
    30: "00000011", 31: "00011010", 32: "00011011", 33: "00010010",
    34: "00010011", 35: "00010100", 36: "00010101", 37: "00010110",
    38: "00010111", 39: "00101000", 40: "00101001", 41: "00101010",
    42: "00101011", 43: "00101100", 44: "00101101", 45: "00000100",
    46: "00000101", 47: "00001010", 48: "00001011", 49: "01010010",
    50: "01010011", 51: "01010100", 52: "01010101", 53: "00100100",
    54: "00100101", 55: "01011000", 56: "01011001", 57: "01011010",
    58: "01011011", 59: "01001010", 60: "01001011", 61: "00110010",
    62: "00110011", 63: "00110100",
}
_WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100",
    512: "01100101", 576: "01101000", 640: "01100111",
    704: "011001100", 768: "011001101", 832: "011010010",
    896: "011010011", 960: "011010100", 1024: "011010101",
    1088: "011010110", 1152: "011010111", 1216: "011011000",
    1280: "011011001", 1344: "011011010", 1408: "011011011",
    1472: "010011000", 1536: "010011001", 1600: "010011010",
    1664: "011000", 1728: "010011011",
}
_BLACK_TERM = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011",
    5: "0011", 6: "0010", 7: "00011", 8: "000101", 9: "000100",
    10: "0000100", 11: "0000101", 12: "0000111", 13: "00000100",
    14: "00000111", 15: "000011000", 16: "0000010111",
    17: "0000011000", 18: "0000001000", 19: "00001100111",
    20: "00001101000", 21: "00001101100", 22: "00000110111",
    23: "00000101000", 24: "00000010111", 25: "00000011000",
    26: "000011001010", 27: "000011001011", 28: "000011001100",
    29: "000011001101", 30: "000001101000", 31: "000001101001",
    32: "000001101010", 33: "000001101011", 34: "000011010010",
    35: "000011010011", 36: "000011010100", 37: "000011010101",
    38: "000011010110", 39: "000011010111", 40: "000001101100",
    41: "000001101101", 42: "000011011010", 43: "000011011011",
    44: "000001010100", 45: "000001010101", 46: "000001010110",
    47: "000001010111", 48: "000001100100", 49: "000001100101",
    50: "000001010010", 51: "000001010011", 52: "000000100100",
    53: "000000110111", 54: "000000111000", 55: "000000100111",
    56: "000000101000", 57: "000001011000", 58: "000001011001",
    59: "000000101011", 60: "000000101100", 61: "000001011010",
    62: "000001100110", 63: "000001100111",
}
_BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}
#: extended makeups, colour-agnostic (T.4 table 3)
_EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

#: decode maps: bitstring -> run value, per colour (extended shared)
_WHITE_DEC = {
    **{v: k for k, v in _WHITE_TERM.items()},
    **{v: k for k, v in _WHITE_MAKEUP.items()},
    **{v: k for k, v in _EXT_MAKEUP.items()},
}
_BLACK_DEC = {
    **{v: k for k, v in _BLACK_TERM.items()},
    **{v: k for k, v in _BLACK_MAKEUP.items()},
    **{v: k for k, v in _EXT_MAKEUP.items()},
}
_MAX_CODE_LEN = 13


class _BitReader:
    """MSB-first bit reader over the strip bytes."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def take(self, n: int) -> int:
        out = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("truncated CCITT G4 stream")
            out = (out << 1) | ((self.data[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return out

    def take_bit(self) -> int:
        return self.take(1)


def _read_run(br: _BitReader, color: int) -> int:
    """One complete run length: makeup codes accumulate until a
    terminating code (< 64) closes the run."""
    table = _BLACK_DEC if color else _WHITE_DEC
    total = 0
    while True:
        code = ""
        for _ in range(_MAX_CODE_LEN):
            code += "1" if br.take_bit() else "0"
            if code in table:
                break
        else:
            raise ValueError("invalid CCITT G4 run-length code")
        run = table[code]
        total += run
        if run < 64:
            return total


def _changes_of(row, width: int) -> list[int]:
    """Positions where the row's colour flips (colour before position
    0 is white) — the changing-element array both coders walk.
    Vectorized: this runs once per decoded row, and a pure-Python
    walk made WIDTH the decoder's cost center."""
    import numpy as np

    arr = np.frombuffer(bytes(row), np.uint8)[:width]
    prev = np.concatenate(([0], arr[:-1]))
    return np.flatnonzero(arr != prev).tolist()


def _b1_b2(ref_changes: list[int], a0: int, color: int, width: int):
    """b1: first changing element on the reference line right of a0
    with colour opposite to a0's colour (transition index parity:
    even transitions turn black, odd turn white); b2: the next one."""
    i = bisect_right(ref_changes, a0 if a0 >= 0 else -1)
    # skip to the right parity: white coding colour needs an
    # even-index (to-black) transition, black an odd-index one
    if i < len(ref_changes) and i % 2 != (0 if color == 0 else 1):
        i += 1
    b1 = ref_changes[i] if i < len(ref_changes) else width
    b2 = ref_changes[i + 1] if i + 1 < len(ref_changes) else width
    return b1, b2


def _decode_row_2d(br: _BitReader, ref_changes: list[int], width: int) -> bytearray:
    """Decode ONE 2-D-coded row against its reference line — the T.6
    row coder, shared verbatim by G4 strips and T.4 2-D rows."""
    row = bytearray(width)
    a0 = -1
    color = 0
    while (a0 if a0 >= 0 else 0) < width:
        b1, b2 = _b1_b2(ref_changes, a0, color, width)
        # mode decision tree (T.6 table 1): V0=1, VR1=011, VL1=010,
        # H=001, P=0001, VR2=000011, VL2=000010, VR3=0000011,
        # VL3=0000010, EOFB prefix=0000000...
        if br.take_bit():
            a1 = b1  # V0
        elif br.take_bit():
            a1 = b1 + 1 if br.take_bit() else b1 - 1  # 011/010
        elif br.take_bit():
            # 001: horizontal — two MH runs from a0
            a0s = max(a0, 0)
            r1 = _read_run(br, color)
            r2 = _read_run(br, 1 - color)
            if r1 == 0 and r2 == 0:
                raise ValueError("CCITT G4 zero-progress horizontal")
            a1 = a0s + r1
            a2 = a1 + r2
            if a2 > width or a1 > width:
                raise ValueError("CCITT G4 horizontal run overruns row")
            if color:
                row[a0s:a1] = b"\x01" * (a1 - a0s)
            else:
                row[a1:a2] = b"\x01" * (a2 - a1)
            a0 = a2
            continue
        elif br.take_bit():
            # 0001: pass — a0..b2-1 keep the current colour
            if color:
                lo, hi = max(a0, 0), min(b2, width)
                row[lo:hi] = b"\x01" * (hi - lo)
            a0 = b2
            continue
        elif br.take_bit():
            a1 = b1 + 2 if br.take_bit() else b1 - 2  # 000011/000010
        elif br.take_bit():
            a1 = b1 + 3 if br.take_bit() else b1 - 3  # 0000011/0000010
        else:
            # 0000000...: EOFB or damage — either way the strip has
            # no more rows for us
            raise ValueError(
                "CCITT G4 stream ended before the strip filled"
            )
        # vertical modes land here with a1 set
        if a1 < 0 or a1 > width:
            raise ValueError("CCITT G4 vertical mode out of range")
        if a0 >= 0 and a1 <= a0:
            # changing elements are strictly increasing; a corrupt
            # stream violating that would loop forever
            raise ValueError("CCITT G4 vertical mode moves backwards")
        if color:
            lo = max(a0, 0)
            row[lo:a1] = b"\x01" * (a1 - lo)
        a0 = a1
        color ^= 1
    return row


def g4_decode(data: bytes, width: int, height: int) -> bytes:
    """Decode a T.6 strip to one byte per pixel (1 = black)."""
    if width <= 0 or height <= 0:
        raise ValueError("CCITT G4 dimensions invalid")
    br = _BitReader(data)
    out = bytearray()
    ref_changes: list[int] = []  # imaginary all-white line above row 0
    for _y in range(height):
        row = _decode_row_2d(br, ref_changes, width)
        ref_changes = _changes_of(row, width)
        out += row
    return bytes(out)


def _emit_run(bits: list[str], run: int, color: int) -> None:
    makeup = _BLACK_MAKEUP if color else _WHITE_MAKEUP
    term = _BLACK_TERM if color else _WHITE_TERM
    while run >= 64:
        m = min(2560, (run // 64) * 64)
        if m > 1728:
            bits.append(_EXT_MAKEUP[m])
        else:
            bits.append(makeup[m])
        run -= m
    bits.append(term[run])


def _encode_row_2d(
    bits: list[str],
    ref_changes: list[int],
    cur_changes: list[int],
    width: int,
) -> None:
    """Encode ONE row 2-D against its reference line (the T.6 row
    coder, shared by G4 strips and T.4 2-D rows)."""
    a0 = -1
    color = 0
    while (a0 if a0 >= 0 else 0) < width:
        # a1: next changing element right of a0 with colour
        # opposite to the coding colour (same parity rule as b1)
        i = bisect_right(cur_changes, a0 if a0 >= 0 else -1)
        while i < len(cur_changes) and i % 2 != (
            0 if color == 0 else 1
        ):
            i += 1
        a1 = cur_changes[i] if i < len(cur_changes) else width
        b1, b2 = _b1_b2(ref_changes, a0, color, width)
        if b2 < a1:
            bits.append("0001")  # pass
            a0 = b2
            continue
        d = a1 - b1
        if -3 <= d <= 3:
            bits.append(
                {
                    0: "1",
                    1: "011", -1: "010",
                    2: "000011", -2: "000010",
                    3: "0000011", -3: "0000010",
                }[d]
            )
            a0 = a1
            color ^= 1
            continue
        # horizontal: two runs from max(a0, 0)
        j = i + 1
        a2 = cur_changes[j] if j < len(cur_changes) else width
        bits.append("001")
        a0s = max(a0, 0)
        _emit_run(bits, a1 - a0s, color)
        _emit_run(bits, a2 - a1, 1 - color)
        a0 = a2


def _pack_bits(bits: list[str]) -> bytes:
    stream = "".join(bits)
    stream += "0" * (-len(stream) % 8)
    return bytes(
        int(stream[i : i + 8], 2) for i in range(0, len(stream), 8)
    )


def g4_encode(pixels: bytes, width: int, height: int) -> bytes:
    """Encode one-byte-per-pixel bilevel content (nonzero = black) as
    a T.6 strip, EOFB-terminated."""
    if len(pixels) != width * height:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes; "
            f"expected {width * height}"
        )
    bits: list[str] = []
    ref_changes: list[int] = []
    for y in range(height):
        row = [1 if pixels[y * width + x] else 0 for x in range(width)]
        cur_changes = _changes_of(row, width)
        _encode_row_2d(bits, ref_changes, cur_changes, width)
        ref_changes = cur_changes
    bits.append("000000000001" * 2)  # EOFB
    return _pack_bits(bits)


# ------------------------------------------ T.4 variants (MH and G3)


def _decode_row_1d(br: _BitReader, width: int) -> bytearray:
    """Decode ONE 1-D (modified-Huffman) row: alternating white/black
    MH runs summing exactly to the row width."""
    row = bytearray(width)
    pos = 0
    color = 0
    while pos < width:
        run = _read_run(br, color)
        if pos + run > width:
            raise ValueError("CCITT MH run overruns row")
        if color:
            row[pos : pos + run] = b"\x01" * run
        pos += run
        color ^= 1
    return row


def _encode_row_1d(bits: list[str], row, width: int) -> None:
    changes = _changes_of(row, width)
    pos = 0
    color = 0
    for c in changes + [width]:
        _emit_run(bits, c - pos, color)
        pos = c
        color ^= 1
        if pos >= width:
            break


def mh_decode(data: bytes, width: int, height: int) -> bytes:
    """TIFF Compression 2 (Modified Huffman / "CCITT RLE"): each row
    an independent 1-D MH code starting on a BYTE boundary (the TIFF
    spec's byte-alignment rule for this compression)."""
    if width <= 0 or height <= 0:
        raise ValueError("CCITT MH dimensions invalid")
    br = _BitReader(data)
    out = bytearray()
    for _y in range(height):
        out += _decode_row_1d(br, width)
        br.pos = (br.pos + 7) & ~7  # rows are byte-aligned
    return bytes(out)


def mh_encode(pixels: bytes, width: int, height: int) -> bytes:
    """Encoder twin of :func:`mh_decode` (gray-ink convention as
    :func:`g4_encode`: nonzero byte = black)."""
    if len(pixels) != width * height:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes; "
            f"expected {width * height}"
        )
    out = bytearray()
    for y in range(height):
        bits: list[str] = []
        row = [1 if pixels[y * width + x] else 0 for x in range(width)]
        _encode_row_1d(bits, row, width)
        out += _pack_bits(bits)  # per-row pack = byte alignment
    return bytes(out)


_EOL = "000000000001"


def _expect_eol(br: _BitReader) -> None:
    """Consume fill bits + one EOL: zero or more 0s, then the 12-bit
    EOL's closing 1 (T.4 permits fill zeros before every EOL; at
    least 11 zeros must precede the 1)."""
    zeros = 0
    while True:
        if br.take_bit():
            if zeros < 11:
                raise ValueError("CCITT G3: malformed EOL")
            return
        zeros += 1
        if zeros > 64 + 11:  # fill is bounded in practice; corrupt
            raise ValueError("CCITT G3: runaway EOL fill")


def g3_decode(
    data: bytes, width: int, height: int, two_d: bool = False
) -> bytes:
    """TIFF Compression 3 (ITU-T T.4 / Group 3): every row preceded
    by an EOL (with optional fill); in 2-D mode (T4Options bit 0) a
    tag bit after each EOL selects 1-D (tag 1, MH runs) or 2-D
    (tag 0, the T.6 row coder against the previous row)."""
    if width <= 0 or height <= 0:
        raise ValueError("CCITT G3 dimensions invalid")
    br = _BitReader(data)
    out = bytearray()
    ref_changes: list[int] = []
    for _y in range(height):
        _expect_eol(br)
        if two_d:
            if br.take_bit():
                row = _decode_row_1d(br, width)
            else:
                row = _decode_row_2d(br, ref_changes, width)
        else:
            row = _decode_row_1d(br, width)
        ref_changes = _changes_of(row, width)
        out += row
    return bytes(out)


def g3_encode(
    pixels: bytes, width: int, height: int, two_d: bool = False
) -> bytes:
    """Encoder twin of :func:`g3_decode`: 1-D mode emits EOL + MH
    rows; 2-D mode emits EOL + tag per row, coding row 0 as 1-D and
    later rows 2-D against their predecessor (a legal K-parameter
    choice any T.4 decoder accepts), RTC-terminated."""
    if len(pixels) != width * height:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes; "
            f"expected {width * height}"
        )
    bits: list[str] = []
    ref_changes: list[int] = []
    for y in range(height):
        row = [1 if pixels[y * width + x] else 0 for x in range(width)]
        cur_changes = _changes_of(row, width)
        bits.append(_EOL)
        if two_d:
            if y == 0:
                bits.append("1")
                _encode_row_1d(bits, row, width)
            else:
                bits.append("0")
                _encode_row_2d(bits, ref_changes, cur_changes, width)
        else:
            _encode_row_1d(bits, row, width)
        ref_changes = cur_changes
    # RTC: six EOLs (with tag bit 1 each in 2-D mode, per T.4)
    for _ in range(6):
        bits.append(_EOL + ("1" if two_d else ""))
    return _pack_bits(bits)
