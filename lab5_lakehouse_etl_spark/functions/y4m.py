"""Pure-stdlib YUV4MPEG2 (.y4m) codec — the real VIDEO frame-sampling
path behind the multimodal pillar.

No reference file:line — the reference repo has no multimodal surface;
this extends the round-11 "real codecs" push (functions/png.py for
images, functions/wav.py for audio) to video.  Y4M is the standard
uncompressed interchange format of the ffmpeg/mjpegtools toolchain: a
plain-text stream header (``YUV4MPEG2 W.. H.. F.. ...``) followed by
``FRAME``-delimited raw planar YUV payloads.  Because frames are
uncompressed, per-frame integer plane statistics decoded from real
container bytes hash-compare exactly against a closed-form SQL oracle
— the same fixture-formula discipline as the PNG/WAV paths.

The encoder deliberately emits NON-trivial streams: optional ``X``
extension parameters on both the stream header and individual FRAME
headers (the spec allows per-frame parameters; a parser that assumes
the literal 6 bytes ``FRAME\\n`` mis-slices every subsequent plane).

Scale: pure per-record CPU work with no Spark coupling; called inside
Arrow-batched ``mapInPandas`` (functions/multimodal.py).  Frame
sampling — the operation a 100 TB video corpus actually runs — slices
only the requested frames out of the payload; the stride math touches
headers, not pixel bytes.  In production the body swaps for
ffmpeg/PyAV behind the same ``(width, height, frames)`` contract.

Out of scope (explicit errors, never a wrong answer): chroma
subsampling other than C444 and C420 (8-bit), interlaced payloads
(``Ip`` progressive only) — none are producible by
:func:`encode_y4m`, so the round-trip surface is closed.
"""

from __future__ import annotations

MAGIC = b"YUV4MPEG2"

#: colourspace tag -> frame size in bytes as a multiple of w*h (8-bit)
_FRAME_FACTOR = {"C444": 3.0, "C420": 1.5, "C420jpeg": 1.5, "C420mpeg2": 1.5}


def encode_y4m(
    width: int,
    height: int,
    frames: list[bytes],
    fps: tuple[int, int] = (25, 1),
    colorspace: str = "C444",
    frame_params: bool = True,
) -> bytes:
    """Encode raw planar YUV frames as a YUV4MPEG2 stream.

    Each element of ``frames`` is one frame's planar payload
    (Y then U then V, ``3*w*h`` bytes for C444).  ``frame_params``
    stamps an ``Xtag=N`` extension on every odd frame header so
    decoders must parse to the newline, not assume ``FRAME\\n``.
    """
    if colorspace not in _FRAME_FACTOR:
        raise NotImplementedError(f"colourspace {colorspace} unsupported")
    if colorspace.startswith("C420") and (width % 2 or height % 2):
        raise ValueError(
            f"C420 requires even dimensions, got {width}x{height}"
        )
    expect = int(width * height * _FRAME_FACTOR[colorspace])
    header = (
        f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} "
        f"Ip A1:1 {colorspace} XYSCSS={colorspace[1:]}\n"
    ).encode("ascii")
    out = bytearray(header)
    for i, frame in enumerate(frames):
        if len(frame) != expect:
            raise ValueError(
                f"frame {i} is {len(frame)} bytes; expected {expect} "
                f"for {width}x{height} {colorspace}"
            )
        if frame_params and i % 2:
            out += f"FRAME Xtag={i}\n".encode("ascii")
        else:
            out += b"FRAME\n"
        out += frame
    return bytes(out)


def parse_header(data: bytes) -> tuple[int, int, tuple[int, int], str, int]:
    """Parse the stream header; returns ``(width, height, fps,
    colorspace, body_offset)``."""
    if not data.startswith(MAGIC + b" ") and data.rstrip(b"\n") != MAGIC:
        raise ValueError("not a Y4M stream: bad magic")
    nl = data.find(b"\n")
    if nl < 0:
        raise ValueError("truncated Y4M stream header")
    width = height = None
    fps = (25, 1)
    colorspace = "C420"  # spec default when no C tag is present
    for token in data[len(MAGIC) : nl].decode("ascii").split():
        if token.startswith("W"):
            width = int(token[1:])
        elif token.startswith("H"):
            height = int(token[1:])
        elif token.startswith("F"):
            num, den = token[1:].split(":")
            fps = (int(num), int(den))
        elif token.startswith("C"):
            colorspace = token
        elif token.startswith("I") and token != "Ip":
            raise NotImplementedError(f"interlacing {token} unsupported")
        # A (aspect) and X (extension) tokens are ancillary — skipped
    if width is None or height is None:
        raise ValueError("Y4M header missing W or H")
    if colorspace not in _FRAME_FACTOR:
        raise NotImplementedError(f"colourspace {colorspace} unsupported")
    if colorspace.startswith("C420") and (width % 2 or height % 2):
        raise ValueError(
            f"C420 requires even dimensions, got {width}x{height}"
        )
    return width, height, fps, colorspace, nl + 1


def plane_sizes(width: int, height: int, colorspace: str) -> tuple[int, int]:
    """``(y_plane_bytes, chroma_plane_bytes)`` for one frame of the
    given colourspace — the layout consumers MUST derive from the
    stream header rather than assume (r11 advice: a C420 payload
    sliced with C444 plane math silently mis-sums both chroma
    planes)."""
    if colorspace not in _FRAME_FACTOR:
        raise NotImplementedError(f"colourspace {colorspace} unsupported")
    y_plane = width * height
    chroma = y_plane if colorspace == "C444" else (width // 2) * (height // 2)
    return y_plane, chroma


def decode_y4m(
    data: bytes, frame_stride: int = 1
) -> tuple[int, int, tuple[int, int], str, list[tuple[int, bytes]]]:
    """Decode a Y4M stream to ``(width, height, fps, colorspace,
    frames)`` where ``frames`` is ``[(frame_idx, planar_payload), ...]``
    for every ``frame_stride``-th frame.  The colourspace is part of
    the return contract (r11 advice) because the planar payload's
    layout depends on it — consumers derive plane sizes via
    :func:`plane_sizes`, never by assuming C444's ``3*w*h``.

    Frame sampling happens HERE, at the container walk: skipped
    frames' pixel bytes are never materialized as Python objects, only
    stepped over — the shape a real decoder preserves by seeking.
    """
    width, height, fps, colorspace, pos = parse_header(data)
    frame_bytes = int(width * height * _FRAME_FACTOR[colorspace])
    frames: list[tuple[int, bytes]] = []
    idx = 0
    while pos < len(data):
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at offset {pos}")
        nl = data.find(b"\n", pos)
        if nl < 0:
            raise ValueError("truncated FRAME header")
        start = nl + 1
        end = start + frame_bytes
        if end > len(data):
            raise ValueError(f"truncated frame {idx}")
        if idx % frame_stride == 0:
            frames.append((idx, data[start:end]))
        pos = end
        idx += 1
    return width, height, fps, colorspace, frames
