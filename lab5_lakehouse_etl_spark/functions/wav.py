"""Pure-stdlib WAV (RIFF/PCM) codec — the real AUDIO decode path
behind the multimodal pillar.

No reference file:line — the reference repo has no multimodal surface;
this extends the round-11 "real codecs" push (functions/png.py closed
the image gap) to audio: a writer and a chunk-walking reader for
16-bit little-endian PCM in a RIFF/WAVE container, the format every
audio toolchain can produce losslessly.  PCM is exact, so per-clip
integer sample statistics decoded from real container bytes can be
hash-compared against a closed-form SQL oracle — the same
fixture-formula discipline as the PNG path.

The encoder deliberately emits NON-trivial containers: an ancillary
``LIST``/``INFO`` chunk before ``data`` (decoders must walk chunks,
not assume the 44-byte fast-path layout) whose length alternates
odd/even so the RIFF word-alignment pad rule (an odd-sized chunk is
followed by one pad byte that is NOT counted in its size field) is
exercised on both branches.  A reader that ignores either detail
mis-locates the data chunk and breaks the value hash.

Scale: pure per-record CPU work with no Spark coupling; called inside
Arrow-batched ``mapInPandas`` (functions/multimodal.py) so decode runs
where the payload bytes live and never crosses a shuffle.  In
production the body swaps for libsndfile/ffmpeg behind the same
``(sample_rate, channels, frames)`` contract.

Out of scope (explicit errors, never a wrong answer): compressed
formats (format tags other than 1 = PCM), bit depths other than 16,
and big-endian AIFF containers — none are producible by
:func:`encode_wav`, so the round-trip surface is closed.
"""

from __future__ import annotations

import struct

import numpy as np

#: RIFF format tag for linear PCM.
WAVE_FORMAT_PCM = 1


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    """One RIFF chunk: id + size + payload (+ pad byte if odd size —
    the pad is excluded from the size field per the RIFF spec)."""
    out = ctype + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        out += b"\x00"
    return out


def encode_wav(
    sample_rate: int,
    channels: int,
    samples: np.ndarray,
    info: bytes | None = None,
) -> bytes:
    """Encode interleaved int16 samples as a RIFF/WAVE PCM file.

    ``samples`` is a 1-D int16 array of interleaved frames (length must
    be a multiple of ``channels``).  ``info`` adds an ancillary
    ``LIST`` chunk before ``data`` so readers must chunk-walk.
    """
    if channels < 1 or sample_rate < 1:
        raise ValueError(
            f"need channels >= 1 and sample_rate >= 1, got "
            f"{channels}/{sample_rate}"
        )
    samples = np.asarray(samples, dtype="<i2")
    if samples.ndim != 1 or len(samples) % channels:
        raise ValueError(
            f"need a flat interleaved buffer divisible by {channels} channels"
        )
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH",
        WAVE_FORMAT_PCM,
        channels,
        sample_rate,
        sample_rate * block_align,  # byte rate
        block_align,
        16,  # bits per sample
    )
    body = _chunk(b"fmt ", fmt)
    if info is not None:
        body += _chunk(b"LIST", b"INFO" + info)
    body += _chunk(b"data", samples.tobytes())
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def decode_wav(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a RIFF/WAVE PCM file to ``(sample_rate, channels,
    n_frames, samples)`` with samples as a 1-D int16 array of
    interleaved frames.

    Walks chunks (skipping ancillary ones, honouring the odd-size pad
    rule) and fails loudly on malformed containers — a training
    pipeline must quarantine them, not learn from garbage.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if riff_size + 8 > len(data):
        raise ValueError("truncated WAV: RIFF size exceeds payload")
    pos = 12
    fmt = None
    pcm: bytes | None = None
    while pos + 8 <= len(data):
        ctype = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        end = pos + 8 + length
        if end > len(data):
            raise ValueError(f"truncated WAV chunk {ctype!r}")
        if ctype == b"fmt ":
            if length < 16:
                raise ValueError("WAV fmt chunk shorter than 16 bytes")
            fmt = struct.unpack("<HHIIHH", data[pos + 8 : pos + 24])
        elif ctype == b"data":
            pcm = data[pos + 8 : end]
            break  # data is the last chunk we need
        pos = end + (length % 2)  # skip the pad byte of odd chunks
    if fmt is None:
        raise ValueError("WAV has no fmt chunk")
    tag, channels, sample_rate, _brate, block_align, bits = fmt
    if tag != WAVE_FORMAT_PCM:
        raise NotImplementedError(f"WAV format tag {tag} unsupported (PCM only)")
    if bits != 16:
        raise NotImplementedError(f"bit depth {bits} unsupported")
    if pcm is None:
        raise ValueError("WAV has no data chunk")
    if block_align != channels * 2:
        raise ValueError(
            f"block align {block_align} inconsistent with "
            f"{channels} x 16-bit channels"
        )
    if len(pcm) % block_align:
        raise ValueError("WAV data chunk is not a whole number of frames")
    samples = np.frombuffer(pcm, dtype="<i2")
    return sample_rate, channels, len(pcm) // block_align, samples
