"""Per-file Bloom filters for equality data skipping (the Delta
``delta.bloomFilter.*`` bloom-filter-index twin, cf. reference scope:
the reference's Delta tables get this from delta-spark; here it is part
of the LakeTable manifest stats).

Min/max stats prune RANGE predicates and only bite when a file owns a
compact value range (after cluster_by/zorder_by).  A point lookup on an
UNCLUSTERED column — ``WHERE user_id = X`` against files whose id range
all spans the whole domain — can never skip on min/max.  A per-file
Bloom filter over the column's distinct values gives a sound membership
test: a set bit may be a false positive (file kept, harmless), but an
unset bit PROVES absence (file skipped).  At 100 TB this turns needle
lookups from a full file listing into touching the handful of files
whose filters claim the value.

Design constraints that shape this module:

- The same (value -> bit positions) function must be computable on the
  DRIVER (``prune_files`` walks the manifest in Python) and usable as a
  LITERAL in a Spark expression (``prune_files_distributed`` filters the
  stats-checkpoint relation JVM-side, where re-hashing per row is not
  an option).  Positions are therefore derived once, driver-side, from
  the predicate value; the distributed proof tests literal (word, bit)
  coordinates against the stored filter words.
- Kind-tagged hashing: an int column's filter must never answer for a
  string probe (or vice versa), so values hash with an ``i:``/``s:``
  prefix and the stored filter records its kind.  Only int64-able and
  string columns get filters; any other kind (float equality is
  ill-posed for skipping, temporal values land in min/max already)
  contributes no filter — conservative, never unsound.
- md5 double hashing (Kirsch-Mitzenmacher): position_j =
  (h1 + j*h2) mod m with h1/h2 the two 64-bit halves of md5 over the
  tagged value bytes, h2 forced odd.  md5 because both sides of the
  contract (Python driver, literal positions) hash identically with
  zero dependencies.
- Filters store as little-endian 64-bit words, masked to SIGNED int64
  so they round-trip JSON manifests and parquet checkpoints unchanged.
  Bit b of the filter lives at word b//64, bit b%64; arithmetic right
  shift keeps ``(word >> bit) & 1`` correct for negative words on both
  Python ints and Spark longs.
"""

from __future__ import annotations

import hashlib

DEFAULT_M = 8192  # bits per filter (1 KiB); fp ~ 0.5^k at ~1k distinct
DEFAULT_K = 6  # hash probes per value

_SIGN = 1 << 63
_WORD = (1 << 64) - 1


def _to_signed(w: int) -> int:
    return w - (1 << 64) if w >= _SIGN else w


def value_bytes(value) -> bytes | None:
    """Kind-tagged canonical bytes for a probe/stored value, or None
    when the kind does not participate in bloom skipping (bool, float,
    temporal, bytes, None)."""
    if isinstance(value, bool) or value is None:
        return None
    if isinstance(value, int):
        return b"i:" + str(value).encode("ascii")
    if isinstance(value, str):
        return b"s:" + value.encode("utf-8")
    return None


def kind_tag(value) -> str | None:
    if isinstance(value, bool) or value is None:
        return None
    if isinstance(value, int):
        return "i"
    if isinstance(value, str):
        return "s"
    return None


def positions(value, m: int, k: int) -> list[int] | None:
    """The k bit positions of ``value`` in an m-bit filter, or None if
    the value's kind has no bloom representation."""
    data = value_bytes(value)
    if data is None:
        return None
    d = hashlib.md5(data).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1  # odd: full-period stride
    return [(h1 + j * h2) % m for j in range(k)]


def build(values, m: int = DEFAULT_M, k: int = DEFAULT_K) -> list[int]:
    """Build filter words (signed int64 list, length m/64 rounded up)
    over an iterable of values; non-representable values are skipped —
    the CALLER must ensure only int/str values reach here (a skipped
    value would be a soundness hole, so table.py restricts filters to
    int/string columns at collection time)."""
    bits = 0
    for v in values:
        pos = positions(v, m, k)
        if pos is None:
            continue
        for p in pos:
            bits |= 1 << p
    n_words = (m + 63) // 64
    return [
        _to_signed((bits >> (64 * i)) & _WORD) for i in range(n_words)
    ]


def might_contain(words: list[int], pos: list[int]) -> bool:
    """Driver-side membership probe: True unless some probed bit is
    unset (an unset bit is a PROOF of absence; all-set is only a
    maybe)."""
    for p in pos:
        w, b = divmod(p, 64)
        if not (words[w] >> b) & 1:
            return False
    return True
