"""URL canonicalization — the identity function of URL-level dedup in
a web-scraped corpus: the same page arrives as ``HTTP://Example.com:80/
a/?utm_source=x`` and ``http://example.com/a/`` and must collapse to
ONE key before any content pass runs.  Pure JVM regex/replace column
expressions (no UDF, no parser library), with the DuckDB twin built
from the SAME pattern table so the declared query
(``q_url_canonicalize``) hash-pins every pattern's semantics across
java.util.regex and RE2 — the functions/html.py precedent.

Canonical form (the standard conservative pipeline subset):

1. strip the fragment (``#…`` never reaches the server);
2. lowercase the scheme and host (RFC 3986 §6.2.2.1 — path and query
   stay case-sensitive);
3. drop the scheme's DEFAULT port (``http://h:80`` / ``https://h:443``);
4. remove tracking parameters (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``, ``ref_src``) wherever they sit in the query string,
   preserving the order of the parameters that remain (sorting would
   be a stronger normalization some mirrors disagree on — documented
   boundary);
5. drop an empty leftover ``?``;
6. trim trailing path slashes — INCLUDING the root (``/a/`` == ``/a``
   and ``http://h/`` == ``http://h`` for the dedup key: RFC 3986
   §6.2.3 makes the empty path equivalent to ``/`` for http(s)).

Replacement strings use each engine's backreference syntax ($1 vs
\\1) — the PATTERNS are shared and RE2-compatible (no lookarounds:
default-port and trailing-slash matches CAPTURE their delimiter and
write it back).  Tracked-param removal wraps the query in ``&``
sentinels and DOUBLES every separator first, so each parameter owns
a leading AND a trailing ``&`` that no neighbour shares: the removal
pattern can then require its terminating ``&`` — making the NAME
boundary explicit (``&fbclid&``/``&fbclid=…&`` matches;
``&fbclid_x=1&`` does not, the r14-advice collision) — and a run of
adjacent tracked params, like the canonical five-field utm block,
still vanishes in ONE global pass because consecutive matches never
compete for a shared delimiter.  Collapsing ``&&`` back to ``&`` and
stripping the sentinels restores the surviving parameters verbatim
(separator runs stay even under removal, so the collapse is exact —
a literal ``a=1&&b=2`` empty-parameter gap round-trips unchanged).

No counterpart in the reference repo.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tracking query parameters dropped from the canonical form
_TRACKED = r"(utm_[^=&]*|fbclid|gclid|msclkid|ref_src)"

_FRAGMENT = r"#.*$"
_PREFIX = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
_HTTP_80 = r"^(http://[^/?#:]*):80($|[/?#])"
_HTTPS_443 = r"^(https://[^/?#:]*):443($|[/?#])"
_TRACKED_PARAM = rf"&{_TRACKED}(=[^&]*)?&"
_TRAIL_SLASH = r"^([^?#]*[^/?#])/+(\?|$)"


def canonical_url(col: str | Column) -> Column:
    """Canonical dedup key of one URL column (see module docstring).
    NULL in, NULL out; a value with no scheme://host prefix passes
    through steps that don't apply (the conservative behavior for a
    dirty crawl column)."""
    u = F.col(col) if isinstance(col, str) else col
    u = F.regexp_replace(u, _FRAGMENT, "")
    # lowercase scheme+host only: lower() the authority prefix, keep
    # the path/query tail verbatim
    prefix = F.lower(F.regexp_extract(u, _PREFIX, 0))
    tail = F.regexp_replace(u, _PREFIX, "")
    u = F.concat(prefix, tail)
    u = F.regexp_replace(u, _HTTP_80, "$1$2")
    u = F.regexp_replace(u, _HTTPS_443, "$1$2")
    # tracking params: wrap in '&' sentinels, double every separator
    # so each param owns BOTH its delimiters, remove tracked ones in
    # one global pass (the pattern consumes the param's own '&…&' —
    # explicit name boundary, runs don't share delimiters), collapse,
    # unwrap: '?a=1&utm_x=2&b=3' -> '?a=1&b=3'
    base = F.regexp_extract(u, r"^[^?]*", 0)
    q = F.regexp_replace(u, r"^[^?]*\??", "")
    q = F.concat(F.lit("&"), q, F.lit("&"))
    q = F.regexp_replace(q, "&", "&&")
    q = F.regexp_replace(q, _TRACKED_PARAM, "")
    q = F.regexp_replace(q, "&&", "&")
    q = F.regexp_replace(q, r"^&+|&+$", "")
    u = F.when(q == "", base).otherwise(F.concat(base, F.lit("?"), q))
    u = F.regexp_replace(u, _TRAIL_SLASH, "$1$2")
    return u


def canonical_url_sql(expr: str) -> str:
    """DuckDB twin — same patterns, RE2 engine, ``\\1`` replacement
    syntax, 'g' for global."""
    u = f"regexp_replace({expr}, '{_FRAGMENT}', '', 'g')"
    prefix = f"lower(regexp_extract({u}, '{_PREFIX}'))"
    tail = f"regexp_replace({u}, '{_PREFIX}', '', 'g')"
    u = f"({prefix} || {tail})"
    u = f"regexp_replace({u}, '{_HTTP_80}', '\\1\\2', 'g')"
    u = f"regexp_replace({u}, '{_HTTPS_443}', '\\1\\2', 'g')"
    base = f"regexp_extract({u}, '^[^?]*')"
    q = f"regexp_replace({u}, '^[^?]*\\??', '', 'g')"
    q = f"('&' || {q} || '&')"
    q = f"regexp_replace({q}, '&', '&&', 'g')"
    q = f"regexp_replace({q}, '{_TRACKED_PARAM}', '', 'g')"
    q = f"regexp_replace({q}, '&&', '&', 'g')"
    q = f"regexp_replace({q}, '^&+|&+$', '', 'g')"
    u = f"(CASE WHEN {q} = '' THEN {base} ELSE {base} || '?' || {q} END)"
    return f"regexp_replace({u}, '{_TRAIL_SLASH}', '\\1\\2', 'g')"
