"""HTML → text extraction — the first transform of every web-scraped
training corpus (strip markup/script/style, decode entities,
normalize whitespace), expressed as PURE JVM regex/replace column
expressions so the whole pass stays inside whole-stage codegen: no
UDF, no parser library, payload-scale throughput.

Why regex and not an HTML parser: a training pipeline's extraction
pass needs throughput and determinism over DOM fidelity — the
standard corpus pipelines do exactly this class of tag-strip +
entity-decode + whitespace-normalize (and route documents needing
real DOM semantics to a heavier offline path).  The patterns below
are deliberately RE2-compatible (no backreferences, no lookarounds):
Spark executes them under java.util.regex and the DuckDB oracle twin
under RE2, so the declared query (``q_text_html_extract``)
hash-verifies the SEMANTICS of every pattern across two independent
regex engines — a lazy-quantifier or flag-handling divergence breaks
the oracle.

Extraction choice: EVERY tag (block or inline) is replaced by a
space — the conservative corpus-pipeline behavior that never glues
two adjacent text runs into one token, at the cost of splitting
mid-word inline styling ("bo<b>ld" -> "bo ld"); the whitespace
collapse then erases the cosmetic difference for block markup.

Scope boundary (documented, not a refusal): the entity decode covers
the named core set (&amp; &lt; &gt; &quot; &apos; &nbsp;) — numeric
character references pass through verbatim (decoding &#NNNN; needs
computed chr(), which leaves JVM-expression land; the honest
behavior is to preserve them visibly rather than half-decode).
Comments and CDATA are removed with script/style blocks.

No counterpart in the reference repo (822-LoC Glue ETL lab).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: block elements whose CLOSE (or self) implies a word break — their
#: tags are replaced with a space before the generic tag strip so
#: "</p><p>" never glues two paragraphs into one token
_BLOCK_BREAK = (
    r"(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|blockquote|"
    r"section|article|header|footer)\b[^>]*>"
)

#: containers whose CONTENT is not text (lazy across newlines)
_SCRIPT = r"(?is)<script\b[^>]*>.*?</script>"
_STYLE = r"(?is)<style\b[^>]*>.*?</style>"
_COMMENT = r"(?s)<!--.*?-->"

_GENERIC_TAG = r"<[^>]+>"

#: named core entities (order matters: &amp; LAST so "&amp;lt;"
#: decodes to the literal "&lt;", not to "<" — the HTML5 double-escape
#: rule)
_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&amp;", "&"),
)


def html_to_text(col: str | Column) -> Column:
    """Extracted plain text of one HTML column: script/style/comment
    blocks removed, block-element tags become word breaks, remaining
    tags stripped, core named entities decoded (&amp; last — the
    double-escape rule), whitespace collapsed and trimmed.  Pure JVM
    expressions end to end."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, _SCRIPT, " ")
    c = F.regexp_replace(c, _STYLE, " ")
    c = F.regexp_replace(c, _COMMENT, " ")
    c = F.regexp_replace(c, _BLOCK_BREAK, " ")
    c = F.regexp_replace(c, _GENERIC_TAG, " ")
    for ent, rep in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def html_to_text_sql(expr: str) -> str:
    """The DuckDB twin of :func:`html_to_text` over a SQL expression
    string — SAME patterns, RE2 engine ('g' makes regexp_replace
    global, matching Spark's replace-all default).  Keeping both
    builders in one module is what lets the declared query pin the
    cross-engine regex semantics."""
    out = f"regexp_replace({expr}, '{_SCRIPT}', ' ', 'g')"
    out = f"regexp_replace({out}, '{_STYLE}', ' ', 'g')"
    out = f"regexp_replace({out}, '{_COMMENT}', ' ', 'g')"
    out = f"regexp_replace({out}, '{_BLOCK_BREAK}', ' ', 'g')"
    out = f"regexp_replace({out}, '{_GENERIC_TAG}', ' ', 'g')"
    for ent, rep in _ENTITIES:
        lit = rep.replace("'", "''")
        out = f"replace({out}, '{ent}', '{lit}')"
    out = f"regexp_replace({out}, '\\s+', ' ', 'g')"
    return f"trim({out})"
