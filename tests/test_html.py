"""HTML -> text extraction: the pattern table's semantics beyond what
the declared differential query exercises — double-escape ordering,
case-insensitive multi-line blocks, CDATA-ish comments, and the
documented numeric-reference pass-through."""

from __future__ import annotations

import duckdb
import pytest

from lab5_lakehouse_etl_spark.functions import html as H


def _spark_extract(spark, s: str) -> str:
    df = spark.createDataFrame([(s,)], "s string")
    return df.select(H.html_to_text("s").alias("t")).first().t


def _duck_extract(s: str) -> str:
    con = duckdb.connect()
    lit = s.replace("'", "''")
    return con.sql(
        f"SELECT {H.html_to_text_sql('s')} AS t FROM (SELECT '{lit}' AS s)"
    ).fetchone()[0]


CASES = [
    # double-escape rule: &amp;lt; is the LITERAL string "&lt;"
    ("<p>a &amp;lt; b &lt; c</p>", "a &lt; b < c"),
    # case-insensitive, attribute-bearing, multi-line script/style
    (
        "<SCRIPT type='x'>\nvar a = '<p>not text</p>';\n</SCRIPT>ok"
        "<Style>\nh1 { color: red }\n</Style>",
        "ok",
    ),
    # comments vanish (to one space), including markup inside them
    ("a<!-- <p>gone</p>\nstill gone -->b", "a b"),
    # EVERY tag becomes a word break — the conservative extraction
    # choice: never glues adjacent texts, at the cost of splitting
    # mid-word inline styling (documented in functions/html.py)
    ("<p>one</p><p>two</p>", "one two"),
    ("<b>bold</b>face", "bold face"),
    # numeric references pass through verbatim (documented boundary)
    ("x &#65; &#x41; y", "x &#65; &#x41; y"),
    # whitespace collapse + trim
    ("  <p>  a\n\n b\t</p>  ", "a b"),
    # entities inside attributes vanish with the tag
    ('<a href="?a=1&amp;b=2">link</a>', "link"),
    # nbsp becomes a plain space and collapses with neighbors
    ("a&nbsp;&nbsp;b", "a b"),
]


@pytest.mark.parametrize("raw,want", CASES)
def test_html_extraction_semantics(spark, raw, want):
    got = _spark_extract(spark, raw)
    assert got == want, raw
    # the DuckDB twin agrees on every case (the cross-engine pin the
    # declared query makes over the corpus fixture)
    assert _duck_extract(raw) == want, raw
