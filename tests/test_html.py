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


# ---------------------------------------------------------------- urls

from lab5_lakehouse_etl_spark.functions import urls as U  # noqa: E402

URL_CASES = [
    # the full messy form: case, default port, utm block, fragment,
    # trailing slash
    (
        "HTTP://Example.COM:80/A/b/?utm_source=x&utm_medium=y"
        "&utm_campaign=z&utm_term=t&utm_content=c&id=5#frag",
        "http://example.com/A/b?id=5",
    ),
    # root slash == empty path (RFC 3986 §6.2.3)
    ("https://Host.io:443/", "https://host.io"),
    ("http://h", "http://h"),
    ("http://h:80", "http://h"),
    # NON-default ports survive
    ("https://host.io:8443/x/", "https://host.io:8443/x"),
    ("http://h:8080/", "http://h:8080"),
    # tracked params anywhere, with or without '='
    ("http://h/p?fbclid=abc", "http://h/p"),
    ("http://h/p/?a=1&gclid=2&b=3", "http://h/p?a=1&b=3"),
    ("http://h/?utm_x", "http://h"),
    # path/query case preserved; ref_src tracked
    ("HTTPS://A.B/C?x=1&ref_src=tw", "https://a.b/C?x=1"),
    # no scheme: inapplicable steps pass through
    ("relative/path?utm_source=1&k=2", "relative/path?k=2"),
    # --- r15 adversarial arms (r14 advice: name-prefix collision) ---
    # a tracked NAME as a PREFIX of an unrelated key must survive:
    # the exact reported failure was '?a=1&fbclid_x=1&gclid2=5'
    # canonicalizing to '?a=1_x=12=5'
    ("http://h/p?a=1&fbclid_x=1&gclid2=5", "http://h/p?a=1&fbclid_x=1&gclid2=5"),
    ("http://h/p?fbclid_x=1", "http://h/p?fbclid_x=1"),
    ("http://h/p?msclkidz=1&ref_src2=t", "http://h/p?msclkidz=1&ref_src2=t"),
    # prefix-key adjacent to a genuinely tracked key
    ("http://h/p?fbclid=1&fbclid_x=2&gclid=3", "http://h/p?fbclid_x=2"),
    # valueless tracked keys in a run, first-position tracked key
    ("http://h/p?gclid&msclkid&a=1", "http://h/p?a=1"),
    # empty-parameter gap ('&&') in the original survives verbatim
    ("http://h/p?a=1&&b=2", "http://h/p?a=1&&b=2"),
    # utm_ prefix family: any suffix IS tracked (contrast fbclid_x)
    ("http://h/p?utm_abc_x=1&keep=2", "http://h/p?keep=2"),
]


@pytest.mark.parametrize("raw,want", URL_CASES)
def test_url_canonicalization_semantics(spark, raw, want):
    df = spark.createDataFrame([(raw,)], "u string")
    got = df.select(U.canonical_url("u").alias("c")).first().c
    assert got == want, raw
    con = duckdb.connect()
    lit = raw.replace("'", "''")
    duck = con.sql(
        f"SELECT {U.canonical_url_sql('u')} AS c FROM (SELECT '{lit}' AS u)"
    ).fetchone()[0]
    assert duck == want, raw


def test_url_canonicalization_null_passthrough(spark):
    df = spark.createDataFrame([(None,)], "u string")
    assert df.select(U.canonical_url("u").alias("c")).first().c is None
