"""§2.8 UDF-surface tests: the pandas UDAF demo must agree with its
JVM algebraic twin, and the UDTF must agree with the built-in explode
— pinning that the Python escape hatches are result-transparent."""

from __future__ import annotations

from pyspark.sql import functions as F

from lab5_lakehouse_etl_spark.queries import events_ops, text_ops
from lab5_lakehouse_etl_spark.session import load_table
from tests.conftest import SF_DIR


def test_udaf_geomean_equals_builtin(spark):
    udaf = {
        r["event_type"]: (r["n_events"], r["geomean_value"])
        for r in events_ops.q_udaf_geomean(spark, SF_DIR).collect()
    }
    builtin = {
        r["event_type"]: (r["n_events"], r["geomean_value"])
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.exp(F.avg(F.log("value"))), 4).alias("geomean_value"),
        )
        .collect()
    }
    assert udaf == builtin


def test_udtf_tokens_equals_builtin_explode(spark):
    udtf = sorted(
        (r["doc_id"], r["pos"], r["token"])
        for r in text_ops.q_udtf_tokens(spark, SF_DIR).collect()
    )
    builtin = sorted(
        (r["doc_id"], r["pos"], r["token"])
        for r in load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") < 20)
        .select(
            "doc_id",
            F.posexplode(
                F.split(F.trim(F.lower("text")), r"[ \t\n\r\f]+")
            ).alias("pos", "token"),
        )
        .collect()
    )
    assert udtf == builtin


def test_tokens_family_explicit_whitespace_class_matches_re2(spark):
    """r10 migration pin: the legacy tokens() family must tokenize a
    planted vertical-tab (\\x0B) corpus exactly like the DuckDB/RE2
    oracles' string_split_regex('\\s+') — i.e. \\x0B is NOT a
    separator.  Under the old Java \\s this corpus split differently
    on the two engines; the fixtures' [a-z0-9 ] alphabet could never
    expose it, so this planted corpus is the gate."""
    import duckdb

    from lab5_lakehouse_etl_spark.functions import text as T

    corpus = [
        (1, "alpha\x0bbeta gamma"),       # \x0B inside a token
        (2, " leading\tand\nnewline "),   # real separators still split
        (3, "a\x0b b\x0b\x0bc"),          # \x0B adjacent to spaces
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        r["doc_id"]: (list(r["toks"]), r["n"], r["fp"])
        for r in df.select(
            "doc_id",
            T.tokens(F.col("text")).alias("toks"),
            T.token_count(F.col("text")).alias("n"),
            T.rolling_fingerprint(F.col("text")).alias("fp"),
        ).collect()
    }
    con = duckdb.connect()
    for doc_id, text in corpus:
        toks, n, fp = con.execute(
            r"""SELECT string_split_regex(trim(lower($t)), '\s+'),
                       CAST(len(string_split_regex(trim(lower($t)), '\s+'))
                            AS BIGINT),
                       md5(list_aggregate(
                           string_split_regex(trim(lower($t)), '\s+'),
                           'string_agg', ' '))""",
            {"t": text},
        ).fetchone()
        assert got[doc_id] == (toks, n, fp), doc_id
    # the \x0B stays INSIDE its token on both sides
    assert got[1][0] == ["alpha\x0bbeta", "gamma"]


def test_udtf_tokens_trim_parity_on_edge_whitespace(spark):
    """r10 review finding: the UDTF's Python strip must mirror
    trim()/F.trim (SPACES only) — a leading tab yields a leading empty
    token on the oracle and JVM sides, and a pure-space document yields
    the single empty-token row split('') produces.  The [a-z0-9 ]
    fixtures can never expose this; this planted corpus pins the UDTF
    against the JVM twin on exactly the divergence shapes."""
    import duckdb

    corpus = [
        (0, "\tfoo bar"),    # leading tab -> leading empty token
        (1, "foo bar\n"),    # trailing newline -> trailing empty token
        (2, "   "),          # pure spaces -> one empty token at pos 0
        (3, " foo  bar "),   # edge spaces trimmed; double space = one sep
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    df.createOrReplaceTempView("_udtf_edge_docs")
    from pyspark.sql.functions import udtf  # noqa: F401 (registration)

    # reuse the declared query's UDTF registration by running it once
    from lab5_lakehouse_etl_spark.queries import text_ops
    from tests.conftest import SF_DIR

    text_ops.q_udtf_tokens(spark, SF_DIR).limit(1).collect()
    got = sorted(
        (r.doc_id, r.pos, r.token)
        for r in spark.sql(
            """SELECT d.doc_id, t.pos, t.token
               FROM _udtf_edge_docs d, LATERAL token_explode(d.text) t"""
        ).collect()
    )
    jvm = sorted(
        (r.doc_id, r.pos, r.token)
        for r in df.select(
            "doc_id",
            F.posexplode(
                F.split(F.trim(F.lower("text")), r"[ \t\n\r\f]+")
            ).alias("pos", "token"),
        ).collect()
    )
    assert got == jvm
    # and both agree with the oracle engine's split semantics
    con = duckdb.connect()
    duck = sorted(
        (doc_id, i, tok)
        for doc_id, text in corpus
        for i, tok in enumerate(
            con.execute(
                r"SELECT string_split_regex(trim(lower($t)), '\s+')",
                {"t": text},
            ).fetchone()[0]
        )
    )
    assert got == duck
