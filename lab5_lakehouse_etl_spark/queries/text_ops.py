"""Text-analysis declared queries over `documents` (SURVEY §2.10).

SQL-expressible stats carry DuckDB oracles (lambda list functions map
1:1: transform→list_transform, filter→list_filter, size→len). The
pandas-UDF language IDer is rows-only by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..session import load_table, spread
from . import query


@query(
    "q_text_tokens",
    oracle=r"""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)
               AS n_tokens,
           CAST(len(list_distinct(string_split_regex(trim(lower(text)), '\s+')))
               AS BIGINT) AS n_distinct_tokens,
           CAST(list_sum(list_transform(string_split_regex(trim(lower(text)), '\s+'),
                 t -> ceil(length(t) / 4.0))) AS BIGINT) AS n_subword_tokens
    FROM documents
    """,
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, and the
    BPE-ish subword count. Uses the fused token_stats struct so the
    text is split once per row, not once per statistic."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", T.token_stats("text").alias("ts")
    ).select(
        "doc_id", "ts.n_tokens", "ts.n_distinct_tokens", "ts.n_subword_tokens"
    )


@query(
    "q_quality_entropy",
    oracle=r"""
    WITH ch AS (
      SELECT doc_id, substring(text, CAST(i AS INT), 1) AS c
      FROM (SELECT doc_id, text,
                   unnest(range(1, CAST(length(text) AS BIGINT) + 1)) AS i
            FROM documents WHERE length(text) > 0)
    ),
    cnt AS (SELECT doc_id, c, count(*) AS k FROM ch GROUP BY 1, 2),
    tot AS (SELECT doc_id, sum(k) AS n FROM cnt GROUP BY 1)
    SELECT d.doc_id,
           round(e.ent, 6) AS char_entropy
    FROM documents d
    LEFT JOIN (SELECT cnt.doc_id,
                      -sum((k / CAST(n AS DOUBLE))
                           * log2(k / CAST(n AS DOUBLE))) AS ent
               FROM cnt JOIN tot USING (doc_id)
               GROUP BY cnt.doc_id) e USING (doc_id)
    """,
)
def q_quality_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-entropy quality signal: Shannon entropy (bits) of each
    document's character distribution — the exact form of the signal
    zlib-compression-ratio filters approximate (Gopher-family quality
    gates): machine-generated/repetitive boilerplate sits in the
    low-entropy tail, binary-ish noise in the high-entropy tail.
    NULL for empty documents.

    Scale shape: ZERO shuffles — one Arrow-batched pandas UDF
    (functions/text.char_entropy_udf) as a pure narrow map over the
    corpus scan: char-bound compute vectorized in C (Counter), linear
    in characters.  The all-JVM HOF formulation (char_entropy_sql)
    exists and is value-identical (parity-pinned) but runs interpreted
    and measured ×117 at the 10× stress — the UDF IS the scale path
    here, the documented exception to JVM-first.  The oracle
    recomputes relationally (char unnest → group counts → -Σ p·log2 p);
    cross-engine float agreement holds at round-6 because per-doc sums
    have ≤ alphabet terms and both engines fold doubles."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.round(T.char_entropy_udf(F.col("text")), 6).alias("char_entropy"),
    )


@query(
    "q_text_quality",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, text,
             string_split_regex(trim(lower(text)), '\s+') AS toks,
             greatest(length(text), 1) AS chlen
      FROM documents
    )
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_measured,
           round(length(regexp_replace(text, '[^.,!?;:''"]', '', 'g')) / chlen, 6)
               AS punct_ratio,
           CAST(len(list_filter(toks,
                x -> list_contains(['the','a','of','and'], x))) AS BIGINT)
               AS n_stopwords,
           round(list_sum(list_transform(toks, x -> CAST(length(x) AS DOUBLE)))
                 / greatest(len(toks), 1), 6) AS avg_token_len
    FROM t
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring signals: char length, punctuation ratio,
    stopword count, average token length — the cheap corpus filters.
    Token-based stats ride one fused let-bound split (token re-use,
    see functions/text.quality_token_stats)."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.length(t).cast("bigint").alias("n_chars_measured"),
        T.punct_ratio(t).alias("punct_ratio"),
        T.quality_token_stats("text").alias("qs"),
    ).select(
        "doc_id",
        "n_chars_measured",
        "punct_ratio",
        "qs.n_stopwords",
        "qs.avg_token_len",
    )


@query(
    "q_text_langid",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, lang,
             string_split_regex(trim(lower(text)), '\s+') AS toks
      FROM documents
    )
    SELECT doc_id, lang,
           CASE
             WHEN len(list_filter(toks, x -> list_contains(['the','and','of'], x))) >= 2 THEN 'en'
             WHEN len(list_filter(toks, x -> list_contains(['der','und','das'], x))) >= 2 THEN 'de'
             WHEN len(list_filter(toks, x -> list_contains(['le','et','les'], x))) >= 2 THEN 'fr'
             WHEN len(list_filter(toks, x -> list_contains(['el','y','los'], x))) >= 2 THEN 'es'
             ELSE 'en'
           END AS lang_guess
    FROM t
    """,
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language heuristic (JVM CASE chain), emitted next to
    the ground-truth `lang` column."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", T.lang_guess(F.col("text")).alias("lang_guess"))


@query(
    "q_fingerprint",
    oracle=r"""
    WITH fp AS (
      SELECT doc_id,
             md5(list_aggregate(string_split_regex(trim(lower(text)), '\s+'),
                                'string_agg', ' ')) AS fingerprint
      FROM documents
    )
    SELECT doc_id, fingerprint,
           CAST(count(*) OVER (PARTITION BY fingerprint) AS BIGINT) AS n_same
    FROM fp
    """,
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over the normalized token stream,
    plus per-fingerprint duplicate counts (exact-dup detection key)."""
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id", T.rolling_fingerprint(F.col("text")).alias("fingerprint")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("fingerprint")
    return fp.select(
        "doc_id", "fingerprint", F.count(F.lit(1)).over(w).cast("bigint").alias("n_same")
    )


@query(
    "q_text_tfidf",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    n AS (SELECT count(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * (ln((1.0 + n.n) / (1.0 + dfreq.df)) + 1.0), 6) AS tfidf
      FROM tf CROSS JOIN n JOIN dfreq ON tf.term = dfreq.term
    )
    SELECT doc_id, term, tfidf FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term ASC) AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
)
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document, smooth-idf variant
    (ln((1+N)/(1+df))+1), built from explode → two aggregations → a
    broadcast term-frequency join → per-doc top-k window. The document-
    frequency side is |vocabulary|-sized, so it broadcasts at any corpus
    scale; ordering uses the ROUNDED score so cross-engine libm noise
    can't reorder the top-k."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(T.tokens(F.col("text"))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.count()
    scored = tf.join(F.broadcast(dfreq), on="term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * (F.log((1.0 + n) / (1.0 + F.col("df"))) + 1.0), 6
        ).alias("tfidf"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf")
    )


@query(
    "q_langid_ngram",
    oracle=r"""
    WITH g AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(length(lower(text)) - 2, 0) + 1),
               i -> substring(lower(text), CAST(i AS INT), 3)
             )) AS grams
      FROM documents
    ),
    s AS (
      SELECT doc_id,
             len(list_filter(grams, x -> list_contains(['der','ein','sch','und','ich'], x))) AS s_de,
             len(list_filter(grams, x -> list_contains(['the',' th','he ','ing','and'], x))) AS s_en,
             len(list_filter(grams, x -> list_contains(['los','de ','que','ión','ent'], x))) AS s_es,
             len(list_filter(grams, x -> list_contains(['les','de ','ent','une','est'], x))) AS s_fr
      FROM g
    )
    SELECT doc_id,
           CASE WHEN greatest(s_de, s_en, s_es, s_fr) IS NULL
                  OR greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'en'
                WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                ELSE 'fr' END AS lang_pred
    FROM s
    """,
)
def q_langid_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched pandas-UDF trigram language IDer.  The UDF is the
    point (the vectorized Python escape hatch every real langid model
    rides), but the heuristic itself is closed-form — per-language
    trigram-profile hit counts, argmax with first-in-(de,en,es,fr)
    tie-break and an 'en' zero-signal default — so the oracle replays
    it in pure SQL and the Arrow batch path is HASH-CHECKED end to end
    instead of merely smoke-run."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.lang_id_ngram(F.col("text")).alias("lang_pred"))


@query(
    "q_text_chunk",
    oracle="""
    SELECT doc_id,
           CAST(i - 1 AS BIGINT)                 AS chunk_id,
           CAST((i - 1) * 150 + 1 AS BIGINT)     AS chunk_start,
           substring(text, CAST((i - 1) * 150 + 1 AS INT), 200) AS chunk_text
    FROM (SELECT doc_id, text,
                 unnest(range(1,
                   CAST(ceil(greatest(length(text) - 50, 1) / 150.0) AS BIGINT) + 1
                 )) AS i
          FROM documents)
    """,
)
def q_text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking (the RAG/pretraining ingest path): fixed
    200-char windows with stride 150 (50-char overlap), each chunk
    carrying its doc id, ordinal, and 1-based start offset. Expressed
    as sequence → transform → explode entirely JVM-side; at corpus
    scale this is a narrow map with no shuffle at all, and chunk rows
    inherit the parent scan's partitioning. The chunk count per doc is
    ceil(max(len-overlap,1)/stride) — every character is covered and
    the final partial window is kept (what an embedding-ingest job
    wants; truncation would silently drop document tails)."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = F.expr(
        """transform(
             sequence(1, CAST(ceil(greatest(length(text) - 50, 1) / 150.0) AS INT)),
             i -> struct(
               CAST(i - 1 AS BIGINT)             AS chunk_id,
               CAST((i - 1) * 150 + 1 AS BIGINT) AS chunk_start,
               substring(text, (i - 1) * 150 + 1, 200) AS chunk_text))"""
    )
    return docs.select("doc_id", F.explode(chunks).alias("c")).select(
        "doc_id", "c.chunk_id", "c.chunk_start", "c.chunk_text"
    )


@query(
    "q_text_pii_mask",
    oracle="""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(text, '[0-9]+(\\.[0-9]+)?', '<NUM>', 'g'),
             '[A-Za-z0-9._]+@[A-Za-z0-9.]+', '<EMAIL>', 'g') AS masked,
           CAST(length(text)
                - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT)
               AS n_digits_masked
    FROM documents
    """,
)
def q_text_pii_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass: numbers → <NUM>, email-shaped tokens →
    <EMAIL>, plus a masked-digit audit count (training pipelines log
    how much was redacted). Pure JVM regexp_replace — a narrow map,
    no shuffle; the patterns use the regex subset where Java and RE2
    semantics coincide (no lookaround, no backrefs) so the DuckDB twin
    is the same expression."""
    docs = load_table(spark, sf_dir, "documents")
    masked = F.regexp_replace(
        F.regexp_replace(F.col("text"), r"[0-9]+(\.[0-9]+)?", "<NUM>"),
        r"[A-Za-z0-9._]+@[A-Za-z0-9.]+",
        "<EMAIL>",
    )
    n_digits = (
        F.length("text") - F.length(F.regexp_replace(F.col("text"), "[0-9]", ""))
    ).cast("bigint")
    return docs.select(
        "doc_id",
        masked.alias("masked"),
        n_digits.alias("n_digits_masked"),
    )


#: BM25 demo query: fixed term set + standard (k1=1.2, b=0.75) constants.
_BM25_TERMS = ("scan", "merge", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75


@query(
    "q_keyword_search",
    oracle=rf"""
    WITH d AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)
                 AS dl,
             string_split_regex(trim(lower(text)), '\s+') AS toks
      FROM documents
    ),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM d),
    tf AS (
      SELECT doc_id, dl, term, count(*) AS tf
      FROM (SELECT doc_id, dl, unnest(toks) AS term FROM d)
      WHERE term IN ('scan', 'merge', 'window')
      GROUP BY 1, 2, 3
    ),
    dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1)
    SELECT tf.doc_id,
           round(sum(
             ln((stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
             * tf.tf * {_BM25_K1 + 1.0}
             / (tf.tf + {_BM25_K1} * ({1.0 - _BM25_B} + {_BM25_B} * tf.dl / stats.avgdl))
           ), 4) AS bm25
    FROM tf CROSS JOIN stats JOIN dfreq ON tf.term = dfreq.term
    GROUP BY tf.doc_id
    ORDER BY bm25 DESC, doc_id ASC
    LIMIT 20
    """,
)
def q_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword search — the lexical complement of
    `q_semantic_search` (the two sides of hybrid retrieval). Scores
    every document against a fixed 3-term query with standard
    Okapi BM25 (k1=1.2, b=0.75, idf = ln((N-df+.5)/(df+.5)+1)) and
    returns the top 20.

    Scale shape: NOTHING fact-sized ever explodes or shuffles. Per-term
    frequencies are row-local HOF counts (`size(filter(toks, t = q))`),
    so pass 1 is a single partial-combining aggregate producing the
    one-row stats relation (N, avgdl, per-term df); pass 2 re-scans the
    corpus, crossJoin-broadcasts that row, and scores each document in
    place — the only exchanges are the one-row stats agg and the final
    TakeOrderedAndProject on the ROUNDED score (cross-engine libm noise
    can't reorder the cut). Earlier explode-based draft measured 8.4 s
    at sf0.1; this form ~2 s — the delta is exploding 15M token rows
    vs never materializing them."""
    return _bm25_top20(spark, sf_dir)


def _bm25_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared BM25 top-20 scorer (also the lexical leg of
    `q_hybrid_search` — see queries/similarity_ops.py)."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    tf_cols = {
        t: F.size(F.expr(f"filter(toks, x -> x = '{t}')")) for t in _BM25_TERMS
    }
    d = docs.select(
        "doc_id",
        T.token_count(F.col("text")).alias("dl"),
        T.tokens(F.col("text")).alias("toks"),
    ).select(
        "doc_id",
        "dl",
        *[cnt.alias(f"tf_{t}").cast("double") for t, cnt in tf_cols.items()],
    )
    # NOT cached, by measured A/B (r16): d feeds both the corpus-stats
    # aggregate (broadcast side) and the scored output side, so the
    # tokenize pass is instantiated twice — but the two subtrees run
    # CONCURRENTLY inside the one action (broadcast build ∥ probe
    # scan), so the duplication costs idle cores, not wall.  A
    # d.cache() barrier serializes them (materialize, then read) and
    # measured slower on both consumers (q_keyword_search 0.94 →
    # 1.03 s, q_hybrid_search 1.75 → 2.33 s, min-of-2 warm profile,
    # sf0.1) — same finding as the prefix-join's measured-alternatives
    # note.  On a memory-bound cluster revisit: the cached relation is
    # only (id + 4 numeric cols) per doc.
    stats = d.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("bigint"))
            .cast("double")
            .alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )
    def contrib(t: str) -> F.Column:
        idf = F.log(
            (F.col("n") - F.col(f"df_{t}") + 0.5) / (F.col(f"df_{t}") + 0.5)
            + 1.0
        )
        tf = F.col(f"tf_{t}")
        return idf * tf * (_BM25_K1 + 1.0) / (
            tf
            + _BM25_K1 * ((1.0 - _BM25_B) + _BM25_B * F.col("dl") / F.col("avgdl"))
        )
    score = contrib(_BM25_TERMS[0])
    hits = F.col(f"tf_{_BM25_TERMS[0]}")
    for t in _BM25_TERMS[1:]:
        score = score + contrib(t)
        hits = hits + F.col(f"tf_{t}")
    return (
        d.crossJoin(F.broadcast(stats))
        .filter(hits > 0)
        .select("doc_id", F.round(score, 4).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(20)
    )


@query(
    "q_quality_gopher",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             string_split_regex(trim(lower(text)), '\s+') AS toks
      FROM documents
    ), b AS (
      SELECT doc_id,
             CASE WHEN len(toks) < 2 THEN CAST([] AS VARCHAR[])
                  ELSE list_transform(range(1, len(toks)),
                         i -> concat(toks[i], ' ', toks[i+1])) END AS g2,
             CASE WHEN len(toks) < 3 THEN CAST([] AS VARCHAR[])
                  ELSE list_transform(range(1, len(toks) - 1),
                         i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])) END AS g3,
             list_sum(list_transform(toks, x -> length(x))) AS total_chars,
             len(toks) AS n_toks,
             len(list_distinct(toks)) AS n_distinct
      FROM t
    ), m AS (
      SELECT doc_id,
             round(1.0 - n_distinct / greatest(n_toks, 1), 6) AS dup_word_frac,
             round(coalesce(list_max(list_transform(list_distinct(g2),
                       g -> len(list_filter(g2, x -> x = g)) * (length(g) - 1))), 0)
                   / greatest(total_chars, 1), 6) AS top_2gram_char_frac,
             round(coalesce(list_sum(list_transform(list_distinct(g3),
                       g -> CASE WHEN len(list_filter(g3, x -> x = g)) > 1
                            THEN len(list_filter(g3, x -> x = g)) * (length(g) - 2)
                            ELSE 0 END)), 0)
                   / greatest(total_chars, 1), 6) AS dup_3gram_char_frac
      FROM b
    )
    SELECT doc_id, dup_word_frac, top_2gram_char_frac, dup_3gram_char_frac,
           (dup_word_frac <= 0.70 AND top_2gram_char_frac <= 0.20
            AND dup_3gram_char_frac <= 0.18) AS keep
    FROM m
    """,
)
def q_quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition filters (arXiv:2112.11446 §A1.1): duplicate-
    word fraction, top-2-gram character fraction, duplicate-3-gram
    character fraction, and the keep/drop verdict at the paper's
    thresholds (0.20 top-2-gram, 0.18 dup-3-gram; 0.70 dup-word).

    The standard cheap repetition gate in LLM pretraining curation —
    one narrow map over documents (see functions/text.py
    gopher_repetition_stats), no shuffle, scan-speed at 100 TB (the
    session.spread call below is the conditional fixture-parallelism
    knob — a no-op on any corpus whose scan is already split).
    """
    # compute-bound narrow map: spread the (possibly one-partition)
    # fixture scan across cores — conditional no-op on a split corpus
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    return docs.select(
        "doc_id", T.gopher_repetition_stats("text").alias("s")
    ).select(
        "doc_id",
        "s.dup_word_frac",
        "s.top_2gram_char_frac",
        "s.dup_3gram_char_frac",
        (
            (F.col("s.dup_word_frac") <= 0.70)
            & (F.col("s.top_2gram_char_frac") <= 0.20)
            & (F.col("s.dup_3gram_char_frac") <= 0.18)
        ).alias("keep"),
    )


@query(
    "q_lm_unigram",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      FROM documents
    ),
    vocab AS (SELECT term, count(*) AS cnt FROM toks GROUP BY 1),
    total AS (SELECT sum(cnt) AS n FROM vocab),
    scored AS (
      SELECT t.doc_id, ln(CAST(total.n AS DOUBLE) / v.cnt) AS nll
      FROM toks t JOIN vocab v ON t.term = v.term CROSS JOIN total
    )
    SELECT doc_id,
           round(avg(nll), 4) AS cross_entropy,
           round(exp(avg(nll)), 2) AS perplexity,
           CAST(count(*) AS BIGINT) AS n_tokens
    FROM scored GROUP BY doc_id
    """,
)
def q_lm_unigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring — the perplexity-proxy quality
    filter (the cheap stand-in for the KenLM/CCNet LM filter used in
    pretraining curation): train a unigram LM on the corpus itself
    (P(t) = count(t)/N), then score each document by mean negative
    log-likelihood (cross-entropy) and its exp (perplexity). Documents
    full of rare tokens score high; boilerplate scores low.

    Scale shape: the vocabulary is built with one partial-combining
    aggregate over the exploded token stream (|V|-sized result — tiny
    vs the corpus), then BROADCAST back onto the stream, and the
    per-doc mean folds in the same shuffle-free pass as a map-side
    combine keyed by doc_id: raw corpus tokens are never shuffled, only
    (doc_id, partial-sum) pairs. Scores round before returning so
    cross-engine libm summation order cannot perturb the hash.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("term"))
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    # total token count via a narrow per-row size() aggregate — NOT
    # vocab.agg(sum(cnt)), which would duplicate the whole explode +
    # vocab-aggregate subtree in the physical plan (no plan reuse
    # without caching); same number, one cheap pass
    total = docs.agg(
        F.sum(F.size(T.tokens(F.col("text")))).cast("double").alias("n")
    )
    scored = (
        toks.join(F.broadcast(vocab), "term")
        .crossJoin(F.broadcast(total))
        .select("doc_id", F.log(F.col("n") / F.col("cnt")).alias("nll"))
    )
    return scored.groupBy("doc_id").agg(
        F.round(F.avg("nll"), 4).alias("cross_entropy"),
        F.round(F.exp(F.avg("nll")), 2).alias("perplexity"),
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
    )


@query(
    "q_ppl_buckets",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      FROM documents
    ),
    vocab AS (SELECT term, count(*) AS cnt FROM toks GROUP BY 1),
    total AS (SELECT sum(cnt) AS n FROM vocab),
    scored AS (
      SELECT t.doc_id, ln(CAST(total.n AS DOUBLE) / v.cnt) AS nll
      FROM toks t JOIN vocab v ON t.term = v.term CROSS JOIN total
    ),
    ce AS (
      SELECT doc_id, round(avg(nll), 4) AS cross_entropy
      FROM scored GROUP BY doc_id
    ),
    tiled AS (
      SELECT d.doc_id, d.lang, ce.cross_entropy,
             ntile(3) OVER (PARTITION BY d.lang
                            ORDER BY ce.cross_entropy ASC, d.doc_id ASC)
               AS tile
      FROM documents d JOIN ce USING (doc_id)
    )
    SELECT doc_id, lang, cross_entropy,
           CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                     ELSE 'tail' END AS bucket,
           (tile < 3) AS keep
    FROM tiled
    """,
)
def q_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    every document with the corpus unigram LM (q_lm_unigram's
    cross-entropy), then split EACH LANGUAGE into head / middle / tail
    thirds by score — the head (lowest perplexity) is the
    highest-quality slice, the tail is the usual drop set (``keep`` =
    not tail).  Per-language tiling is the CCNet detail that matters:
    a global cut would starve low-resource languages whose perplexity
    distribution sits above the majority language's.

    Scale shape: the LM scoring inherits q_lm_unigram's layout
    (broadcast vocabulary, map-side per-doc fold — corpus tokens never
    shuffle), and the tiling sorts only the (doc_id, lang, score)
    SCALAR relation within each language partition — bytes per row,
    not documents.  At 100 TB the exact ntile would be replaced by
    per-language GK-sketch cutoffs (the q_sketch_quantile machinery:
    estimate p33/p66 once, then bucket with a broadcast map — no
    per-lang sort); the exact tile is declared here because the oracle
    can state it.  Ordering ties (same rounded score) break by doc_id
    in both engines."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    ce = q_lm_unigram(spark, sf_dir).select("doc_id", "cross_entropy")
    tile = F.ntile(3).over(
        Window.partitionBy("lang").orderBy(
            F.col("cross_entropy").asc(), F.col("doc_id").asc()
        )
    )
    return (
        docs.select("doc_id", "lang")
        .join(ce, "doc_id")
        .withColumn("tile", tile)
        .select(
            "doc_id",
            "lang",
            "cross_entropy",
            F.when(F.col("tile") == 1, "head")
            .when(F.col("tile") == 2, "middle")
            .otherwise("tail")
            .alias("bucket"),
            (F.col("tile") < 3).alias("keep"),
        )
    )


@query(
    "q_ppl_buckets_gk",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      FROM documents
    ),
    vocab AS (SELECT term, count(*) AS cnt FROM toks GROUP BY 1),
    total AS (SELECT sum(cnt) AS n FROM vocab),
    scored AS (
      SELECT t.doc_id, ln(CAST(total.n AS DOUBLE) / v.cnt) AS nll
      FROM toks t JOIN vocab v ON t.term = v.term CROSS JOIN total
    ),
    ce AS (SELECT doc_id FROM scored GROUP BY doc_id)
    SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
           TRUE AS cut33_lo_ok, TRUE AS cut33_hi_ok,
           TRUE AS cut66_lo_ok, TRUE AS cut66_hi_ok
    FROM documents d JOIN ce ON ce.doc_id = d.doc_id
    GROUP BY d.lang
    """,
)
def q_ppl_buckets_gk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of q_ppl_buckets — per-language head/middle/tail
    cutoffs from the MERGEABLE Greenwald-Khanna sketch instead of an
    exact per-language ntile sort, exactly the swap that query's
    docstring promises: one corpus scoring pass (q_lm_unigram's
    broadcast-vocabulary layout), a per-language GK aggregate whose
    state is bounded regardless of language size, the <=2 cutoff
    values broadcast back, and bucketing as a row-local comparison —
    the corpus never sorts and never shuffles beyond the tiny
    (lang, sketch-state) aggregate.

    Sketch cutoffs are algorithm-defined, so the declared output is
    the invariant pattern (q_sketch_quantile's rank-space form, made
    ONE-SIDED so heavy score ties cannot break it — a tie mass sitting
    exactly on a cutoff inflates #(<= cut) without bound, but the GK
    guarantee constrains #(< cut) and #(<= cut) separately):

    - ``cut33_lo_ok``: #(ce <= cut33) >= (1/3 - eps)*n - 1 — the head
      bucket is never starved below its share;
    - ``cut33_hi_ok``: #(ce < cut33) <= (1/3 + eps)*n + 1 — strictly
      below the cutoff never exceeds the share (the +-1 absorbs the
      discrete order statistic, eps = 0.005 at accuracy 10000);
    - the same pair at 2/3 (``cut66_*``), which bounds the tail bucket
      from both sides since n_tail = n - #(ce <= cut66).

    All four are integer-rank arithmetic over exact counts —
    deterministic TRUE by the GK guarantee under ANY partition merge
    order, which is what makes a sketch-cut bucket assignment safely
    declarable at all.  Exact per-language doc counts restate the join
    cardinality."""
    eps, acc = 0.005, 10000
    docs = load_table(spark, sf_dir, "documents")
    ce = q_lm_unigram(spark, sf_dir).select("doc_id", "cross_entropy")
    scored = docs.select("doc_id", "lang").join(ce, "doc_id")
    cuts = scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            f"approx_percentile(cross_entropy,"
            f" array({1 / 3}, {2 / 3}), {acc})"
        ).alias("ap"),
    )
    ranked = scored.join(F.broadcast(cuts), "lang")
    counts = ranked.groupBy("lang", "n").agg(
        F.sum((F.col("cross_entropy") <= F.col("ap")[0]).cast("long")).alias(
            "le33"
        ),
        F.sum((F.col("cross_entropy") < F.col("ap")[0]).cast("long")).alias(
            "lt33"
        ),
        F.sum((F.col("cross_entropy") <= F.col("ap")[1]).cast("long")).alias(
            "le66"
        ),
        F.sum((F.col("cross_entropy") < F.col("ap")[1]).cast("long")).alias(
            "lt66"
        ),
    )
    nd = F.col("n").cast("double")
    return counts.select(
        "lang",
        F.col("n").cast("bigint").alias("n_docs"),
        (F.col("le33").cast("double") >= (1 / 3 - eps) * nd - 1).alias(
            "cut33_lo_ok"
        ),
        (F.col("lt33").cast("double") <= (1 / 3 + eps) * nd + 1).alias(
            "cut33_hi_ok"
        ),
        (F.col("le66").cast("double") >= (2 / 3 - eps) * nd - 1).alias(
            "cut66_lo_ok"
        ),
        (F.col("lt66").cast("double") <= (2 / 3 + eps) * nd + 1).alias(
            "cut66_hi_ok"
        ),
    )


@query(
    "q_udtf_tokens",
    oracle=r"""
    SELECT doc_id,
           CAST(i - 1 AS INT) AS pos,
           toks[CAST(i AS INT)] AS token
    FROM (
      SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i
      FROM (SELECT doc_id,
                   string_split_regex(trim(lower(text)), '\s+') AS toks
            FROM documents WHERE doc_id < 20)
    )
    """,
)
def q_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table function — the §2.8 UDTF surface):
    positional tokenizer applied with LATERAL over a 20-document slice.

    Row-at-a-time Python is deliberately confined to this API demo; the
    engine's hot token paths are JVM higher-order functions
    (functions/text.py) — same reason the reference-scale queries never
    register plain Python UDFs. The LATERAL join shape is the part that
    scales: the UDTF runs partition-local with no shuffle.
    """
    import re

    from pyspark.sql.functions import udtf

    # explicit whitespace class (== RE2's \s, the oracle's splitter),
    # single-sourced from functions/text.WS_CLASS: Python's argless
    # str.split() adds \x0B and unicode spaces, the same cross-engine
    # divergence family retired from the JVM paths.  The strip is
    # SPACES ONLY to mirror trim()/F.trim on both oracle and JVM-twin
    # sides (a leading tab yields a leading empty token in all three),
    # and a pure-space document yields the single empty-token row
    # split('') produces in both engines.
    ws = re.compile(T.WS_CLASS)

    @udtf(returnType="pos int, token string")
    class TokenExplode:
        def eval(self, text: str):
            stripped = text.strip(" ").lower()
            for i, t in enumerate(ws.split(stripped) if stripped else [""]):
                yield i, t

    spark.udtf.register("token_explode", TokenExplode)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """SELECT d.doc_id, t.pos, t.token
           FROM _udtf_docs d, LATERAL token_explode(d.text) t"""
    )


@query(
    "q_text_normalize",
    oracle=r"""
    WITH n AS (
      SELECT doc_id,
             md5(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9 \t\n\r\f]', '', 'g'),
                 '[ \t\n\r\f]+', ' ', 'g'))) AS norm_fp
      FROM documents
    )
    SELECT doc_id, norm_fp,
           (doc_id = min(doc_id) OVER (PARTITION BY norm_fp)) AS keep,
           CAST(count(*) OVER (PARTITION BY norm_fp) AS BIGINT) AS n_norm_copies
    FROM n
    """,
)
def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-keyed ("fuzzy-exact") dedup: canonicalize text —
    lowercase, strip punctuation, collapse whitespace — fingerprint the
    canonical form, and mark the lowest-id doc per fingerprint as the
    keeper.  The standard first dedup pass in pretraining curation
    (Dolma/CCNet shape): it merges casing/punctuation variants that
    raw-byte exact dedup (q_dedup_exact_docs) treats as distinct and
    near-dup signatures (q_dedup_minhash) shouldn't have to pay for.

    Whole plan is JVM codegen: three regexp_replace/lower maps feed
    md5, then one hash-partitioned window over the fingerprint (the
    group cardinality is ~|corpus|, so the shuffle is narrow key+id
    traffic, never text).  At 100 TB the text column is pruned before
    the exchange: only (doc_id, norm_fp) shuffles.  The regex maps are
    CPU-dense and run at SCAN parallelism, so the conditional spread
    applies (no-op on a split corpus; measured on the 10x single-file
    stress corpus: 8.1 s single-threaded -> ~1 s spread).

    Whitespace is the EXPLICIT class [ \\t\\n\\r\\f] in both engines,
    never the shorthand \\s: Java's \\s includes vertical tab (\\x0B)
    while RE2's does not, so a corpus containing one would normalize
    differently on the two sides — the fixtures are pure [a-z0-9 ]
    (so the hash gate cannot see the difference), which is exactly why
    the class is pinned explicitly and the punctuation/casing path is
    covered by a planted-corpus test instead."""
    from pyspark.sql import Window

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.lower(F.col("text")), r"[^a-z0-9 \t\n\r\f]", ""
            ),
            r"[ \t\n\r\f]+",
            " ",
        )
    )
    fp = docs.select("doc_id", F.md5(norm).alias("norm_fp"))
    w = Window.partitionBy("norm_fp")
    return fp.select(
        "doc_id",
        "norm_fp",
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("keep"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_norm_copies"),
    )


#: BPE training rounds for q_bpe_merges — fixed so the DuckDB oracle
#: can unroll one CTE stage per round (recursive CTEs cannot aggregate
#: in the recursive term; same constraint as _pagerank_oracle).
_BPE_ROUNDS = 6


def _bpe_oracle(k: int = _BPE_ROUNDS) -> str:
    """Unrolled BPE merge-pair training as plain DuckDB CTE stages,
    mechanically generated (the q_pagerank/q_kmeans_embed pattern).

    Word symbols are kept in a delimiter-wrapped string form —
    ``"ab"`` → ``"|a||b|"`` — so applying a merge is a plain left-to-
    right non-overlapping ``replace('|l||r|' -> '|lr|')`` in BOTH
    engines: every symbol carries its own enclosing delimiters, so
    adjacent matches never share characters and replace-all implements
    exactly BPE's greedy left-to-right merge (``a a a a`` merges to
    ``aa aa``, ``a a a`` to ``aa a``).  A bare space-separated form
    would break on adjacent repeats (matches would share the
    separating space)."""
    sql = r"""
    WITH v AS MATERIALIZED (
      SELECT regexp_replace(word, '(.)', '|\1|', 'g') AS sym,
             count(*) AS freq
      FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+'))
                   AS word
            FROM documents)
      WHERE word <> ''
      GROUP BY word
    ),
    w0 AS MATERIALIZED (SELECT sym, freq FROM v)"""
    for i in range(1, k + 1):
        sql += f""",
    p{i} AS MATERIALIZED (
      SELECT s[CAST(j AS INT)] AS l, s[CAST(j AS INT) + 1] AS r,
             sum(freq) AS c
      FROM (SELECT string_split(trim(sym, '|'), '||') AS s, freq,
                   unnest(range(1, len(string_split(trim(sym, '|'), '||'))))
                       AS j
            FROM w{i - 1})
      GROUP BY 1, 2
    ),
    b{i} AS MATERIALIZED (SELECT l, r, c FROM p{i} ORDER BY c DESC, l, r LIMIT 1),
    w{i} AS MATERIALIZED (
      SELECT CASE WHEN (SELECT l FROM b{i}) IS NULL THEN sym
                  ELSE replace(sym,
                               '|' || (SELECT l FROM b{i}) || '||'
                                   || (SELECT r FROM b{i}) || '|',
                               '|' || (SELECT l FROM b{i})
                                   || (SELECT r FROM b{i}) || '|')
             END AS sym,
             freq
      FROM w{i - 1}
    )"""
    sql += "\n    " + "\n    UNION ALL ".join(
        f"SELECT {i} AS merge_round, l AS left_sym, r AS right_sym, "
        f"CAST(c AS BIGINT) AS pair_count FROM b{i}"
        for i in range(1, k + 1)
    )
    return sql


@query("q_bpe_merges", oracle=_bpe_oracle())
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge-pair training over the corpus (Sennrich et al. 2016,
    arXiv:1508.07909) — the tokenizer-adjacent primitive an LLM-data
    pipeline runs to fit a subword vocabulary: K rounds of (count all
    adjacent symbol pairs weighted by word frequency → merge the most
    frequent pair everywhere), emitting the learned merge table
    (merge_round, left_sym, right_sym, pair_count).

    Deterministic tie-break: highest count, then lexicographically
    smallest (left, right) — identical in both engines, no floats.

    Scale shape (the part that matters at 100 TB): the corpus
    collapses to the (word, freq) VOCABULARY relation in the first
    aggregation — ONE corpus-sized shuffle — and every training round
    runs on that cached vocabulary only: one partial-agg (map-side
    combine) exchange on pair keys over ~|vocab| rows, an argmax via
    TakeOrdered (limit 1 — never a full sort), and a narrow
    replace() map.  The driver receives exactly one row per round
    (the Lloyd-trainer pattern of q_kmeans_embed: distributed
    counting, driver-side argmax coordination).  Lineage grows by one
    projection per round; at production K (~30k merges) checkpoint
    the vocabulary every ~50 rounds — at the declared K=6 lineage is
    trivially fine.

    Symbol strings use the delimiter-wrapped form (see _bpe_oracle:
    ``"ab"`` → ``"|a||b|"``) so the merge is a plain replace-all with
    exact BPE greedy left-to-right semantics in both engines.  The
    wrap uses '|', absent from whitespace-tokenized fixture words;
    a production tokenizer would wrap with a non-printing sentinel.
    No analogue in the reference (nearest: the string-normalization
    scalar layer, jobs/order_glue_job.py:84-110)."""
    docs = load_table(spark, sf_dir, "documents")
    merges, _merged, cached = _bpe_learn(docs, _BPE_ROUNDS)
    cached.unpersist()
    return spark.createDataFrame(
        merges,
        "merge_round int, left_sym string, right_sym string, "
        "pair_count bigint",
    )


def _bpe_learn(docs: DataFrame, k: int):
    """Shared BPE trainer (see q_bpe_merges for the full contract):
    returns (merge list [(round, left, right, count)], merged vocab DF
    (word, sym, freq) with all k merges applied, and the underlying
    CACHED base-vocabulary DF — the caller unpersists THAT handle when
    the merged relation is no longer needed; unpersisting the merged
    DF would be a no-op since the cache entry belongs to the base).
    The word column rides through so encoders (q_bpe_encode) can map
    words to their merged symbols."""
    vocab = (
        docs.select(F.explode(T.tokens(F.col("text"))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "word",
            F.regexp_replace("word", "(.)", r"|$1|").alias("sym"),
            "freq",
        )
        .cache()
    )
    merges: list[tuple[int, str, str, int]] = []
    cur = vocab
    for rnd in range(1, k + 1):
        pairs = (
            cur.select(
                F.expr(r"split(btrim(sym, '|'), '\\|\\|')").alias("s"),
                "freq",
            )
            .filter(F.size("s") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(s) - 1),"
                        " j -> struct(s[j-1] AS l, s[j] AS r))"
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("c"))
        )
        best = pairs.orderBy(F.desc("c"), "l", "r").limit(1).collect()
        if not best:
            break
        l, r, c = best[0]["l"], best[0]["r"], int(best[0]["c"])
        merges.append((rnd, l, r, c))
        cur = cur.withColumn(
            "sym",
            F.replace(
                F.col("sym"), F.lit(f"|{l}||{r}|"), F.lit(f"|{l}{r}|")
            ),
        )
    return merges, cur, vocab


def _bpe_encode_oracle(k: int = _BPE_ROUNDS) -> str:
    """Unrolled BPE train-then-ENCODE as DuckDB CTE stages: the same
    k merge stages as _bpe_oracle but carrying the word column, ending
    in a per-document encoded-token-count join."""
    sql = r"""
    WITH v AS MATERIALIZED (
      SELECT word, regexp_replace(word, '(.)', '|\1|', 'g') AS sym,
             count(*) AS freq
      FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+'))
                   AS word
            FROM documents)
      WHERE word <> ''
      GROUP BY word
    ),
    w0 AS MATERIALIZED (SELECT word, sym, freq FROM v)"""
    for i in range(1, k + 1):
        sql += f""",
    p{i} AS MATERIALIZED (
      SELECT s[CAST(j AS INT)] AS l, s[CAST(j AS INT) + 1] AS r,
             sum(freq) AS c
      FROM (SELECT string_split(trim(sym, '|'), '||') AS s, freq,
                   unnest(range(1, len(string_split(trim(sym, '|'), '||'))))
                       AS j
            FROM w{i - 1})
      GROUP BY 1, 2
    ),
    b{i} AS MATERIALIZED (SELECT l, r, c FROM p{i} ORDER BY c DESC, l, r LIMIT 1),
    w{i} AS MATERIALIZED (
      SELECT word,
             CASE WHEN (SELECT l FROM b{i}) IS NULL THEN sym
                  ELSE replace(sym,
                               '|' || (SELECT l FROM b{i}) || '||'
                                   || (SELECT r FROM b{i}) || '|',
                               '|' || (SELECT l FROM b{i})
                                   || (SELECT r FROM b{i}) || '|')
             END AS sym,
             freq
      FROM w{i - 1}
    )"""
    sql += f""",
    enc AS MATERIALIZED (
      SELECT word,
             len(string_split(trim(sym, '|'), '||')) AS n_pieces
      FROM w{k}
    ),
    tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+'))
                 AS word
      FROM documents
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT)       AS n_words,
           CAST(sum(e.n_pieces) AS BIGINT) AS n_bpe_tokens
    FROM (SELECT doc_id, word FROM tok WHERE word <> '') t
    JOIN enc e USING (word)
    GROUP BY t.doc_id"""
    return sql


@query("q_bpe_encode", oracle=_bpe_encode_oracle())
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE — the apply side of q_bpe_merges, completing the
    tokenizer story train→encode: fit the K-round merge table on the
    corpus, apply every merge to the vocabulary, and emit the per-
    document encoded length (doc_id, n_words, n_bpe_tokens) — the
    number the packing/budgeting operators (q_pack_sequences) would
    consume from a real subword tokenizer instead of the ceil(len/4)
    stand-in.

    Scale shape: training is q_bpe_merges' (see there — vocabulary-
    bounded rounds); ENCODING never touches documents a second time
    per word: the merged vocabulary (word → n_pieces) is a
    vocabulary-sized relation that BROADCASTS into the corpus's
    exploded token stream, then one doc_id-keyed partial-agg count —
    the same one-shuffle shape as any token-count aggregate.  At
    production vocabulary sizes (~10M words) the broadcast becomes a
    shuffled hash join on the word key; the plan is otherwise
    unchanged.  Word coverage is total by construction (the
    vocabulary is fit on the same corpus), so the join is inner with
    no OOV branch; a held-out-corpus encoder would add a left join
    with a per-character fallback count."""
    docs = load_table(spark, sf_dir, "documents")
    _merges, merged, cached = _bpe_learn(docs, _BPE_ROUNDS)
    # release the trainer's cache now: the returned plan recomputes the
    # vocabulary aggregate once at collect time, instead of pinning a
    # cache entry in storage memory for the process lifetime (the
    # driver runs 200+ queries in one session)
    cached.unpersist()
    enc = merged.select(
        "word",
        F.size(F.expr(r"split(btrim(sym, '|'), '\\|\\|')")).alias(
            "n_pieces"
        ),
    )
    toks = docs.select(
        "doc_id", F.explode(T.tokens(F.col("text"))).alias("word")
    ).filter(F.col("word") != "")
    out = (
        toks.join(F.broadcast(enc), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_pieces").cast("bigint").alias("n_bpe_tokens"),
        )
    )
    return out


def _html_oracle() -> str:
    """Built from the SAME pattern table as the Spark operator
    (functions/html.py keeps both builders side by side), so the
    oracle pins each regex's semantics across java.util.regex and
    RE2 — see q_text_html_extract."""
    from ..functions.html import html_to_text_sql

    wrapped = (
        "'<html><head><title>D' || CAST(doc_id AS VARCHAR) || "
        "'</title><style type=\"text/css\">p { margin: 0; }</style>"
        "<script>var x = 1 < 2; //</script></head><body><h1>Doc &amp; '"
        " || CAST(doc_id AS VARCHAR) || '</h1><p>' || text || "
        "'</p><p>tail&nbsp;&lt;ok&gt;</p><!-- note --></body></html>'"
    )
    clean = html_to_text_sql(wrapped)
    return f"""
    SELECT doc_id,
           {clean} AS clean_text,
           CAST(length({clean}) AS BIGINT) AS clean_chars
    FROM documents
    """


@query("q_text_html_extract", oracle=_html_oracle())
def q_text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → text extraction (functions/html.py) — the first
    transform of every web-scraped training corpus: script/style/
    comment blocks removed, block-element tags become word breaks,
    remaining tags stripped, core named entities decoded with the
    HTML5 double-escape rule (&amp; last), whitespace collapsed.
    Pure JVM regex/replace expressions — no UDF, no parser library —
    so the pass rides whole-stage codegen at payload scale.

    The fixture wraps each document's text in a deterministic HTML
    shell (title/style/script head, &amp;-bearing heading, two
    paragraphs, a comment; the script body contains a BARE '<' so a
    broken script pattern visibly corrupts output), and the oracle
    applies the SAME pattern table through DuckDB — Spark executes
    java.util.regex, the oracle RE2, so the value hash certifies
    every pattern's semantics (lazy quantifiers, inline (?is) flags,
    word boundaries) agree across two independent regex engines.
    Numeric character references deliberately pass through verbatim
    (decoding needs computed chr() — documented boundary, not a
    silent half-decode).

    Scale: a narrow projection over the documents scan; no shuffle,
    no Python."""
    from ..functions.html import html_to_text

    docs = load_table(spark, sf_dir, "documents")
    wrapped = F.concat(
        F.lit("<html><head><title>D"),
        F.col("doc_id").cast("string"),
        F.lit(
            '</title><style type="text/css">p { margin: 0; }</style>'
            "<script>var x = 1 < 2; //</script></head><body><h1>Doc &amp; "
        ),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit("</p><p>tail&nbsp;&lt;ok&gt;</p><!-- note --></body></html>"),
    )
    clean = html_to_text(wrapped)
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        F.length(clean).cast("bigint").alias("clean_chars"),
    )


@query(
    "q_url_canonicalize",
    oracle="""
    WITH c AS (
      SELECT doc_id, CAST(doc_id // 4 AS VARCHAR) AS g, doc_id % 4 AS arm
      FROM documents
    ),
    k AS (
      SELECT doc_id,
             CASE WHEN arm IN (0, 1)
                  THEN 'https://site' || g || '.example.com/page/' || g
                       || '?id=' || g
                  WHEN arm = 2
                  THEN 'http://m' || g || '.example.com/m/' || g
                       || '?fbclid_x=1'
                  ELSE 'https://p.example.com/d/'
                       || CAST(doc_id AS VARCHAR) END AS canon_url
      FROM c
    )
    SELECT doc_id, canon_url,
           CAST(count(*) OVER (PARTITION BY canon_url) AS BIGINT)
               AS n_same_key
    FROM k
    """,
)
def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + URL-level dedup (functions/urls.py) —
    the identity pass of every web corpus: strip fragments, lowercase
    scheme/host (RFC 3986 §6.2.2.1), drop default ports, remove the
    tracking-parameter family (the canonical five-field utm block,
    fbclid/gclid/msclkid/ref_src) order-preservingly, drop empty
    query strings, trim trailing path slashes incl. the root
    (§6.2.3: empty path ≡ '/').  Pure JVM regex/replace — the DuckDB
    oracle restates the EXPECTED canonical key in closed form per
    fixture arm, so the hash certifies the normalization semantics,
    and the window count pins the dedup collapse: the messy arm
    (mixed-case host, :443, trailing slash, full utm block, fragment)
    and the already-clean arm of each group MUST land on the same key
    (n_same_key = 2) while the fbclid and per-id arms stay singletons.

    Scale: a narrow projection plus one hash-partitioned window over
    the canonical key — exactly the shuffle URL-level dedup pays at
    any scale; no UDF, no Python."""
    from pyspark.sql import Window

    from ..functions.urls import canonical_url

    docs = load_table(spark, sf_dir, "documents")
    g = F.expr("doc_id DIV 4").cast("string")
    arm = F.col("doc_id") % 4
    raw = (
        F.when(
            arm == 0,
            F.concat(
                F.lit("https://Site"), g, F.lit(".Example.COM:443/page/"),
                g,
                F.lit(
                    "/?utm_source=feed&utm_medium=rss&utm_campaign=c"
                    "&utm_term=t&utm_content=x&id="
                ),
                g, F.lit("#top"),
            ),
        )
        .when(
            arm == 1,
            F.concat(
                F.lit("https://site"), g, F.lit(".example.com/page/"), g,
                F.lit("?id="), g,
            ),
        )
        .when(
            arm == 2,
            F.concat(
                F.lit("HTTP://M"), g, F.lit(".Example.com:80/m/"), g,
                F.lit("/?fbclid=x"), F.col("doc_id").cast("string"),
                # r15 adversarial tail: tracked NAME as a PREFIX of an
                # unrelated key — must SURVIVE canonicalization (the
                # r14-advice collision deleted '&fbclid' inside it)
                F.lit("&fbclid_x=1"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://p.example.com/d/"),
                F.col("doc_id").cast("string"),
            )
        )
    )
    out = docs.select(
        "doc_id", canonical_url(raw).alias("canon_url")
    )
    return out.select(
        "doc_id",
        "canon_url",
        F.count(F.lit(1))
        .over(Window.partitionBy("canon_url"))
        .cast("bigint")
        .alias("n_same_key"),
    )
