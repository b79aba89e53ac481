"""Deduplication declared queries over `documents` (SURVEY §2.10).

Exact dedup carries a DuckDB oracle. MinHash/SimHash/ngram-Jaccard are
deterministic (fixed xxhash64 seeds) but xxhash64 has no DuckDB twin →
rows-only, with pytest goldens in tests/test_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dedup as D
from ..session import load_table
from . import query


@query(
    "q_dedup_exact_docs",
    oracle=r"""
    WITH fp AS (SELECT doc_id, md5(text) AS fp FROM documents)
    SELECT fp,
           CAST(min(doc_id) AS BIGINT) AS keeper_doc_id,
           CAST(count(*)    AS BIGINT) AS n_copies
    FROM fp GROUP BY fp
    """,
)
def q_dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via hash-groupBy on a content fingerprint: one
    shuffle on the 16-byte hash, never on the document text — the only
    exact-dedup shape that survives 100 TB (min doc_id = survivor)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.md5("text").alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("doc_id").cast("bigint").alias("keeper_doc_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        )
    )


@query("q_dedup_minhash")
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidate pairs with exact-Jaccard verify
    (threshold 0.5, char 5-shingles, 32 hashes × 8 bands). Rows-only:
    deterministic, but xxhash64 isn't portable to DuckDB."""
    docs = load_table(spark, sf_dir, "documents")
    cands = D.minhash_candidate_pairs(docs)
    return D.verified_near_dups(docs, cands, threshold=0.5)


@query("q_dedup_simhash")
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (64-bit fingerprints, 16-bit-chunk LSH,
    Hamming ≤ 6). Rows-only."""
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_near_dups(docs, max_hamming=6)


@query(
    "q_dedup_embedding",
    oracle="""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.e, b.e)
                 / (sqrt(list_dot_product(a.e, a.e))
                    * sqrt(list_dot_product(b.e, b.e))), 4) AS cosine_sim
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.e, b.e)
          / (sqrt(list_dot_product(a.e, a.e))
             * sqrt(list_dot_product(b.e, b.e))) >= 0.35
    """,
)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, exact and oracle-verified.
    Threshold 0.35: the fixture has no true near-dups (max pairwise
    cosine ≈ 0.51), so it sits where the operator returns a non-trivial
    verified set. Runs through the block-matmul all-pairs operator
    (functions/similarity.exact_pairs_blocked) — a pairwise cosine
    self-join evaluates O(n²) interpreted lambdas (measured ~100 s at
    2000 vectors); block matmul does the same flops vectorized in
    ~B(B+1)/2 balanced tasks. The approximate LSH-bucketed variant is
    declared as q_ann_lsh."""
    from ..functions import similarity as S

    v = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return S.exact_pairs_blocked(v, threshold=0.35)


@query("q_dedup_ngram")
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard near-dup pairs: minhash candidates verified
    against word-ngram sets (threshold 0.3). Rows-only."""
    docs = load_table(spark, sf_dir, "documents")
    # looser estimate gate: word-ngram Jaccard runs lower than char-shingle
    cands = D.minhash_candidate_pairs(docs, est_threshold=0.25)
    return D.verified_near_dups(
        docs, cands, shingle_fn=lambda c: D.word_ngrams(c, 3), threshold=0.3
    )
