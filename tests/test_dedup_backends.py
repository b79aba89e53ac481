"""Scale-path equivalence: the arrow signature backend and the
semi-join verify prefilter are the 100 TB variants of the minhash
pipeline — both must produce the same verified near-dup sets as the
lab-scale defaults on the fixture corpus."""

from __future__ import annotations

from lab5_lakehouse_etl_spark.functions import dedup as D
from lab5_lakehouse_etl_spark.session import load_table
from tests.conftest import SF_DIR


def _pairs(df):
    return sorted((r.id_a, r.id_b, r.jaccard) for r in df.collect())


def test_arrow_backend_matches_expr(spark):
    docs = load_table(spark, SF_DIR, "documents")
    expr_out = D.verified_near_dups(
        docs, D.minhash_candidate_pairs(docs, backend="expr"), threshold=0.5
    )
    arrow_out = D.verified_near_dups(
        docs, D.minhash_candidate_pairs(docs, backend="arrow"), threshold=0.5
    )
    # Different base hashes (xxhash64 vs crc32) can admit different
    # CANDIDATES, but exact-Jaccard verification must converge on the
    # same true near-dup pairs.
    assert _pairs(expr_out) == _pairs(arrow_out)


def test_prefilter_verify_matches_corpus_verify(spark):
    docs = load_table(spark, SF_DIR, "documents")
    cands = D.minhash_candidate_pairs(docs)
    a = D.verified_near_dups(docs, cands, threshold=0.5, prefilter=False)
    b = D.verified_near_dups(docs, cands, threshold=0.5, prefilter=True)
    assert _pairs(a) == _pairs(b)

