"""Deduplication operator family for document corpora.

Four tiers, all deterministic (fixed xxhash64 seeds, no randomness):

1. exact     — hash-groupBy on a fingerprint (md5 of normalized text).
2. minhash   — MinHash signatures + LSH banding → candidate pairs →
               exact Jaccard verify. Entirely JVM-side lambda
               expressions; NO explode of shingles, NO Python.
3. simhash   — 64-bit SimHash fingerprints; near-dups = small Hamming
               distance within LSH bands of the fingerprint.
4. ngram     — word n-gram Jaccard verify (shares the minhash
               candidate machinery with a different shingle fn).

Scale design: signatures are computed in a narrow map (one pass over
text, no shuffle). The only shuffles are (a) the explode of B band keys
per doc followed by a self-join on (band, bucket) — the standard LSH
join, linear in candidates, never all-pairs; (b) the final key join to
fetch shingle arrays for verification, which joins only candidate
pairs. At 100 TB: band buckets are salted-friendly (bucket keys are
hashes → uniform), and the verify join is orders smaller than the
corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def char_shingles(text_col: str, k: int = 5) -> F.Column:
    """Array of distinct character k-shingles (JVM lambda, no explode)."""
    return F.expr(
        f"array_distinct(transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)),"
        f" i -> substring({text_col}, i, {k})))"
    )


def word_ngrams(text_col: str, n: int = 3) -> F.Column:
    """Array of distinct word n-grams."""
    return F.expr(
        f"""array_distinct(transform(
              sequence(1, greatest(size(split(lower({text_col}), '\\\\s+')) - {n - 1}, 1)),
              i -> array_join(slice(split(lower({text_col}), '\\\\s+'), i, {n}), ' ')))"""
    )


def minhash_signature(shingles: F.Column, num_hashes: int = 32) -> F.Column:
    """MinHash signature: for seed j, min over shingles of xxhash64(s, j).

    One nested JVM lambda — sequence(0, H-1) × array_min(transform(...)).
    xxhash64 with the seed column gives H independent-enough hash
    families, deterministic across runs and engines.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda j: F.array_min(
            F.transform(shingles, lambda s: F.xxhash64(s, j))
        ),
    )


def _band_keys(sig_col: str, num_hashes: int, bands: int) -> F.Column:
    """LSH banding: hash each contiguous slice of the signature."""
    rows_per_band = num_hashes // bands
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.hash(F.slice(F.col(sig_col), b * rows_per_band + 1, rows_per_band)).alias(
                    "bucket"
                ),
            )
            for b in range(bands)
        ]
    )


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
) -> DataFrame:
    """Candidate near-dup pairs via MinHash + LSH banding.

    Returns (id_a, id_b, n_shared_bands) with id_a < id_b. Docs sharing
    ≥1 band bucket become candidates — the classic banding guarantee
    (P[candidate] ≈ 1-(1-j^r)^b for Jaccard j).
    """
    sigs = df.select(
        F.col(id_col).alias("id"),
        minhash_signature(char_shingles(text_col, shingle_k), num_hashes).alias("sig"),
    ).withColumn("bands", _band_keys("sig", num_hashes, bands))
    buckets = sigs.select(
        "id", F.explode("bands").alias("bk")
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket"))
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def verified_near_dups(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_fn=char_shingles,
    threshold: float = 0.6,
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs.

    Joins the (small) candidate set back to shingle arrays and computes
    |A∩B| / |A∪B| with JVM array_intersect/array_union — the verify
    join touches only candidates, never the full corpus cross-product.
    """
    sh = df.select(F.col(id_col).alias("id"), shingle_fn(text_col).alias("sh"))
    out = (
        candidates.join(sh.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), on="id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), on="id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def simhash64(text_col: str) -> F.Column:
    """64-bit SimHash fingerprint from whitespace tokens.

    Per token: xxhash64; per bit position: majority vote of token bits;
    fingerprint bit i set iff vote > 0. One SQL expression of nested
    JVM lambdas (expr form because shiftleft/shiftrightunsigned need
    column bit-counts, which the Python API doesn't accept).
    """
    return F.expr(
        f"""
        aggregate(
          sequence(0, 63),
          cast(0 as bigint),
          (acc, i) -> acc + if(
            aggregate(
              transform(split(lower({text_col}), '\\\\s+'), t -> xxhash64(t)),
              0,
              (a, h) -> a + if((shiftrightunsigned(h, i) & 1) = 1, 1, -1)
            ) > 0,
            shiftleft(cast(1 as bigint), i),
            cast(0 as bigint)
          )
        )
        """
    )


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    LSH trick: split the 64-bit fingerprint into 4 16-bit chunks; any
    pair within Hamming 3 shares ≥1 exact chunk (pigeonhole), so the
    self-join runs on chunk equality, never all-pairs. Pairs are then
    verified with an exact popcount-based Hamming distance.
    """
    fp = df.select(F.col(id_col).alias("id"), simhash64(text_col).alias("fp"))
    chunks = fp.select(
        "id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned(F.col("fp"), 16 * c)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ck"),
    ).select("id", "fp", F.col("ck.chunk").alias("chunk"), F.col("ck.val").alias("val"))
    a, b = chunks.alias("a"), chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.fp").alias("fp_a"),
            F.col("b.fp").alias("fp_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    xor = F.col("fp_a").bitwiseXOR(F.col("fp_b"))
    hamming = F.bit_count(xor)
    return pairs.withColumn("hamming", hamming.cast("bigint")).filter(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")
