"""Dedup/similarity-tier scale checkpoint (r13 verdict next-round #5):
run the heaviest text-dedup and embedding-similarity queries at a 10x
``documents``/``embeddings`` corpus and report per-query wall-clock
slopes — the same measurement the relational tier
(tools/scale_relational.py), codec family, and index-append paths
already carry.

Why the derivation differs from the relational tool's plain id-shift:
a text corpus scaled as 10 VERBATIM copies would make every document
a 10-way exact/near duplicate — MinHash buckets grow 10x, candidate
pairs 100x, and every slope goes super-linear BY FIXTURE DESIGN, not
by plan defect.  The honest 10x fixture is "10 independent corpora of
the same statistical shape":

* documents: copy ``i`` shifts ``doc_id`` by ``i * stride`` AND
  applies a per-copy SUBSTITUTION CIPHER over [a-z]/[A-Z]/[0-9]
  (``F.translate`` with a rotated alphabet).  A character bijection
  renames every token AND every char shingle bijectively, so ALL
  intra-copy similarity values — token Jaccard, char-5-shingle
  Jaccard, simhash distances, span fingerprints — are preserved
  EXACTLY (same sets, renamed elements), while cross-copy text
  shares only coincidental shingles.  (The first attempt suffixed
  every token ``t -> t_i``; that injects a shared ``"_i "`` filler
  into every char shingle and INFLATES intra-copy similarity — the
  measured pair relation exploded 256 → 54M.  A cipher has no such
  filler: pair count goes 256 → exactly 2,560.)
* embeddings: copy ``i`` shifts ``vec_id`` and applies a CYCLIC
  DIMENSION ROTATION of ``i * 6`` positions — a coordinate
  permutation is orthogonal, so every intra-copy distance, cosine,
  and cluster structure is preserved bit-for-bit while cross-copy
  cosines decorrelate.

Expected shape: the banded-LSH / prefix-filter / per-cluster plans
are linear-ish in corpus size with constant per-key fan-out; with 32
cores absorbing fixed overheads a healthy slope at 10x is ~x2-x8.
The one query where routing matters most is q_dedup_jaccard_dense:
its ``exact_jaccard_pairs`` router picks postings-vs-matmul kernels
from vocabulary statistics, and 10x disjoint-vocab data is exactly
where a wrong routing would first show as a super-linear slope.

Usage (idle box):

    python tools/scale_dedup.py             # generate + run
    python tools/scale_dedup.py --gen-only  # just write /tmp/sfded1
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = "/tmp/sfded1"
COPIES = 10
ID_STRIDE = 100_000  # > any sf0.1 doc_id/vec_id
DIM = 64

#: heaviest dedup/similarity tier-1 queries by r13 bench_detail wall
#: time, per the r13 verdict's named list (+ the simhash/spans pair
#: that shares the shingle machinery)
QUERIES = [
    "q_dedup_prefix",
    "q_dedup_minhash",
    "q_dedup_jaccard_dense",
    "q_dedup_simhash",
    "q_semdedup",
    "q_knn_graph",
    "q_decontaminate",
    "q_dup_spans",
]


def generate(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(DST, exist_ok=True)
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    embs = spark.read.parquet(f"{SRC}/embeddings.parquet")
    doc_copies = []
    emb_copies = []
    for i in range(COPIES):
        # per-copy substitution cipher (see module docstring): a
        # character bijection renames shingles, never reshapes them
        c = docs.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(i * ID_STRIDE)).cast("bigint")
        )
        if i > 0:
            lower = "abcdefghijklmnopqrstuvwxyz"
            upper = lower.upper()
            digits = "0123456789"
            rl = (i * 3) % 26 or 1  # per-copy rotation, never 0
            rd = (i % 9) + 1
            src = lower + upper + digits
            dst = (
                lower[rl:] + lower[:rl]
                + upper[rl:] + upper[:rl]
                + digits[rd:] + digits[:rd]
            )
            c = c.withColumn("text", F.translate(F.col("text"), src, dst))
        doc_copies.append(c)
        k = (i * (DIM // COPIES)) % DIM
        e = embs.withColumn(
            "vec_id", (F.col("vec_id") + F.lit(i * ID_STRIDE)).cast("bigint")
        )
        if k:
            e = e.withColumn(
                "embedding",
                F.concat(
                    F.slice("embedding", k + 1, DIM - k),
                    F.slice("embedding", 1, k),
                ),
            )
        emb_copies.append(e)
    out_d = doc_copies[0]
    for c in doc_copies[1:]:
        out_d = out_d.unionByName(c)
    out_d.write.mode("overwrite").parquet(f"{DST}/documents.parquet")
    out_e = emb_copies[0]
    for c in emb_copies[1:]:
        out_e = out_e.unionByName(c)
    out_e.write.mode("overwrite").parquet(f"{DST}/embeddings.parquet")
    print(
        f"  documents: {docs.count()} -> {out_d.count()} rows; "
        f"embeddings: {embs.count()} -> {out_e.count()}",
        flush=True,
    )
    for tbl in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events",
    ):
        src = f"{SRC}/{tbl}.parquet"
        dst = f"{DST}/{tbl}.parquet"
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)


def main() -> None:
    from bench import calibration_query, force, warmup
    from lab5_lakehouse_etl_spark import queries as Q
    from lab5_lakehouse_etl_spark.session import build_session

    Q.load_all()
    spark = build_session("lab5-scale-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"generating {DST} from {SRC} (x{COPIES} cipher-salted copies)")
    generate(spark)
    if "--gen-only" in sys.argv:
        spark.stop()
        return
    warmup(spark, DST, build_artifacts=False)
    t0 = time.perf_counter()
    force(calibration_query(spark, DST))
    print(f"calibration_sec {time.perf_counter() - t0:.3f}")
    import gc

    for name in QUERIES:
        fn = Q.QUERIES[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            force(fn(spark, DST))
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
            gc.collect()
        print(f"{name} {best:.3f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
