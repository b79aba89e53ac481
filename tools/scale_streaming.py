"""Streaming-tier scale checkpoint (r14 verdict next-round #9) — the
last tier without 10x evidence (relational r13, dedup/similarity r14,
codecs earlier): drain the four heaviest streaming queries at a 10x
fixture and report wall-clock slopes, phase-attributed where the
query exposes phases.

Honest 10x derivation per input table:

* events (q_stream_session, q_stream_multibatch): copy ``i`` shifts
  ``event_id`` AND ``user_id`` by ``i * stride`` with ``ts``
  UNCHANGED — ten independent user populations over the same time
  span, so per-key event density (and thus per-session/per-window
  state size) stays constant and the measurement isolates state-store
  KEY-COUNT scaling, the shape a 10x-bigger deployment actually has.
  Verbatim copies without the user shift would instead grow every
  session 10x and measure per-key state bloat the fixture invented.
* documents (q_stream_neardup, q_stream_decontaminate): the
  tools/scale_dedup.py cipher derivation — copy ``i`` shifts
  ``doc_id`` and applies a per-copy substitution cipher, preserving
  every intra-copy similarity exactly while decorrelating cross-copy
  text (see that module's docstring for why verbatim copies would
  poison the slopes by design).

Expected shape: availableNow drains are micro-batch loops whose
per-batch work is O(batch); with fixed batch COUNTS and 10x batch
SIZES a healthy slope is linear-ish (~x2-x8 after fixed overheads
amortize on 32 cores).  Super-linear means per-batch work that scales
with CORPUS rather than batch — exactly the defect the neardup gate's
O(batch) contract forbids.

Usage (idle box):

    python tools/scale_streaming.py             # generate + run
    python tools/scale_streaming.py --gen-only  # just write /tmp/sfstream1
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = "/tmp/sfstream1"
COPIES = 10
ID_STRIDE = 100_000  # > any sf0.1 event_id/user_id/doc_id

QUERIES = [
    "q_stream_neardup",       # phase-attributed below
    "q_stream_multibatch",
    "q_stream_session",
    "q_stream_decontaminate",
]


def generate(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(DST, exist_ok=True)
    events = spark.read.parquet(f"{SRC}/events.parquet")
    ev_copies = []
    for i in range(COPIES):
        ev_copies.append(
            events.withColumn(
                "event_id",
                (F.col("event_id") + F.lit(i * ID_STRIDE)).cast("bigint"),
            ).withColumn(
                "user_id",
                (F.col("user_id") + F.lit(i * ID_STRIDE)).cast("bigint"),
            )
        )
    out_e = ev_copies[0]
    for c in ev_copies[1:]:
        out_e = out_e.unionByName(c)
    out_e.write.mode("overwrite").parquet(f"{DST}/events.parquet")

    # documents: the scale_dedup cipher derivation (same constants)
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    doc_copies = []
    for i in range(COPIES):
        c = docs.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(i * ID_STRIDE)).cast("bigint")
        )
        if i > 0:
            lower = "abcdefghijklmnopqrstuvwxyz"
            upper = lower.upper()
            digits = "0123456789"
            rl = (i * 3) % 26 or 1
            rd = (i % 9) + 1
            src = lower + upper + digits
            dst = (
                lower[rl:] + lower[:rl]
                + upper[rl:] + upper[:rl]
                + digits[rd:] + digits[:rd]
            )
            c = c.withColumn("text", F.translate(F.col("text"), src, dst))
        doc_copies.append(c)
    out_d = doc_copies[0]
    for c in doc_copies[1:]:
        out_d = out_d.unionByName(c)
    out_d.write.mode("overwrite").parquet(f"{DST}/documents.parquet")
    print(
        f"  events: {events.count()} -> {out_e.count()} rows; "
        f"documents: {docs.count()} -> {out_d.count()}",
        flush=True,
    )
    for tbl in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "embeddings",
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
    spark = build_session("lab5-scale-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"generating {DST} from {SRC} (x{COPIES} key-shifted copies)")
    generate(spark)
    if "--gen-only" in sys.argv:
        spark.stop()
        return
    warmup(spark, DST, build_artifacts=False)
    t0 = time.perf_counter()
    force(calibration_query(spark, DST))
    print(f"calibration_sec {time.perf_counter() - t0:.3f}")
    import gc

    from lab5_lakehouse_etl_spark.queries import streaming_ops as SO

    for name in QUERIES:
        fn = Q.QUERIES[name]
        best = float("inf")
        best_phases = None
        for _ in range(2):
            t0 = time.perf_counter()
            force(fn(spark, DST))
            wall = time.perf_counter() - t0
            if wall < best:
                best = wall
                if name == "q_stream_neardup":
                    best_phases = dict(SO.NEARDUP_PHASES)
            spark.catalog.clearCache()
            gc.collect()
        extra = f"  phases={best_phases}" if best_phases else ""
        print(f"{name} {best:.3f}{extra}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
