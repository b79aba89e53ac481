"""Benchmark-decontamination primitives: build the held-out gram index
ONCE, probe it many times.

Through round 9 each decontamination consumer — the batch audit
(q_decontaminate), the pair-grain span report (q_decontaminate_spans)
and the streaming ingest gate (q_stream_decontaminate) — re-derived the
held-out benchmark's word-n-gram set inline from the documents table.
That is the wrong production shape: benchmarks change rarely (a release
every few months) while corpora stream continuously, so the gram set
belongs in a PERSISTED artifact — a :class:`~..lakehouse.LakeTable`,
exactly like the MinHash band index (functions/dedup.py
minhash_band_index + q_dedup_index_store) — built once per benchmark
release and probed by every audit, span report, and ingest batch.

Scale contract (the 100 TB lens):

* the index is ``(test_doc_id, gram)`` with per-document-distinct grams
  (word_ngrams' array_distinct) — its size is bounded by the BENCHMARK
  token volume, orders of magnitude below the corpus, so every probe
  broadcasts it (plan-pinned in tests/test_plans.py);
* probes are O(batch tokens): a narrow explode/posexplode of the
  probe side into a broadcast hash join — the corpus text never
  shuffles; only surviving (doc, gram/start) hits reach any exchange,
  so downstream aggregation cost is bounded by CONTAMINATION volume;
* the build is one narrow map + LakeTable.create — re-run only when
  the benchmark split changes (version-logged by the table).

No analogue in the reference (nearest: the validate/dedup layer,
jobs/order_glue_job.py:111-126); the operator family is the
training-data-pipeline extension surface (SURVEY §2.10b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import dedup as D


def heldout_grams(
    heldout: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_ids: bool = False,
) -> DataFrame:
    """The held-out benchmark's word-``n``-gram relation.

    ``with_ids=False`` → the distinct global gram SET ``(gram)`` — what
    the contamination EXISTS probes need.  ``with_ids=True`` → the
    per-document-distinct ``(test_doc_id, gram)`` relation — what the
    pair-grain span report and the per-benchmark-item audit need, and
    what :func:`build_gram_index` persists (the set form is a cheap
    projection of it).  Grams are explicit-whitespace-class word
    n-grams (functions/dedup.word_ngrams), distinct within a document
    by construction."""
    grams = heldout.select(
        F.col(id_col).alias("test_doc_id"),
        F.explode(D.word_ngrams(text_col, n)).alias("gram"),
    )
    if with_ids:
        return grams
    return grams.select("gram").distinct()


def build_gram_index(heldout: DataFrame, path: str, n: int = 5,
                     id_col: str = "doc_id", text_col: str = "text"):
    """Persist the per-doc-distinct ``(test_doc_id, gram)`` relation as
    a LakeTable at ``path`` (version-logged, schema-pinned) — the
    build-once artifact every probe reads."""
    from ..lakehouse import LakeTable

    return LakeTable.create(
        heldout_grams(heldout, n, id_col, text_col, with_ids=True), path
    )


def ensure_gram_index(
    spark: SparkSession,
    heldout: DataFrame,
    cache_key: str,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Read the persisted gram index for ``cache_key``, building it
    first if this process has not yet done so — so the batch audit, the
    span report, and the ingest gate all probe ONE artifact instead of
    re-deriving the gram set per query.  The path lives in the
    per-process scratch area, so fixtures never leak across processes
    or stale across driver runs.

    CACHE-KEY CONTRACT (r10 advice): the persisted artifact is keyed on
    ``(cache_key, n, id_col, text_col)`` ONLY — not on the ``heldout``
    relation's definition or content.  ``cache_key`` must therefore
    uniquely name the heldout CONTENTS, not just a fixture directory: a
    benchmark-snapshot version, or the sf_dir PLUS the split predicate
    when more than one heldout subset can be derived from it.  Two
    callers passing different heldout relations under the same key
    would silently probe whichever index was built first.  All four
    in-repo consumers derive the identical deterministic test split per
    sf_dir, so sf_dir alone is a faithful content name for them.

    Since r12 the build-once mechanics live in the shared
    :func:`functions.artifacts.ensure_lake_artifact` (the r11 verdict's
    consolidation of this pattern with dedup_ops' Jaccard truth
    artifact); the digest inputs and scratch family are unchanged, so
    the artifact path is byte-compatible with r10/r11 caches."""
    from .artifacts import ensure_lake_artifact

    return ensure_lake_artifact(
        spark,
        "gram_index",
        f"{cache_key}|n={n}|{id_col}|{text_col}",
        lambda: heldout_grams(heldout, n, id_col, text_col, with_ids=True),
    )


def probe_contaminated_docs(
    probe: DataFrame,
    gram_set: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distinct ``(doc_id)`` of probe-side documents sharing ANY word
    n-gram with the held-out set — the batch-audit membership probe.
    EXISTS semantics make duplicate probe grams harmless, so the probe
    side deliberately skips array_distinct (word_ngrams_all): the
    per-row hash-set pass would be pure overhead before a left-semi."""
    return (
        probe.select(
            id_col, F.explode(D.word_ngrams_all(text_col, n)).alias("gram")
        )
        .join(F.broadcast(gram_set), "gram", "left_semi")
        .select(id_col)
        .distinct()
    )


def probe_leak_counts(
    probe: DataFrame,
    gram_set: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, n_leaked_grams)`` per contaminated probe document —
    the ingest-gate quarantine record.  The probe side uses per-doc
    DISTINCT grams (word_ngrams) so the count is "how many distinct
    n-grams of this document appear in the benchmark"."""
    return (
        probe.select(
            id_col, F.explode(D.word_ngrams(text_col, n)).alias("gram")
        )
        .join(F.broadcast(gram_set), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_leaked_grams"))
    )


def probe_leak_hits(
    probe: DataFrame,
    grams_with_ids: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(train_doc_id, test_doc_id, start)`` positional hit triples —
    the span-report input (functions/dedup.merge_covered_spans).  The
    probe side is a positional posexplode (NO array_distinct — each
    start carries exactly one gram) into the broadcast per-doc-distinct
    index, so the join emits unique triples with no dedup pass."""
    pos = probe.select(
        F.col(id_col).alias("train_doc_id"),
        F.posexplode(D.word_ngrams_all(text_col, n)).alias("start", "gram"),
    )
    return pos.join(F.broadcast(grams_with_ids), "gram").select(
        "train_doc_id", "test_doc_id", "start"
    )
