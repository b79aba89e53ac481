"""Build-once / probe-many persisted scratch artifacts (r11 verdict
next-round #4 — the accepted-debt consolidation of the pattern that
grew up independently in ``functions/decontaminate.ensure_gram_index``
(r10) and ``queries/dedup_ops._ensure_char5_jaccard_truth`` (r11)).

The pattern: a relation that is EXPENSIVE to derive but consumed by
several declared queries (a benchmark's gram index, an exact-Jaccard
truth pair set) is persisted as a LakeTable in the per-process scratch
area, keyed by a content digest; the first caller pays the build,
every later caller reads a small parquet relation.  Values are
bit-identical either way because the artifact's column types
round-trip parquet exactly — and the BUILD path stays under each
consumer's differential oracle (the first run per process executes
it).

CACHE-KEY CONTRACT (r10 advice, unchanged): ``cache_key`` must
uniquely name the artifact's input CONTENTS plus every derivation
parameter — not merely a fixture directory — because the artifact is
keyed on nothing else.  Two callers passing different inputs under
the same key would silently probe whichever artifact was built first.

Scale: the scratch area is per-process (driver-local in tests; a
shared object-store prefix keyed by snapshot version in production),
and the artifact is a LakeTable, so concurrent first-callers race on
an atomic create exactly like any LakeTable writer.  The helper adds
no Spark jobs beyond the build itself — existence is a filesystem
probe.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def ensure_lake_artifact(
    spark: SparkSession,
    family: str,
    cache_key: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Read the persisted artifact for ``(family, cache_key)``,
    building it first if this process has not yet done so.

    ``family`` names the scratch subdirectory (one per artifact kind,
    so unrelated artifacts can never digest-collide across kinds);
    ``cache_key`` is digested to the artifact's directory name;
    ``build`` returns the relation to persist on first call and is
    not invoked afterwards.
    """
    from ..lakehouse import LakeTable
    from ..session import scratch_dir

    digest = hashlib.md5(cache_key.encode()).hexdigest()[:12]
    path = os.path.join(scratch_dir(family), digest)
    if not LakeTable.is_table(path):
        LakeTable.create(build(), path)
    return LakeTable(path).read(spark)
