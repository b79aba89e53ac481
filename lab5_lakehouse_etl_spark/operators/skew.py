"""Skew mitigation: salting for hot keys.

AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on in
our session) splits oversized shuffle partitions at runtime and is the
first line of defense. Salting is the explicit fallback for the cases
AQE can't fix: a single key so hot that ONE key's rows exceed an
executor (AQE can split a partition, not a key), or a shuffle feeding a
stateful/windowed op where AQE doesn't apply.

Both operators preserve exact results — tests pin them to the unsalted
plans' output.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Equi-join where the big side's hot keys are spread over
    ``n_salts`` shuffle partitions.

    Big side: each row gets a salt in [0, n_salts) — derived from a
    per-row hash so one hot key's rows land on n_salts different
    reducers. Small side: replicated n_salts times (explode of a
    literal range — n_salts× the SMALL side only, never the big side).
    Join keys become (key..., salt); the salt is dropped afterwards, so
    the result equals the unsalted join exactly.

    SALT-UNIQUENESS REQUIREMENT: the salt is a deterministic hash of
    ``salt_cols`` (default: ALL big-side columns — the only
    retry-deterministic rowwise signal available without an id; see the
    SPARK-23207 note below).  Rows that are byte-identical on
    ``salt_cols`` share one salt, so a hot key whose rows are EXACT
    duplicates collapses onto a single reducer — silently reinstating
    the straggler this operator exists to remove (r10 advice).  If the
    big side lacks a unique id column and can carry fully duplicated
    hot rows, pass ``salt_cols`` naming columns that distinguish them
    (ingest offset, file+row position) — or add such a column upstream;
    there is no deterministic way to spread indistinguishable rows.
    The declared demo queries are safe: their big sides carry unique
    ids.

    Use when the small side is too big to broadcast AND a key is hot
    enough that one reducer would own it entirely. For broadcastable
    dims, prefer ``F.broadcast`` — no shuffle at all beats a balanced
    shuffle.

    Supported ``how``: inner / left / left_semi / left_anti — shapes
    where an unmatched SMALL-side row is never emitted, so replicating
    it is invisible. right/full outer would emit each unmatched small
    row once per salt; refuse rather than silently duplicate.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join cannot preserve {how!r} semantics: unmatched "
            "small-side rows would be duplicated n_salts times"
        )
    keys = list(on)
    # per-row salt: hash over ALL columns — fully DETERMINISTIC under
    # task retry.  monotonically_increasing_id (the first cut) is
    # nondeterministic across stage recomputation: after a fetch
    # failure, recomputed map tasks can assign rows different salts
    # than the outputs some reducers already consumed, duplicating or
    # dropping rows through the shuffle (the SPARK-23207 class of
    # silent corruption; r10 review).  Identical full rows now share a
    # salt — placement-only, result-identical, and only a key whose
    # hot rows are byte-identical loses spreading (such rows carry no
    # distinguishing payload to begin with).
    big_s = big.withColumn(
        SALT,
        F.pmod(
            F.xxhash64(*[F.col(c) for c in (salt_cols or big.columns)]),
            F.lit(n_salts),
        ),
    )
    small_s = small.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = big_s.join(small_s, keys + [SALT], how)
    return out.drop(SALT)


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: partial aggregate on
    (keys..., salt), then final combine on keys.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, count, min, max} — the algebraic aggregates whose partials
    combine losslessly (count combines via sum). avg is derivable as
    sum/count by the caller. Spark already does map-side partial
    aggregation; the explicit salt phase adds a REDUCE-side split for
    keys whose partials alone overwhelm one reducer (e.g. count
    distinct-ish state or extreme row counts per key).

    SALT-UNIQUENESS REQUIREMENT (same contract as :func:`salted_join`,
    r10 advice): the salt hashes ``salt_cols`` (default all columns);
    rows byte-identical on those columns share a salt, so a hot group
    made of EXACT duplicate rows still lands on one reducer.  Pass
    ``salt_cols`` naming a uniqueness-bearing column set (or add one
    upstream) when the input can carry fully duplicated hot rows.
    """
    allowed = {"sum", "count", "min", "max"}
    for out_col, (_, fn) in aggs.items():
        if fn not in allowed:
            raise ValueError(f"{out_col}: {fn} is not losslessly combinable")

    # deterministic per-row salt over all columns — see salted_join:
    # monotonically_increasing_id is unstable under stage recomputation
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in (salt_cols or df.columns)]),
        F.lit(n_salts),
    )
    partial_exprs = [
        getattr(F, fn)(src).alias(out_col) for out_col, (src, fn) in aggs.items()
    ]
    combine_exprs = [
        (F.sum(out_col) if fn in ("sum", "count") else getattr(F, fn)(out_col))
        .alias(out_col)
        for out_col, (_, fn) in aggs.items()
    ]
    return (
        df.withColumn(SALT, salt)
        .groupBy(*keys, SALT)
        .agg(*partial_exprs)
        .groupBy(*keys)
        .agg(*combine_exprs)
    )
