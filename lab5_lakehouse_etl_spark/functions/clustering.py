"""K-means clustering over an embedding column (Lloyd's algorithm).

The semantic-clustering primitive behind SemDeDup-style dedup and
cluster-balanced corpus sampling (Abbas et al. 2023, arXiv:2303.09540):
cluster the embedding store, then dedup / sample within clusters.

Spark shape (the 100 TB design):

- **Assignment** is a narrow map: centroids are tiny (k x dim floats)
  and enter the plan as literal arrays, so each row computes k
  squared-euclidean distances JVM-side (`zip_with` + ordered
  `aggregate` fold) with zero shuffle and no Python in the row path.
- **Update** is `posexplode(v)` -> `groupBy(cluster, pos).sum` — the
  explode pipelines inside whole-stage codegen into the hash
  aggregate's map-side partial, so each task ships at most
  k x dim partial rows to one tiny shuffle regardless of input size
  (this IS the "per-partition partial sums" pattern, JVM-side for free).
- The k x dim stats `collect()` per iteration is a parameter fetch
  (<= 512 small rows), the same bounded-driver-state pattern as the
  PageRank/connected-components convergence witnesses.

Determinism / oracle parity: centroids are rounded to ``decimals``
after init and every update, so cross-engine (and run-to-run)
float-summation-order differences — ~1e-13 relative, far below the
rounding quantum — cannot perturb the trajectory. Ties in the argmin
break to the lowest surviving cluster id in both engines
(`array_position` returns the FIRST minimum; the oracle orders by
(dist, cl)). Empty clusters drop out of the stats in both engines
identically.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Training-sample cap shared by every bounded-sample trainer
#: (kmeans_fit_assign here, pq_train in similarity.py): k*dim model
#: parameters saturate long before 10^5 vectors, so training cost must
#: be O(sample), independent of corpus size.
TRAIN_SAMPLE_N = 65536


def seq_sq_dists(X: "np.ndarray", C: "np.ndarray") -> "np.ndarray":
    """(n, k) squared-L2 distances between rows of ``X`` (n, dim) and
    ``C`` (k, dim), accumulated STRICTLY left-to-right over the dim
    axis — each step adds exactly one squared difference to the running
    scalar, so every element reproduces bit-for-bit the sequential fold
    that ``F.aggregate(zip_with(...), 0.0, acc + z)`` and DuckDB's
    ``list_sum`` compute.

    This exists because ``np.sum(..., axis=2)`` does NOT do that: numpy's
    reducer is pairwise summation with an 8-way unrolled inner block even
    below its 128-element block size, which empirically differs from the
    left fold in the last ulp for most random 64-dim vectors.  A near-tie
    in d2 can then flip an argmin during driver-side Lloyd training and
    diverge the centroid trajectory from the cross-engine CTE oracle —
    inside the declared parity domain.  The dim-axis loop below is the
    vectorized form of the left fold: per (i, j) element the adds happen
    one per dim step in increasing-dim order, identical to the scalar
    sequence; the loop is over dim (<= 128), so the cost stays a handful
    of (n, k) vectorized ops."""
    n = X.shape[0]
    k = C.shape[0]
    acc = np.zeros((n, k), dtype=np.float64)
    for j in range(X.shape[1]):
        diff = X[:, j, None] - C[None, :, j]
        acc += diff * diff
    return acc


def sample_training_vectors(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = TRAIN_SAMPLE_N,
) -> tuple[list[int], "np.ndarray", DataFrame]:
    """The shared sample/collect stage of the bounded-sample trainers —
    ONE implementation so kmeans_fit_assign and pq_train stay in
    lockstep by construction, not by comment (the r5 seeding bug
    happened exactly when the two drifted).

    ``sample_n`` distinct ids are chosen by HASH order (TakeOrdered —
    no full sort), then every row carrying one of those ids is
    collected, sorted by (id, vector) so the first row per id is the
    deterministic lexicographic duplicate tie-break.  Hash order, not
    id order: above the cap, lowest-id sampling is BIASED for any
    corpus whose ids correlate with content (ingest order, shard
    order); xxhash64(id) is an unbiased-yet-deterministic draw.
    Below the cap the limit cuts nothing, so the choice is
    behavior-neutral at every test scale.  The broadcast semi-join
    keeps the corpus-side scan shuffle-free.

    Returns (vec_ids, X, base): the sorted sample as parallel id list
    / (n, dim) float64 matrix, plus the normalized (vec_id, v)
    relation for callers that run a distributed pass afterwards.

    NULL embeddings are dropped at normalization (r10 review, same
    class as the blocked-kernel misalignment fix): a NULL vector has
    no place in a centroid mean, and a None row in the collected
    sample crashed the np.array assembly with an inhomogeneous-shape
    error."""
    base = emb.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    ids = (
        base.select("vec_id")
        .distinct()
        .orderBy(F.xxhash64("vec_id"), F.col("vec_id"))
        .limit(sample_n)
    )
    rows = (
        base.join(F.broadcast(ids), "vec_id", "inner")
        .orderBy("vec_id", "v")
        .collect()
    )
    vec_ids = [int(r["vec_id"]) for r in rows]
    X = (
        np.array([r["v"] for r in rows], dtype=np.float64)
        if rows
        else np.empty((0, 0), dtype=np.float64)
    )
    return vec_ids, X, base


def _distances(cents: list[tuple[int, list[float]]]) -> Column:
    """Array of squared-euclidean distances from ``v`` to each centroid,
    in centroid order — ordered fold, so the DuckDB twin's sequential
    list_sum agrees to the last ulp."""
    return F.array(
        *[
            F.aggregate(
                F.zip_with(
                    F.col("v"),
                    F.array(*[F.lit(float(x)) for x in vec]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0).cast("double"),
                lambda acc, z: acc + z,
            )
            for _, vec in cents
        ]
    )


def assign_clusters(
    emb: DataFrame,
    cents: list[tuple[int, list[float]]],
    with_dist: bool = False,
    decimals: int = 6,
) -> DataFrame:
    """Add ``cluster`` = id of the nearest centroid (first-min
    tie-break); with ``with_dist``, also the squared distance to it,
    rounded to ``decimals`` so downstream per-cluster rankings are
    immune to cross-engine float-summation-order differences.  The
    width MUST match the caller's oracle twin (cluster_sample_oracle_sql
    ranks on dist rounded to the same ``decimals``); a hardcoded 6 here
    silently broke the documented both-engines parity for non-default
    callers (r10 review)."""
    ids = F.array(*[F.lit(int(cl)) for cl, _ in cents])
    dists = _distances(cents)
    idx = F.array_position(dists, F.array_min(dists)).cast("int")
    out = emb.withColumn("cluster", F.element_at(ids, idx))
    if with_dist:
        out = out.withColumn("dist", F.round(F.array_min(dists), decimals))
    return out


def kmeans_fit_assign(
    emb: DataFrame,
    k: int = 8,
    iters: int = 5,
    decimals: int = 6,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    with_dist: bool = False,
    dedup_ids: bool = True,
) -> DataFrame:
    """Run ``iters`` Lloyd's update rounds from the deterministic init
    (the k lowest-``id_col`` vectors), then return (id, cluster)
    assignments under the final centroids — ONE ROW PER DISTINCT ID
    (``dedup_ids=True``, the CTE-twin contract): a duplicated id
    resolves to its minimum-(raw dist, cluster) row, exactly the
    oracle's per-round ``rn=1`` window over (row, centroid) pairs.
    The dedup is a vec_id-partitioned window — a shuffle the common
    keyed-store case doesn't need; callers whose id column is unique
    by construction (which is when 100 TB matters) pass
    ``dedup_ids=False`` to keep the final assignment a zero-shuffle
    narrow map.

    Fixed iteration count, not convergence-tested — same contract as
    the PageRank query, which is what makes the unrolled-CTE DuckDB
    oracle expressible.

    TRAINING IS SAMPLE-BOUNDED since r7 (same move as pq_train): a
    hash-ordered deterministic sample of up to 65536 vectors (see
    sample_training_vectors — xxhash64 draw, unbiased above the cap,
    the whole corpus below it) is collected once and Lloyd-iterated
    driver-side in vectorized numpy; only the FINAL ASSIGNMENT — the
    corpus-scale pass — runs distributed, as a narrow JVM map under
    literal centroids.  k*dim centroid parameters saturate long before
    10^5 training vectors, so training cost must be O(sample): the
    pre-r7 loop re-scanned the corpus once per round and paid per-round
    job scheduling + a 512-literal assignment expression, ~1 s/round of
    pure overhead at bench scale.  Numeric parity with the DuckDB CTE
    twin holds on two legs: centroid means are rounded to ``decimals``
    every round (so the ~1e-13 relative summation-order wiggle of the
    id-sorted numpy accumulation sits far below the rounding quantum),
    and the UNROUNDED argmin distances are computed with seq_sq_dists —
    a strict left fold over dim, bit-for-bit the F.aggregate /
    list_sum sequence, because np.sum's pairwise reducer is not and a
    near-tie could otherwise flip an assignment mid-trajectory.
    Assignment ties break to the first (lowest-cl) minimum in both the
    numpy argmin and the distributed array_position(array_min).  DECLARED DOMAIN of the
    CTE parity: corpora within the sample cap, where sample == corpus
    and the twin replays the identical trajectory.  Above the cap the
    two diverge by construction — the CTE seeds from the corpus-wide
    lowest ids and iterates every vector, while this path trains on
    the hash-drawn sample — so an above-cap corpus needs a
    sample-stated oracle (or rows-only verification), not this twin.
    Test corpora sit ~30x below the cap."""

    # Seeding uses the k lowest ids of the collected sample —
    # filter(vec_id < k) would require a dense zero-based id space
    # and under-seed on sparse ids (the r5 pq_train bug); the sample/
    # collect stage is shared with pq_train via
    # sample_training_vectors, so the two trainers cannot drift, and
    # kmeans_cte_prefix's c0 matches the init below the cap.
    vec_ids, X, base = sample_training_vectors(emb, id_col, vec_col)
    cents: list[tuple[int, list[float]]] = []
    if len(vec_ids):
        # init: for each of the k lowest distinct ids, that id's
        # lexi-min vector (rows are (id, v)-sorted), rounded
        seen: set[int] = set()
        for i, vid in enumerate(vec_ids):
            if vid not in seen:
                seen.add(vid)
                cents.append(
                    (vid, [round(float(x), decimals) for x in X[i]])
                )
                if len(cents) == k:
                    break
        for _ in range(iters):
            C = np.array([vec for _, vec in cents])
            # strict left fold over dim (seq_sq_dists), bit-for-bit the
            # ordered F.aggregate in assign_clusters / list_sum in the
            # CTE twin — np.sum's pairwise reducer is NOT that fold
            d2 = seq_sq_dists(X, C)
            rowd = d2.min(axis=1)
            rowcl = d2.argmin(axis=1)  # first-min tie-break
            # ID-ATOMIC assignment (CTE parity): the oracle's per-round
            # rn=1 window ranks (row, centroid) pairs PER VEC_ID, and
            # its update joins a{it} back to e USING (vec_id) — so ALL
            # rows of a duplicated id follow the id's min-(dist, cl)
            # cluster into the mean.  Assigning duplicate rows
            # independently diverges the trajectory the moment a dup
            # pair straddles two centroids (hypothesis-found,
            # test_kmeans_cte_collision_property).
            id_min: dict[int, tuple[float, int]] = {}
            for i, vid in enumerate(vec_ids):
                cand = (float(rowd[i]), int(rowcl[i]))
                if vid not in id_min or cand < id_min[vid]:
                    id_min[vid] = cand
            assign = np.array(
                [id_min[vid][1] for vid in vec_ids], dtype=np.int64
            )
            nxt: list[tuple[int, list[float]]] = []
            for idx, (cl, _) in enumerate(cents):
                members = X[assign == idx]
                if len(members):  # empty clusters drop out, as in the
                    # old groupBy (no stats row) and the CTE (no group)
                    nxt.append(
                        (
                            cl,
                            [
                                round(float(t) / len(members), decimals)
                                for t in members.sum(axis=0)
                            ],
                        )
                    )
            cents = sorted(nxt)
    cols = ["vec_id", "cluster"] + (["dist"] if with_dist else [])
    # DUPLICATE-ID SEMANTICS (one row per distinct vec_id, like the CTE
    # twin): the oracle's per-round rn=1 window ranks every (row,
    # centroid) pair of an id by (raw dist ASC, cl ASC), so a
    # duplicated id resolves to its min-distance row's cluster.  The
    # per-row assignment alone would emit BOTH duplicate rows — 6 vs 5
    # rows on a planted dup fixture (test_clustering.py).  Rank on the
    # UNROUNDED distance: the seq_sq_dists/F.aggregate/list_sum folds
    # are bit-identical across engines, so raw comparisons agree.
    from pyspark.sql import Window

    assigned = assign_clusters(base, cents, with_dist=True, decimals=decimals)
    if dedup_ids and cents:
        raw_min = F.array_min(_distances(cents))
        assigned = assigned.withColumn("__rawd", raw_min)
        w = Window.partitionBy("vec_id").orderBy(
            F.col("__rawd").asc(), F.col("cluster").asc()
        )
        assigned = (
            assigned.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__rawd")
        )
    return assigned.select(*cols)


def kmeans_cte_prefix(
    k: int = 8, iters: int = 5, dim: int = 64, decimals: int = 6
) -> str:
    """DuckDB CTE chain ending in ``a{iters}`` (vec_id, cl) — the
    fixed-iteration Lloyd's trajectory, mechanically unrolled because
    recursive CTEs forbid aggregates in the recursive term (same
    workaround as the PageRank oracle). Composable: downstream oracles
    append their own CTEs after the trailing comma."""
    parts = [
        "WITH e AS (SELECT vec_id, list_transform(embedding,"
        " x -> CAST(x AS DOUBLE)) AS v FROM embeddings),",
        # lockstep with kmeans_fit_assign's init: k lowest DISTINCT
        # vec_ids, duplicate-id rows collapsed to the lexi-min vector
        # tie-break duplicate-id rows on the RAW vector (ORDER BY v),
        # matching the Python path's orderBy("vec_id", "v") — ordering
        # by the rounded vector could pick a different lexi-min when
        # two duplicates collide after rounding in a leading element
        f"c0 AS (SELECT cl, cent FROM ("
        f"SELECT vec_id AS cl,"
        f" list_transform(v, x -> round(x, {decimals})) AS cent,"
        f" row_number() OVER (PARTITION BY vec_id ORDER BY v) AS rn"
        f" FROM e WHERE vec_id IN"
        f" (SELECT DISTINCT vec_id FROM e ORDER BY vec_id LIMIT {k})"
        f") WHERE rn = 1),",
    ]
    dist = (
        f"list_sum(list_transform(range(1, {dim + 1}),"
        " i -> (e.v[i] - c.cent[i]) * (e.v[i] - c.cent[i])))"
    )
    for it in range(iters + 1):
        parts.append(
            f"a{it} AS (SELECT vec_id, cl FROM ("
            f"SELECT e.vec_id, c.cl, row_number() OVER ("
            f"PARTITION BY e.vec_id ORDER BY {dist} ASC, c.cl ASC) AS rn"
            f" FROM e, c{it} c) WHERE rn = 1)"
        )
        if it < iters:
            parts[-1] += ","
            parts.append(
                f"c{it + 1} AS (SELECT cl, list(r ORDER BY pos) AS cent FROM ("
                f"SELECT a.cl, t.i AS pos,"
                f" round(sum(e.v[t.i]) / count(*), {decimals}) AS r"
                f" FROM a{it} a JOIN e USING (vec_id)"
                f" CROSS JOIN range(1, {dim + 1}) t(i)"
                f" GROUP BY a.cl, t.i) GROUP BY cl),"
            )
    return "\n".join(parts)


def kmeans_oracle_sql(
    k: int = 8, iters: int = 5, dim: int = 64, decimals: int = 6
) -> str:
    """Full oracle: final-round assignments as (vec_id, cluster)."""
    return (
        kmeans_cte_prefix(k, iters, dim, decimals)
        + f"\nSELECT vec_id, CAST(cl AS INT) AS cluster FROM a{iters}"
    )


def semdedup_oracle_sql(
    k: int = 8,
    iters: int = 5,
    dim: int = 64,
    decimals: int = 6,
    threshold: float = 0.35,
) -> str:
    """SemDeDup oracle: the k-means trajectory, then within-cluster
    cosine pairs, then the keep-lowest-id verdict."""
    prefix = kmeans_cte_prefix(k, iters, dim, decimals)
    return f"""{prefix},
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM a{iters} a JOIN a{iters} b ON a.cl = b.cl AND a.vec_id < b.vec_id
  JOIN e ea ON ea.vec_id = a.vec_id
  JOIN e eb ON eb.vec_id = b.vec_id
  WHERE list_dot_product(ea.v, eb.v)
        / (sqrt(list_dot_product(ea.v, ea.v))
           * sqrt(list_dot_product(eb.v, eb.v))) >= {threshold}
)
SELECT t.vec_id, CAST(t.cl AS INT) AS cluster,
       (p.id_b IS NULL) AS keep
FROM a{iters} t LEFT JOIN (SELECT DISTINCT id_b FROM pairs) p
  ON t.vec_id = p.id_b"""


def cluster_sample_oracle_sql(
    k: int = 8,
    iters: int = 5,
    dim: int = 64,
    decimals: int = 6,
    per_cluster: int = 32,
) -> str:
    """Prototypicality-sample oracle: distance of each vector to its
    final centroid, ranked per cluster (dist rounded to ``decimals``
    before ranking in BOTH engines — see assign_clusters)."""
    prefix = kmeans_cte_prefix(k, iters, dim, decimals)
    dist = (
        f"round(list_sum(list_transform(range(1, {dim + 1}),"
        f" i -> (e.v[i] - c.cent[i]) * (e.v[i] - c.cent[i]))), {decimals})"
    )
    return f"""{prefix},
d AS (
  SELECT t.vec_id, t.cl, {dist} AS dist
  FROM a{iters} t JOIN e ON e.vec_id = t.vec_id
  JOIN c{iters} c ON c.cl = t.cl
)
SELECT vec_id, CAST(cl AS INT) AS cluster, CAST(rn AS INT) AS proto_rank
FROM (SELECT vec_id, cl, row_number() OVER (
        PARTITION BY cl ORDER BY dist ASC, vec_id ASC) AS rn FROM d)
WHERE rn <= {per_cluster}"""


def semantic_pairs_within_clusters(
    assigned: DataFrame, threshold: float = 0.35
) -> DataFrame:
    """Within-cluster cosine near-dup pairs (id_a < id_b) via
    ``applyInPandas`` — one vectorized numpy matmul per cluster.

    This is SemDeDup's scale shape: the corpus is partitioned by the
    k-means cluster id, so the quadratic pairwise step runs per
    cluster (sizes bounded by construction — k grows with the corpus)
    and never as a global all-pairs join. A cluster that still
    overflows a task is the caller's cue to raise k; the global
    fallback for unclustered data is functions/similarity.
    exact_pairs_blocked.

    ``assigned`` needs (vec_id, v: array<double>, cluster).
    """
    import pandas as pd

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if len(pdf) < 2:
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype="int64"),
                 "id_b": pd.Series([], dtype="int64")}
            )
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        m = np.stack(pdf["v"].to_numpy()).astype("float64")
        # BLAS matmul is the CANDIDATE scan only (threshold - 1e-9
        # margin): its pairwise-summed cosines differ from the
        # oracle's sequential list_dot_product fold in the last ulp,
        # which could flip a pair sitting exactly on the threshold —
        # the same failure mode exact_pairs_blocked fixed in r7.  The
        # DECLARED cosine is re-computed on candidates with a strict
        # dim-axis left fold (dot and both norms), and the threshold
        # applies to THAT value.
        with np.errstate(invalid="ignore", divide="ignore"):
            norms = np.sqrt((m * m).sum(axis=1))
            sims = (m @ m.T) / np.outer(norms, norms)
        ia, ib = np.triu_indices(len(ids), k=1)
        cand = sims[ia, ib] >= threshold - 1e-9
        ia, ib = ia[cand], ib[cand]
        if not len(ia):
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype="int64"),
                 "id_b": pd.Series([], dtype="int64")}
            )
        dot = np.zeros(len(ia), dtype=np.float64)
        na = np.zeros(len(ia), dtype=np.float64)
        nb = np.zeros(len(ia), dtype=np.float64)
        for j in range(m.shape[1]):
            xa, xb = m[ia, j], m[ib, j]
            dot += xa * xb
            na += xa * xa
            nb += xb * xb
        with np.errstate(invalid="ignore", divide="ignore"):
            cos = dot / (np.sqrt(na) * np.sqrt(nb))
        hit = cos >= threshold
        return pd.DataFrame({"id_a": ids[ia[hit]], "id_b": ids[ib[hit]]})

    return assigned.groupBy("cluster").applyInPandas(
        pairs, schema="id_a long, id_b long"
    )
