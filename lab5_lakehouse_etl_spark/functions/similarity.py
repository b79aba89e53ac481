"""Similarity search over embedding columns (array<float>).

Brute-force cosine is the exact baseline: a narrow JVM map computing
dot products with zip_with/aggregate lambdas (no UDF, no Python), then
TakeOrderedAndProject for top-k — at 100 TB this is one scan, zero
shuffles.

The scale path is random-hyperplane LSH: a deterministic set of
hyperplanes (seeded, generated driver-side as literals) maps each
vector to a small signature; near neighbors collide in buckets, and the
exact cosine re-rank touches only bucket-mates. Bucket keys are hashes,
so the self-join distributes uniformly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .clustering import seq_sq_dists


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, sequential left-fold (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sq_norm(a: Column) -> Column:
    return dot(a, a)


def cosine(a: Column, b: Column) -> Column:
    """NULL (not an error) for zero-norm vectors: the driver's vanilla
    Spark 4 session runs ANSI mode, where a bare /0 throws
    DIVIDE_BY_ZERO; nullif makes the divisor NULL instead, and NULL
    similarity drops out of every threshold filter."""
    return dot(a, b) / F.nullif(F.sqrt(sq_norm(a)) * F.sqrt(sq_norm(b)), F.lit(0.0))


def _vec_lit(vec) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def topk_cosine(
    df: DataFrame,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-k by cosine similarity to a literal query
    vector. orderBy+limit compiles to TakeOrderedAndProject (per-
    partition heaps, driver merge) — no global sort."""
    q = _vec_lit(query_vec)
    sim = F.round(cosine(F.col(vec_col), q), 4).alias("cosine_sim")
    return (
        df.select(F.col(id_col), sim)
        # zero-norm / NULL vectors have NULL cosine — no defined rank,
        # so they must not pad the top-k when fewer than k qualify
        .filter(F.col("cosine_sim").isNotNull())
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (driver-side, shipped as literals)."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(vec_col: str, planes: list[list[float]]) -> Column:
    """Signed-random-projection bucket id: bit i = (v·planeᵢ > 0)."""
    bits = [
        F.when(dot(F.col(vec_col), _vec_lit(p)) > 0, F.lit(1)).otherwise(F.lit(0))
        for p in planes
    ]
    bucket = F.lit(0).cast("bigint")
    for i, bit in enumerate(bits):
        bucket = bucket + F.shiftleft(bit.cast("bigint"), i)
    return bucket


def ann_pairs_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    seed: int = 42,
    min_cosine: float = 0.0,
    dim: int | None = None,
) -> DataFrame:
    """Approximate near-neighbor pairs: bucket by hyperplane signature,
    exact cosine re-rank within buckets only. Returns (id_a, id_b,
    cosine_sim) with id_a < id_b, cosine ≥ min_cosine."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    bucketed = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        lsh_bucket(vec_col, planes).alias("bucket"),
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 4).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= min_cosine)
    )


def exact_pairs_blocked(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int | None = None,
) -> DataFrame:
    """EXACT all-pairs cosine ≥ threshold via block-matrix multiply.

    The naive self-join evaluates one interpreted cosine expression per
    pair — O(n²) lambda invocations (measured: ~100 s for 2000×2000
    at dim 64). This operator instead:

    1. hashes vectors into ``n_blocks`` blocks, collecting each block
       to one row (ids + matrix);
    2. cross-joins block rows with bid_a ≤ bid_b — B(B+1)/2 tasks, the
       unit of parallelism;
    3. inside each task, one numpy float64 matmul of the two
       L2-normalized blocks scores every cross-pair at SIMD speed.

    Same result as the pairwise expression, same O(n²·d) flops — but
    vectorized and evenly parallel. At 100 TB, n_blocks grows so a
    block pair fits executor memory; the B² fan-out is the standard
    exact-similarity-join layout (each input row is shuffled B times,
    never all-pairs).

    CROSS-ENGINE PARITY (r7): the numpy matmul is the CANDIDATE scan
    only, run at ``threshold - 1e-9`` so BLAS pairwise-summation ulps
    cannot flip membership at the boundary; the DECLARED cosine is
    then re-computed on the candidate pairs with the same sequential
    zip_with/aggregate fold every differential oracle states
    (list_dot_product order), and the threshold is applied to THAT
    value.  Without the split, a pair whose true cosine sits within a
    summation-order ulp of the threshold (or of a round-to-4
    boundary) could count differently in the two engines — the exact
    failure mode q_ann_pq's dot-product-expansion comment documents.
    The re-score join touches only output-sized candidate pairs.
    """
    import numpy as np
    import pandas as pd

    if n_blocks is None:
        n_blocks = max(df.sparkSession.sparkContext.defaultParallelism // 2, 4)

    # NULL embeddings must be dropped BEFORE the paired collects:
    # collect_list skips NULL VALUES but collect_list(id) keeps their
    # ids, so a NULL row would silently misalign ids[] against vecs[]
    # and attribute every later vector in the block to the wrong id
    # (r10 review).  A NULL vector has no defined cosine anyway.
    blocks = (
        df.filter(F.col(vec_col).isNotNull())
        .withColumn("__bid", F.pmod(F.col(id_col), F.lit(n_blocks)))
        .groupBy("__bid")
        .agg(
            F.collect_list(F.col(id_col)).alias("ids"),
            F.collect_list(F.col(vec_col)).alias("vecs"),
        )
    )
    a = blocks.select(
        F.col("__bid").alias("bid_a"), F.col("ids").alias("ids_a"),
        F.col("vecs").alias("vecs_a"),
    )
    b = blocks.select(
        F.col("__bid").alias("bid_b"), F.col("ids").alias("ids_b"),
        F.col("vecs").alias("vecs_b"),
    )
    pairs = a.join(b, F.col("bid_a") <= F.col("bid_b"))

    def score(it):
        for pdf in it:
            for row in pdf.itertuples(index=False):
                ids_a = np.asarray(row.ids_a, dtype=np.int64)
                ids_b = np.asarray(row.ids_b, dtype=np.int64)
                A = np.array([np.asarray(v, dtype=np.float64) for v in row.vecs_a])
                B = np.array([np.asarray(v, dtype=np.float64) for v in row.vecs_b])
                An = A / np.linalg.norm(A, axis=1, keepdims=True)
                Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
                sims = An @ Bn.T
                # margin absorbs summation-order ulps; the declared
                # filter re-applies at the fold-computed value below
                ia, ib = np.nonzero(sims >= threshold - 1e-9)
                out_a, out_b = ids_a[ia], ids_b[ib]
                if row.bid_a == row.bid_b:
                    # diagonal block: every unordered pair appears as
                    # (i,j) AND (j,i) plus the self-pairs — keep one
                    keep = out_a < out_b
                    out_a, out_b = out_a[keep], out_b[keep]
                else:
                    # off-diagonal block pair is visited once; ids are
                    # NOT ordered by block, so normalize the pair
                    out_a, out_b = (
                        np.minimum(out_a, out_b),
                        np.maximum(out_a, out_b),
                    )
                if len(out_a):  # skip empty frames: mixed into the
                    # serializer's concat they trip a FutureWarning
                    yield pd.DataFrame({"id_a": out_a, "id_b": out_b})

    cands = pairs.mapInPandas(score, schema="id_a long, id_b long")
    dv = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731
    va = df.select(
        F.col(id_col).alias("id_a"), dv(F.col(vec_col)).alias("__va")
    )
    vb = df.select(
        F.col(id_col).alias("id_b"), dv(F.col(vec_col)).alias("__vb")
    )
    c = cosine(F.col("__va"), F.col("__vb"))
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("__c", c)
        .filter(F.col("__c") >= threshold)
        .select("id_a", "id_b", F.round("__c", 4).alias("cosine_sim"))
    )


def cross_pairs_blocked(
    a_df: DataFrame,
    b_df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int | None = None,
) -> DataFrame:
    """EXACT cross-relation cosine pairs ≥ threshold — the asymmetric
    twin of :func:`exact_pairs_blocked` for a LARGE corpus side A
    probed against a SMALL reference side B (semantic decontamination:
    A = training corpus, B = held-out benchmark embeddings).

    A is hashed into ``n_blocks`` matrix blocks exactly like
    exact_pairs_blocked; B — orders of magnitude smaller by contract —
    is collected to ONE block row and BROADCAST into the join, so each
    of the B_a tasks runs one numpy matmul of (|A|/B_a × d) against
    (|B| × d) and the corpus side is never shuffled beyond its own
    blocking.  No diagonal handling: the relations are disjoint by
    construction, every (a, b) block pair is visited exactly once.

    Same cross-engine-parity split as exact_pairs_blocked (r7): numpy
    scans candidates at ``threshold - 1e-9``; the DECLARED cosine is
    re-computed on candidates with the sequential fold the oracles
    state, and the threshold applies to THAT value.

    Returns (id_a, id_b, cosine_sim) with id_a from A, id_b from B —
    NOT normalized into an unordered pair: the sides mean different
    things."""
    import numpy as np
    import pandas as pd

    if n_blocks is None:
        n_blocks = max(
            a_df.sparkSession.sparkContext.defaultParallelism // 2, 4
        )

    # see exact_pairs_blocked: NULL vectors would misalign ids/vecs
    a_blocks = (
        a_df.filter(F.col(vec_col).isNotNull())
        .withColumn("__bid", F.pmod(F.col(id_col), F.lit(n_blocks)))
        .groupBy("__bid")
        .agg(
            F.collect_list(F.col(id_col)).alias("ids_a"),
            F.collect_list(F.col(vec_col)).alias("vecs_a"),
        )
    )
    b_block = b_df.filter(F.col(vec_col).isNotNull()).groupBy(
        F.lit(0).alias("__one")
    ).agg(
        F.collect_list(F.col(id_col)).alias("ids_b"),
        F.collect_list(F.col(vec_col)).alias("vecs_b"),
    )
    pairs = a_blocks.crossJoin(F.broadcast(b_block))

    def score(it):
        for pdf in it:
            for row in pdf.itertuples(index=False):
                ids_a = np.asarray(row.ids_a, dtype=np.int64)
                ids_b = np.asarray(row.ids_b, dtype=np.int64)
                A = np.array([np.asarray(v, dtype=np.float64) for v in row.vecs_a])
                B = np.array([np.asarray(v, dtype=np.float64) for v in row.vecs_b])
                An = A / np.linalg.norm(A, axis=1, keepdims=True)
                Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
                sims = An @ Bn.T
                ia, ib = np.nonzero(sims >= threshold - 1e-9)
                if len(ia):
                    yield pd.DataFrame(
                        {"id_a": ids_a[ia], "id_b": ids_b[ib]}
                    )

    cands = pairs.mapInPandas(score, schema="id_a long, id_b long")
    dv = lambda c: F.transform(c, lambda x: x.cast("double"))  # noqa: E731
    va = a_df.select(
        F.col(id_col).alias("id_a"), dv(F.col(vec_col)).alias("__va")
    )
    vb = b_df.select(
        F.col(id_col).alias("id_b"), dv(F.col(vec_col)).alias("__vb")
    )
    c = cosine(F.col("__va"), F.col("__vb"))
    return (
        cands.join(va, "id_a")
        .join(F.broadcast(vb), "id_b")
        .withColumn("__c", c)
        .filter(F.col("__c") >= threshold)
        .select("id_a", "id_b", F.round("__c", 4).alias("cosine_sim"))
    )


def knn_graph(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Exact corpus-wide k-NN graph by cosine similarity — for every
    vector, its ``k`` nearest OTHER vectors as (src, nbr, knn_rank,
    sim).  The graph SemDeDup-style pipelines and graph-based corpus
    curation build before clustering / community detection; distinct
    from topk_cosine (one literal query vs the corpus) because every
    row is a query.

    Layout is the exact_pairs_blocked block-matrix shape — B(B+1)/2
    block-pair tasks, one numpy matmul each — with one extra trick
    that bounds the shuffle: each task emits only the LOCAL top-k of
    every source row against the partner block (plus everything
    within CUT_MARGIN of the local k-th).  A global per-src window
    then merges B partial top-k lists into the final ranking, so the
    shuffle carries ~n*B*k rows instead of the n² scores the naive
    self-join would move.  Dropping below the local cut is safe: the
    partner block already holds >= k candidates above the cut, so the
    global k-th is >= the local k-th, and a margin of 2*10^-decimals
    guarantees a dropped candidate cannot reach the declared
    (rounded) k-th value even across BLAS-vs-fold summation ulps —
    the same boundary argument as exact_pairs_blocked, extended from
    a fixed threshold to the data-dependent rank cut.

    CROSS-ENGINE PARITY: the matmul picks CANDIDATES only; every
    emitted sim is recomputed with a strict dim-axis left fold (dot
    and both norms — see seq_sq_dists for why np.sum's pairwise
    reducer would not match), which reproduces bit-for-bit the
    zip_with/aggregate fold and DuckDB's list_dot_product, and the
    final rank orders by F.round(sim, decimals) DESC, nbr ASC — the
    declared tie-break.  Zero-norm vectors are undefined (their
    cosine is not a number); fixtures contain none.
    """
    if n_blocks is None:
        n_blocks = max(df.sparkSession.sparkContext.defaultParallelism // 4, 4)
    cut_margin = 2.0 * 10.0 ** (-decimals)

    # see exact_pairs_blocked: NULL vectors would misalign ids/vecs
    blocks = (
        df.filter(F.col(vec_col).isNotNull())
        .withColumn("__bid", F.pmod(F.col(id_col), F.lit(n_blocks)))
        .groupBy("__bid")
        .agg(
            F.collect_list(F.col(id_col)).alias("ids"),
            F.collect_list(F.col(vec_col)).alias("vecs"),
        )
    )
    a = blocks.select(
        F.col("__bid").alias("bid_a"), F.col("ids").alias("ids_a"),
        F.col("vecs").alias("vecs_a"),
    )
    b = blocks.select(
        F.col("__bid").alias("bid_b"), F.col("ids").alias("ids_b"),
        F.col("vecs").alias("vecs_b"),
    )
    pairs = a.join(b, F.col("bid_a") <= F.col("bid_b"))

    def fold_cosine(A: np.ndarray, B: np.ndarray, ia, ib) -> np.ndarray:
        # strict left fold over dim for dot and both norms — the
        # F.aggregate / list_dot_product summation order exactly
        dot = np.zeros(len(ia), dtype=np.float64)
        na = np.zeros(len(ia), dtype=np.float64)
        nb = np.zeros(len(ia), dtype=np.float64)
        for j in range(A.shape[1]):
            xa, xb = A[ia, j], B[ib, j]
            dot += xa * xb
            na += xa * xa
            nb += xb * xb
        with np.errstate(invalid="ignore", divide="ignore"):
            return dot / (np.sqrt(na) * np.sqrt(nb))

    def local_topk(sims: np.ndarray, valid: np.ndarray):
        # per-row cut = k-th largest valid sim minus the margin; rows
        # with fewer than k valid candidates keep everything
        masked = np.where(valid, sims, -np.inf)
        if masked.shape[1] >= k:
            kth = np.partition(masked, -k, axis=1)[:, -k]
        else:
            kth = np.full(masked.shape[0], -np.inf)
        cut = np.where(np.isfinite(kth), kth - cut_margin, -np.inf)
        return np.nonzero(valid & (sims >= cut[:, None]))

    def score(it):
        for pdf in it:
            for row in pdf.itertuples(index=False):
                ids_a = np.asarray(row.ids_a, dtype=np.int64)
                ids_b = np.asarray(row.ids_b, dtype=np.int64)
                A = np.array(
                    [np.asarray(v, dtype=np.float64) for v in row.vecs_a]
                )
                B = np.array(
                    [np.asarray(v, dtype=np.float64) for v in row.vecs_b]
                )
                with np.errstate(invalid="ignore", divide="ignore"):
                    An = A / np.linalg.norm(A, axis=1, keepdims=True)
                    Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
                    sims = An @ Bn.T
                valid = np.isfinite(sims) & (
                    ids_a[:, None] != ids_b[None, :]
                )
                # direction A -> B (sources in block a); empty frames
                # are skipped — mixed into the serializer's concat
                # they trip a pandas FutureWarning
                ia, ib = local_topk(sims, valid)
                if len(ia):
                    yield pd.DataFrame(
                        {
                            "src": ids_a[ia],
                            "nbr": ids_b[ib],
                            "sim": fold_cosine(A, B, ia, ib),
                        }
                    )
                if row.bid_a != row.bid_b:
                    # direction B -> A, served by the same task so each
                    # unordered block pair is shuffled exactly once
                    jb, ja = local_topk(sims.T, valid.T)
                    if not len(jb):
                        continue
                    yield pd.DataFrame(
                        {
                            "src": ids_b[jb],
                            "nbr": ids_a[ja],
                            "sim": fold_cosine(B, A, jb, ja),
                        }
                    )

    from pyspark.sql.window import Window

    cands = pairs.mapInPandas(score, schema="src long, nbr long, sim double")
    w = Window.partitionBy("src").orderBy(
        F.col("sim").desc(), F.col("nbr").asc()
    )
    return (
        cands.withColumn("sim", F.round("sim", decimals))
        .withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
        .select("src", "nbr", F.col("knn_rank").cast("int"), "sim")
    )


def ivf_topk(
    df: DataFrame,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_probe_bits: int | None = None,
    seed: int = 42,
    min_candidates_factor: int = 32,
) -> DataFrame:
    """IVF-flavored top-k: restrict the exact scan to LSH cells near the
    query's cell (multi-probe), then brute-force those.

    ``n_probe_bits=None`` (default) picks the probe radius ADAPTIVELY:
    cells are visited in Hamming-distance order from the query's cell
    until the probed cells hold ≥ ``min_candidates_factor × k``
    vectors — the standard IVF ``nprobe`` budget rule. The per-cell
    histogram is at most 2^n_planes rows (256 here), a driver-trivial
    aggregate even at 100 TB, and the exact scan still touches only the
    probed cells. Recall is a function of how angularly close true
    neighbors are: clustered (real-embedding) corpora concentrate
    neighbors in Hamming-0/1 cells (recall ≈ 1 with a narrow probe),
    while isotropic random vectors — the fixture's worst case — force
    the budget rule to widen the probe automatically instead of
    silently returning far-off results. Pass an explicit
    ``n_probe_bits`` to pin a fixed radius instead."""
    from itertools import combinations

    dim = len(query_vec)
    planes = hyperplanes(dim, n_planes, seed)
    qbits = [1 if float(np.dot(query_vec, p)) > 0 else 0 for p in planes]
    qbucket = sum(b << i for i, b in enumerate(qbits))
    bucketed = df.withColumn("__bucket", lsh_bucket(vec_col, planes))

    def cells_at(radius: int) -> list[int]:
        if radius == 0:
            return [qbucket]
        out = []
        for bits in combinations(range(n_planes), radius):
            flip = 0
            for i in bits:
                flip |= 1 << i
            out.append(qbucket ^ flip)
        return out

    if n_probe_bits is None:
        # tiny aggregate: one row per non-empty cell (≤ 2^n_planes)
        hist = {
            int(r["__bucket"]): int(r["n"])
            for r in bucketed.groupBy("__bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        budget = min_candidates_factor * k
        probes: list[int] = []
        got = 0
        for radius in range(n_planes + 1):
            for c in cells_at(radius):
                probes.append(c)
                got += hist.get(c, 0)
            if got >= budget:
                break
    else:
        probes = []
        for radius in range(n_probe_bits + 1):
            probes.extend(cells_at(radius))
    cell = bucketed.filter(F.col("__bucket").isin([int(p) for p in probes]))
    return topk_cosine(cell.drop("__bucket"), query_vec, k, id_col, vec_col)


def ivf_search_bucketed(
    bucketed: DataFrame,
    query_vec,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    min_candidates_factor: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
    hist: dict | None = None,
) -> DataFrame:
    """IVF search over a PRE-BUCKETED relation — the read side of a
    persisted index (q_ann_index_store): ``bucketed`` already carries
    ``cell_col`` = ``lsh_bucket(vec_col, hyperplanes(dim, n_planes,
    seed))``, typically read back from a cell-partitioned table, so
    probing filters to the probed cells and the storage layer prunes
    the untouched partitions' files.  Probe selection is ivf_topk's
    adaptive budget rule (visit cells in Hamming-distance order from
    the query's cell until they hold >= factor*k vectors, from a
    <= 2^n_planes-row histogram); the exact cosine re-rank runs only
    inside probed cells.  Same cells, same rule, same recall behavior
    as ivf_topk — the difference is WHERE the bucketing happened."""
    from itertools import combinations

    dim = len(query_vec)
    planes = hyperplanes(dim, n_planes, seed)
    qbits = [1 if float(np.dot(query_vec, p)) > 0 else 0 for p in planes]
    qbucket = sum(b << i for i, b in enumerate(qbits))

    def cells_at(radius: int) -> list[int]:
        if radius == 0:
            return [qbucket]
        out = []
        for bits in combinations(range(n_planes), radius):
            flip = 0
            for i in bits:
                flip |= 1 << i
            out.append(qbucket ^ flip)
        return out

    if hist is None:
        # fallback: one tiny distributed aggregate (<= 2^n_planes rows).
        # Callers holding a LakeTable-backed index pass
        # LakeTable.partition_histogram(cell_col) instead — the same
        # numbers from manifest metadata, zero Spark jobs.
        hist = {
            int(r[cell_col]): int(r["n"])
            for r in bucketed.groupBy(cell_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
    else:
        hist = {int(k): int(v) for k, v in hist.items()}
    budget = min_candidates_factor * k
    probes: list[int] = []
    got = 0
    for radius in range(n_planes + 1):
        for c in cells_at(radius):
            probes.append(c)
            got += hist.get(c, 0)
        if got >= budget:
            break
    cell = bucketed.filter(F.col(cell_col).isin([int(p) for p in probes]))
    return topk_cosine(cell.drop(cell_col), query_vec, k, id_col, vec_col)


# -- product quantization (IVF's memory-side sibling) ----------------------
def pq_train(
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    decimals: int = 6,
) -> list[list[list[float]]]:
    """Train product-quantization codebooks: split each d-dim vector
    into ``m`` subvectors of d/m dims and run Lloyd's k-means with
    ``k`` centroids INDEPENDENTLY per subspace — but jointly in the
    plan: one (subspace, cluster, pos) aggregate per round covers all
    m trainings (one tiny shuffle per round, never m).  Deterministic
    like kmeans_fit_assign: init from the k lowest-id vectors'
    subvectors, per-round means rounded to ``decimals``, fixed
    iteration count.

    Returns ``codebooks[s][j]`` = centroid j of subspace s.  The point
    at 100 TB is MEMORY, not speed: a 64-dim float32 vector is 256
    bytes; its PQ code is m bytes (32x at m=8), which is what lets an
    ANN index over billions of vectors stay in RAM — accuracy traded
    for it is measured in tests/test_ann_recall.py.

    TRAINING IS SAMPLE-BOUNDED (the FAISS-standard design): codebooks
    are fitted on a hash-ordered deterministic sample of up to
    ``sample_n`` vectors (see sample_training_vectors — xxhash64 draw,
    unbiased above the cap, the whole corpus below it), collected once
    and Lloyd-iterated DRIVER-SIDE in vectorized numpy.  Rationale at 100 TB: k*m
    centroids (128 here) saturate long before 10^5 training vectors,
    so training cost must be O(sample), independent of corpus size —
    only `pq_encode`, which is a single distributed projection pass,
    scales with the data.  The pre-r7 formulation ran each Lloyd round
    as a Spark job whose nearest-centroid expression inlined m*k*(d/m)
    literals; at bench scale that was ~9 s of pure codegen+scheduling
    overhead for 16k subvectors, and at 100 TB it would re-scan the
    full corpus once per Lloyd round for a codebook a bounded sample
    determines.  Numeric parity: for corpora <= sample_n the numpy
    path reproduces the old distributed semantics step for step —
    same lowest-k-distinct-id seeding with lexicographic duplicate
    tie-break, same sequential-fold squared-L2 (via seq_sq_dists'
    explicit dim-axis left fold — np.sum's pairwise reducer is NOT
    that fold even below 128 elements and can flip a near-tie
    argmin), same first-index argmin, same round(mean, decimals), same
    keep-old-centroid on empty clusters; the only change is that
    cluster-mean accumulation now runs in a DETERMINISTIC (id-sorted)
    order where the old shuffle's partial-agg order was not."""
    first = emb.select(F.size(vec_col)).first()
    if first is None:
        raise ValueError("pq_train: empty input")
    dim = int(first[0])
    if dim % m:
        raise ValueError(f"pq_train: dim {dim} not divisible by m={m}")
    sub = dim // m
    # sample/collect stage shared with kmeans_fit_assign (see
    # sample_training_vectors: hash-ordered unbiased draw above the
    # cap, behavior-neutral below it, lockstep by construction)
    from .clustering import sample_training_vectors

    vec_ids, X, _ = sample_training_vectors(emb, id_col, vec_col)
    if not len(vec_ids):
        raise ValueError("pq_train: empty input")
    seed_ids = list(dict.fromkeys(vec_ids))[:k]
    if len(seed_ids) < k:
        raise ValueError(
            f"pq_train: need >= {k} distinct-id vectors to seed "
            f"codebooks, got {len(seed_ids)}"
        )
    # seed row indices per id: ALL of a duplicated id's rows, because
    # the seed for (id, subspace) is that id's lexicographically
    # smallest SUBVECTOR — chosen independently PER SUBSPACE, possibly
    # from different rows (the old distributed loop's
    # orderBy(vec_id, s, sv) + first-seen semantics; a whole-vector
    # minimum sliced per subspace is NOT the same once ids duplicate)
    rows_of: dict[int, list[int]] = {}
    for i, vid in enumerate(vec_ids):
        if vid in seed_ids:
            rows_of.setdefault(vid, []).append(i)
    books: list[list[list[float]]] = []
    for s in range(m):
        Xs = X[:, s * sub : (s + 1) * sub]  # (n, sub) view
        C = np.array(
            [
                [
                    round(float(x), decimals)
                    for x in min(
                        (tuple(Xs[i]) for i in rows_of[vid])
                    )
                ]
                for vid in seed_ids
            ]
        )  # (k, sub)
        for _ in range(iters):
            # strict dim-axis left fold (seq_sq_dists), matching the
            # old F.aggregate accumulation exactly — np.sum's pairwise
            # reducer does not, even under 128 elements
            d2 = seq_sq_dists(Xs, C)
            assign = np.argmin(d2, axis=1)  # first-index min, like
            # array_position(array_min) in the distributed loop
            for j in range(k):
                members = Xs[assign == j]
                if len(members):
                    C[j] = [
                        round(float(t) / len(members), decimals)
                        for t in members.sum(axis=0)
                    ]
                # else: empty cluster keeps its previous centroid
        books.append([[float(x) for x in c] for c in C])
    return books


def pq_encode(
    emb: DataFrame,
    books: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode each vector to its m nearest-subcentroid indexes — a
    single Arrow-batched pandas_udf pass under closure-captured
    codebooks (codes fit a byte each at k<=256; stored as int array
    for arithmetic friendliness).

    Vectorized-numpy rather than built-in column functions, an
    explicit exception to the stay-JVM-side default: the nearest-
    subcentroid map needs m*k squared-L2 reductions PER ROW, and the
    pre-r7 expression formulation (m*k nested aggregate/zip_with
    higher-order functions, ~1 k literals) cost seconds of analysis +
    codegen before the first row moved and evaluated HOF-interpreted.
    One (batch, dim) x (k, d/m) numpy broadcast per subspace is the
    memory-bandwidth-bound form of the same arithmetic; the encode
    pass stays a partition-local projection (no shuffle), which is
    what matters at corpus scale.  Numeric parity with the old
    expression: distances use seq_sq_dists' explicit dim-axis left
    fold (bit-for-bit F.aggregate's sequence — np.sum's pairwise
    reducer is not), and argmin takes the first minimum like
    array_position(array_min)."""
    m = len(books)
    sub = len(books[0][0])
    cents = [np.array(bk, dtype=np.float64) for bk in books]

    @F.pandas_udf("array<int>")
    def _encode(vs: pd.Series) -> pd.Series:
        # NULL embeddings propagate as NULL codes (the old expression
        # formulation's behavior); np.array over a batch containing
        # None would otherwise build an object/ragged array and crash
        vals = vs.tolist()
        present = [i for i, v in enumerate(vals) if v is not None]
        out_all: list = [None] * len(vals)
        if present:
            X = np.array([vals[i] for i in present], dtype=np.float64)
            out = np.empty((len(X), m), dtype=np.int32)
            for s in range(m):
                Xs = X[:, s * sub : (s + 1) * sub]
                d2 = seq_sq_dists(Xs, cents[s])
                out[:, s] = np.argmin(d2, axis=1)
            for j, i in enumerate(present):
                out_all[i] = out[j].tolist()
        return pd.Series(out_all)

    return emb.select(
        F.col(id_col).alias("vec_id"),
        _encode(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("codes"),
    )


def pq_topk(
    codes: DataFrame,
    books: list[list[list[float]]],
    query_vec,
    k: int = 10,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: the query's
    distance table T[s][j] = ||q_s - c_sj||^2 is computed ONCE on the
    driver (m*k floats) and broadcast as a literal; each row's
    approximate distance is m table lookups summed — no float vectors
    are read at query time, which is the whole point of the
    compressed index.  TakeOrderedAndProject keeps the top-k without a
    global sort; (dist, vec_id) ordering makes ties deterministic."""
    m = len(books)
    sub = len(books[0][0])
    q = [float(x) for x in query_vec]
    table = [
        [
            sum((q[s * sub + i] - c[i]) ** 2 for i in range(sub))
            for c in books[s]
        ]
        for s in range(m)
    ]
    t_lit = F.array(
        *[F.array(*[F.lit(round(x, 9)) for x in row]) for row in table]
    )
    adist = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda code, s: F.element_at(
                F.element_at(t_lit, s + 1), code + 1
            ),
        ),
        F.lit(0.0).cast("double"),
        lambda acc, z: acc + z,
    )
    return (
        codes.select("vec_id", F.round(adist, 6).alias("approx_dist"))
        # NULL codes (pq_encode propagates NULL embeddings) give NULL
        # approx_dist, and ascending sort is NULLS FIRST — such rows
        # have no defined distance and must not fill the top-k
        .filter(F.col("approx_dist").isNotNull())
        .orderBy("approx_dist", "vec_id")
        .limit(k)
    )


def pq_search(
    codes: DataFrame,
    emb: DataFrame,
    books: list[list[list[float]]],
    query_vec,
    k: int = 10,
    shortlist: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ shortlist + exact re-rank — the production ANN read path:
    ADC over the compressed codes selects a ``shortlist`` (default
    10k) of candidates WITHOUT touching float vectors, then only those
    rows hydrate their true embeddings (a semi-join against the
    shortlist ids, broadcast-sized by construction) for an exact
    squared-L2 re-rank.  Quantization error then only costs recall if
    a true neighbor falls outside the 10x shortlist, which
    tests/test_ann_recall.py bounds; the full-precision store is read
    for ~10k rows instead of the corpus."""
    shortlist = shortlist or 10 * k
    cand = pq_topk(codes, books, query_vec, k=shortlist).select("vec_id")
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    d = F.aggregate(
        F.zip_with(
            F.transform(F.col(vec_col), lambda x: x.cast("double")),
            q,
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0).cast("double"),
        lambda acc, z: acc + z,
    )
    return (
        emb.withColumnRenamed(id_col, "vec_id")
        .join(F.broadcast(cand), "vec_id")
        .select("vec_id", F.round(d, 6).alias("dist"))
        .filter(F.col("dist").isNotNull())  # see pq_topk: NULLS FIRST
        .orderBy("dist", "vec_id")
        .limit(k)
    )
