"""Unit tests for the k-means primitive (functions/clustering.py) —
the cross-engine trajectory check lives in test_oracle.py."""

from __future__ import annotations

from collections import Counter

from lab5_lakehouse_etl_spark.functions import clustering as KM
from lab5_lakehouse_etl_spark.session import load_table
from tests.conftest import SF_DIR


def test_kmeans_partitions_all_vectors(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    n = emb.count()
    out = KM.kmeans_fit_assign(emb, k=8, iters=3).collect()
    assert len(out) == n
    assert {r["vec_id"] for r in out} == set(range(n))
    sizes = Counter(r["cluster"] for r in out)
    assert set(sizes) <= set(range(8))
    # The fixture embeddings are spread out; a degenerate single-cluster
    # solution would mean the update step is broken.
    assert len(sizes) >= 2


def test_kmeans_deterministic_across_runs(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    a = sorted(
        (r["vec_id"], r["cluster"])
        for r in KM.kmeans_fit_assign(emb, k=4, iters=2).collect()
    )
    b = sorted(
        (r["vec_id"], r["cluster"])
        for r in KM.kmeans_fit_assign(emb, k=4, iters=2).collect()
    )
    assert a == b


def test_kmeans_inertia_not_increasing(spark):
    """One extra Lloyd's round never increases total within-cluster
    distance (monotone convergence property of the algorithm)."""
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_DIR, "embeddings")

    def inertia(iters: int) -> float:
        assigned = KM.kmeans_fit_assign(emb, k=8, iters=iters)
        # Recompute distance to the assigned centroid via a self-agg:
        # mean vector per cluster == centroid after the final update, so
        # within-cluster variance is a faithful inertia proxy.
        base = emb.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        ).join(assigned, "vec_id")
        per_dim = base.select(
            "cluster", F.posexplode("v").alias("pos", "val")
        )
        stats = per_dim.groupBy("cluster", "pos").agg(
            (F.avg(F.col("val") * F.col("val")) - F.avg("val") * F.avg("val")).alias("var")
        )
        row = stats.agg(F.sum("var").alias("s")).first()
        return float(row["s"])

    assert inertia(4) <= inertia(1) + 1e-9


def test_seq_sq_dists_is_strict_left_fold():
    """seq_sq_dists must reproduce the scalar left-to-right fold
    bit-for-bit (that is its entire contract — F.aggregate / DuckDB
    list_sum parity); np.sum's pairwise 8-way-unrolled reducer does
    NOT, which is why the helper exists (round-7 advice, clustering.py)."""
    import numpy as np

    rng = np.random.RandomState(42)
    X = rng.standard_normal((64, 64))
    C = rng.standard_normal((8, 64))
    seq = KM.seq_sq_dists(X, C)
    ref = np.empty_like(seq)
    for i in range(X.shape[0]):
        for k in range(C.shape[0]):
            acc = 0.0
            for j in range(X.shape[1]):
                d = X[i, j] - C[k, j]
                acc = acc + d * d
            ref[i, k] = acc
    assert np.array_equal(seq, ref)
    # and the hazard is real: numpy's reducer disagrees with the fold
    # in the last ulp on most elements of this seed
    pw = np.sum((X[:, None, :] - C[None, :, :]) ** 2, axis=2)
    assert not np.array_equal(pw, ref)


def _kmeans_fixture_ddb(pdf):
    import duckdb

    con = duckdb.connect()
    con.register("emb_src", pdf)
    con.execute("CREATE VIEW embeddings AS SELECT * FROM emb_src")
    return con


def test_kmeans_cte_duplicate_id_rounding_collision(spark):
    """Duplicate-id seed rows whose vectors collide in the leading
    element AFTER rounding (0.1234561 vs 0.1234564 -> both 0.123456)
    but diverge hard in the second element: the SQL seed window must
    tie-break on the RAW vector (ORDER BY v) exactly like the Python
    path's orderBy(vec_id, v), or the two engines seed different
    centroids and the trajectories diverge (round-7 verdict item 1)."""
    import pandas as pd

    from tests.conftest import compare_with_oracle

    rows = [
        (0, [0.1234561, 9.0, 0.0, 0.0]),   # raw lexi-min -> the seed
        (0, [0.1234564, -9.0, 0.0, 0.0]),  # rounded-collision twin
        (1, [5.0, 5.0, 5.0, 5.0]),
        (2, [0.2, 8.8, 0.1, 0.0]),
        (3, [5.1, 4.9, 5.0, 5.2]),
        (4, [0.15, -8.7, 0.05, 0.0]),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    pdf = pd.DataFrame(
        {"vec_id": [r[0] for r in rows], "embedding": [r[1] for r in rows]}
    )
    con = _kmeans_fixture_ddb(pdf)
    try:
        out = KM.kmeans_fit_assign(emb, k=2, iters=2, vec_col="embedding")
        compare_with_oracle(
            out, con, KM.kmeans_oracle_sql(k=2, iters=2, dim=4)
        )
    finally:
        con.close()


def test_kmeans_cte_collision_property(spark):
    """Hypothesis form of the rounding-collision pin: random small
    corpora where every duplicated id carries vectors that collide
    after rounding yet differ raw; Spark trajectory must equal the
    DuckDB CTE on each draw."""
    import pandas as pd
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from tests.conftest import compare_with_oracle

    # grid coordinates keep the draw small; the 1e-7-scale epsilon on
    # duplicated ids collides at decimals=6 while staying raw-distinct
    coords = st.integers(-5, 5)
    vecs = st.lists(
        st.tuples(coords, coords, coords, coords), min_size=3, max_size=8
    )

    @given(data=vecs, dup_eps=st.sampled_from([1, 2, 4]))
    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def run(data, dup_eps):
        rows = []
        for i, v in enumerate(data):
            base = [float(x) for x in v]
            rows.append((i, base))
            if i % 2 == 0:  # plant a colliding duplicate for even ids
                twin = list(base)
                twin[0] += dup_eps * 1e-7   # rounds away at 6 decimals
                twin[1] -= 3.0              # raw-order discriminator
                rows.append((i, twin))
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        pdf = pd.DataFrame(
            {
                "vec_id": [r[0] for r in rows],
                "embedding": [r[1] for r in rows],
            }
        )
        con = _kmeans_fixture_ddb(pdf)
        try:
            out = KM.kmeans_fit_assign(
                emb, k=2, iters=2, vec_col="embedding"
            )
            compare_with_oracle(
                out, con, KM.kmeans_oracle_sql(k=2, iters=2, dim=4)
            )
        finally:
            con.close()

    run()


def test_fixture_vec_ids_unique(spark):
    """The kmeans-family queries pass dedup_ids=False (zero-shuffle
    final assignment) on the declared precondition that the embeddings
    table is a keyed store — pin it, so a future fixture with
    duplicated vec_ids fails HERE with the real reason instead of as
    an oracle hash mismatch."""
    emb = load_table(spark, SF_DIR, "embeddings")
    assert emb.count() == emb.select("vec_id").distinct().count()
