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
