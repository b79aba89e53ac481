"""connected_components unit tests: chains merge transitively,
disconnected parts stay separate, singletons self-label, and the
iteration cap is respected."""

from __future__ import annotations

from lab5_lakehouse_etl_spark.functions.graph import connected_components


def _cc(spark, n_nodes, pairs, **kw):
    nodes = spark.createDataFrame([(i,) for i in n_nodes], "node BIGINT")
    sym = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    edges = spark.createDataFrame(sym or [(None, None)], "src BIGINT, dst BIGINT")
    if not sym:
        edges = edges.filter("src IS NOT NULL")
    out = connected_components(nodes, edges, **kw)
    return {r.node: r.component for r in out.collect()}


def test_chain_merges_to_min(spark):
    # 1-2-3-4-5 chain: propagation needs diameter iterations
    got = _cc(spark, range(1, 6), [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {i: 1 for i in range(1, 6)}


def test_two_components_and_singleton(spark):
    got = _cc(spark, range(1, 8), [(1, 2), (2, 3), (5, 6)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7}


def test_no_edges_all_singletons(spark):
    got = _cc(spark, range(3), [])
    assert got == {0: 0, 1: 1, 2: 2}


def test_max_iter_exhaustion_raises(spark):
    # a long chain with max_iter=1 can't converge — silent partial
    # labels would be wrong components, so it must raise
    import pytest

    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, range(8), [(i, i + 1) for i in range(7)], max_iter=1)
    got_full = _cc(spark, range(8), [(i, i + 1) for i in range(7)])
    assert set(got_full.values()) == {0}


def _pr(spark, nodes, edges, **kw):
    from lab5_lakehouse_etl_spark.functions.graph import pagerank

    n = spark.createDataFrame([(x,) for x in nodes], "node bigint")
    e = spark.createDataFrame(
        [(s, d) for s, d in edges] or [(None, None)], "src bigint, dst bigint"
    ).filter("src IS NOT NULL")
    return {
        r["node"]: r["rank"] for r in pagerank(n, e, **kw).collect()
    }


def test_pagerank_matches_numpy_power_iteration(spark):
    # directed triangle + a dangler pointing in; verify against the
    # same leak-variant recurrence computed in plain python
    nodes = [0, 1, 2, 3]
    edges = [(0, 1), (1, 2), (2, 0), (3, 0)]
    got = _pr(spark, nodes, edges, n_iter=5, damping=0.85)

    ranks = {v: 0.25 for v in nodes}
    deg = {0: 1, 1: 1, 2: 1, 3: 1}
    for _ in range(5):
        contrib = {v: 0.0 for v in nodes}
        for s, d in edges:
            contrib[d] += ranks[s] / deg[s]
        ranks = {v: 0.15 / 4 + 0.85 * contrib[v] for v in nodes}
    for v in nodes:
        assert abs(got[v] - ranks[v]) < 1e-12, (v, got[v], ranks[v])


def test_pagerank_isolated_node_gets_teleport_only(spark):
    got = _pr(spark, [0, 1, 2], [(0, 1), (1, 0)], n_iter=3)
    # node 2 has no in-edges: rank = teleport mass only
    assert abs(got[2] - 0.15 / 3) < 1e-12


def _tri_counts(spark, pairs):
    from lab5_lakehouse_etl_spark.functions.graph import triangle_counts

    edges = spark.createDataFrame(pairs, "src BIGINT, dst BIGINT")
    return {r.node: r.n_triangles for r in triangle_counts(edges).collect()}


def test_triangle_counts_clique_path_star(spark):
    # K4: every node is in C(3,2)=3 triangles
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert _tri_counts(spark, k4) == {0: 3, 1: 3, 2: 3, 3: 3}
    # path 0-1-2-3: no triangles
    assert _tri_counts(spark, [(0, 1), (1, 2), (2, 3)]) == {}
    # star + one closing edge: exactly one triangle (hub, 1, 2)
    star = [(0, i) for i in range(1, 6)] + [(1, 2)]
    assert _tri_counts(spark, star) == {0: 1, 1: 1, 2: 1}


def test_triangle_orientation_is_degree_not_id(spark):
    """The wedge stage must orient low-(degree, id) first: on a star
    whose HUB has the smallest id, id orientation would build all
    C(d, 2) wedges at the hub, degree orientation builds none (every
    leaf has out-degree 1).  Pinned by counting the wedge relation
    directly — the skew property that keeps one 100 TB hub off a
    single reducer."""
    from pyspark.sql import functions as F

    from lab5_lakehouse_etl_spark.functions.graph import oriented_edges

    hub = 0  # smallest id AND highest degree: adversarial for id order
    edges = spark.createDataFrame(
        [(hub, i) for i in range(1, 30)], "src BIGINT, dst BIGINT"
    )
    o = oriented_edges(edges)
    # all edges point INTO the hub
    assert o.filter(F.col("x") == hub).count() == 0
    w1 = o.select("x", F.col("y").alias("b"), F.col("ry").alias("rb"))
    w2 = o.select("x", F.col("y").alias("c"), F.col("ry").alias("rc"))
    wedges = w1.join(w2, "x").filter(F.col("rb") < F.col("rc"))
    assert wedges.count() == 0  # id orientation would give C(29,2)=406


def test_island_plan_matches_generic_cc_on_band_graph(spark):
    """q_dedup_clusters' interval-island reduction must equal generic
    label-propagation components on the very relation it specializes:
    same (lang, source) AND |delta n_chars| <= 20 over sf0.001
    documents (the pin that keeps the one-window plan honest if the
    band predicate ever changes shape)."""
    from pyspark.sql import functions as F

    from lab5_lakehouse_etl_spark.queries.dedup_ops import q_dedup_clusters
    from lab5_lakehouse_etl_spark.session import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    a = docs.select(
        F.col("doc_id").alias("src"), "lang", "source",
        F.col("n_chars").alias("na"),
    )
    b = docs.select(
        F.col("doc_id").alias("dst"), F.col("lang").alias("lang_b"),
        F.col("source").alias("source_b"), F.col("n_chars").alias("nb"),
    )
    edges = a.join(
        b,
        (a.lang == b.lang_b)
        & (a.source == b.source_b)
        & (F.abs(F.col("na") - F.col("nb")) <= 20)
        & (F.col("src") != F.col("dst")),
    ).select("src", "dst")
    generic = {
        r.node: r.component
        for r in connected_components(
            docs.select("doc_id"), edges, node_col="doc_id"
        ).collect()
    }
    island = {
        r.doc_id: r.component
        for r in q_dedup_clusters(spark, SF_DIR).collect()
    }
    assert island == generic
