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
