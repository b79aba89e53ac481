"""Distributed connected components over DataFrames.

The missing step between near-duplicate PAIR detection (minhash/
simhash/ngram candidates — functions/dedup.py) and actual corpus
deduplication: pairs are not transitive, so "keep one doc per
duplicate-relation" needs the connected components of the pair graph,
with the minimum doc_id as the canonical survivor.

Spark-first design: min-label propagation expressed as a loop of
join + groupBy/min (the GraphX/GraphFrames algorithm without either
dependency — no RDDs, no custom partitioner). Each iteration is one
hash shuffle on the node key; `localCheckpoint` truncates the lineage
so iteration N's plan doesn't replay iterations 1..N-1 (the classic
iterative-Spark failure mode). Converges in O(max component diameter)
iterations; duplicate clusters in real corpora are shallow (diameter
≲ 10 even at billion-doc scale), and every iteration's shuffle is
O(edges), never O(nodes²).

No counterpart in the reference (its dedup is single-table exact:
jobs/order_items_glue_job.py:160-162); this is north-star surface per
BASELINE.json's LLM-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """Label every node with the smallest node id reachable from it.

    ``nodes``: one column ``node_col``; ``edges``: ``src_col``/
    ``dst_col``, must contain BOTH directions of each undirected edge
    (callers build symmetric pairs). Returns (node, component).

    Each round does edge min-propagation PLUS pointer jumping
    (``component <- label(component)`` — path doubling): plain label
    propagation moves the minimum one hop per round, so a
    diameter-``d`` graph costs d shuffle rounds (the r6 dup-cluster
    graph chains length bands into d≈25 and q_dedup_clusters paid ~20
    rounds); the jump halves the remaining label distance every round,
    giving O(log d) rounds for one extra O(V) join per round —
    Kiveris et al.'s "Connected Components in MapReduce" two-phase
    idea collapsed into the same loop.  Labels stay node ids from the
    node's own component and only decrease, so correctness and the
    convergence witness are unchanged.

    Early-exits when an iteration changes no label (monotone decreasing
    integer labels ⇒ the sum is a convergence witness costing one tiny
    agg per round, not a full dataframe compare).

    Per-round materialization is a LAZY ``localCheckpoint`` whose
    first action IS the witness agg: the eager form ran two full
    passes over the label relation per round (one to write the
    checkpoint, one to sum it) — the lazy form computes, persists and
    sums in a single job, halving per-round label passes at any scale
    while keeping the lineage truncation that stops the
    self-referencing round plan from doubling per iteration.
    """
    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("component")
    ).localCheckpoint(eager=False)
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]
    edges = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iter):
        msgs = edges.join(
            labels, edges.src == labels.node, "inner"
        ).select(F.col("dst").alias("node"), "component")
        stepped = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # pointer jump: adopt the component's OWN current label when
        # smaller (component values are node ids, so the join always
        # finds a row; left+coalesce guards isolated self-labels)
        jump = stepped.select(
            F.col("node").alias("j_node"), F.col("component").alias("j_comp")
        )
        labels = (
            stepped.join(
                jump, stepped.component == jump.j_node, "left"
            )
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("j_comp"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=False)
        )
        cur_sum = labels.agg(F.sum("component")).collect()[0][0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # silent partial convergence would hand callers WRONG components;
        # label propagation needs O(graph diameter) rounds, so a deep
        # path graph must raise, not degrade.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "iterations (graph diameter exceeds max_iter); raise max_iter"
        )
    return labels


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Power-iteration PageRank with a FIXED iteration count.

    ``nodes``: one column ``node_col`` (every vertex, including
    isolated ones); ``edges``: directed ``src_col``/``dst_col``.
    Returns (node, rank) after exactly ``n_iter`` iterations from the
    uniform start 1/N. Dangling-node mass is NOT redistributed (the
    "leak" variant) — with a fixed iteration count that choice is
    deterministic and SQL-stateable, which is what lets an external
    oracle pin the result; swap in a dangling-mass term when rank mass
    conservation matters more than verifiability.

    Scale shape, same discipline as :func:`connected_components`: the
    out-degree relation is computed once and joined into the edge list
    up front; each iteration is one edge join + one groupBy(sum) —
    O(edges) shuffle — ending in ``localCheckpoint`` so iteration N's
    plan doesn't replay iterations 1..N-1. 5 iterations over a 100 TB
    edge list is 5 bounded shuffles, never a growing lineage.
    """
    n = nodes.count()
    v = nodes.select(F.col(node_col).alias("node"))
    out_deg = edges.groupBy(F.col(src_col).alias("src")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .join(out_deg, "src")
        .localCheckpoint(eager=True)
    )
    teleport = (1.0 - damping) / n
    ranks = v.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(n_iter):
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("s"))
        )
        ranks = (
            v.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def oriented_edges(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Orient each undirected edge from its lower-(degree, id) endpoint
    to its higher one — the skew-proof total order for triangle
    enumeration.  ``edges`` holds one row per undirected edge (any
    endpoint order, no duplicates).  Returns (x, y, rx, ry): edge
    x → y with the (deg, id) rank structs of both endpoints, x ≺ y.

    Why degree order: wedges are built at each edge SOURCE, so a
    vertex's wedge count is C(out-degree, 2).  Under id orientation a
    hub with degree d and a small id keeps out-degree d → O(d²) wedge
    rows land on ONE reducer key (fatal at 100 TB where hubs are
    power-law).  Degree orientation caps every out-degree at O(√m)
    (a vertex preceding k neighbors in (deg, id) order has degree ≥
    each of theirs, and Σdeg = 2m), so total wedges are O(m^1.5) with
    no quadratic key — the standard bound.  The generated TRIANGLE set
    is identical under any total order; only wedge-intermediate
    volume changes."""
    und = edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    e = und.join(
        deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), "u"
    ).join(
        deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v"
    )
    ru = F.struct(F.col("du").alias("d"), F.col("u").alias("n"))
    rv = F.struct(F.col("dv").alias("d"), F.col("v").alias("n"))
    u_first = ru < rv
    return e.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("x"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("y"),
        F.when(u_first, ru).otherwise(rv).alias("rx"),
        F.when(u_first, rv).otherwise(ru).alias("ry"),
    )


def triangle_counts(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    materialize: bool = True,
) -> DataFrame:
    """Per-node triangle counts via the degree-oriented wedge algorithm
    (MapReduce triangle counting with the low-degree-first refinement).

    Each triangle {a, b, c} with a ≺ b ≺ c under the (deg, id) order
    is generated exactly once: a wedge (a→b, a→c) at its lowest-order
    corner, closed by the oriented edge b→c.  Two shuffle joins, both
    O(m^1.5)-bounded regardless of degree skew (see
    :func:`oriented_edges` — the property that keeps one web-scale hub
    from melting a single reducer).  Returns (node, n_triangles) for
    nodes in ≥1 triangle."""
    # checkpointed: three consumers (both wedge arms + the closing
    # join) would otherwise each replay the caller's edge-building
    # subtree AND the degree join — for q_triangle_count that subtree
    # is itself a join, measured ~2x query time un-checkpointed.
    # ``materialize=False`` keeps the full lineage visible for plan
    # assertions (tests/test_plans.py scan-schema checks).
    o = oriented_edges(edges, src_col, dst_col)
    if materialize:
        o = o.localCheckpoint(eager=True)
    w1 = o.select("x", F.col("y").alias("b"), F.col("ry").alias("rb"))
    w2 = o.select("x", F.col("y").alias("c"), F.col("ry").alias("rc"))
    wedges = w1.join(w2, "x").filter(F.col("rb") < F.col("rc"))
    closer = o.select(F.col("x").alias("b"), F.col("y").alias("c"))
    tri = wedges.join(closer, ["b", "c"]).select("x", "b", "c")
    corners = tri.select(F.explode(F.array("x", "b", "c")).alias("node"))
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )


def k_core(
    edges: DataFrame,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    rounds: int = 5,
) -> DataFrame:
    """k-core peeling with a FIXED round count: repeatedly drop nodes
    of degree < k (and their edges) for exactly ``rounds`` rounds,
    then return each surviving node with its residual degree.

    The node universe is IMPLIED by the edge list — isolated nodes
    (degree 0 < k) can never survive a peel, so no node relation is
    taken. ``edges`` must contain BOTH directions of each undirected
    edge (same contract as :func:`connected_components`). The exact k-core
    is the fixpoint; a fixed round count makes the operator
    deterministic AND SQL-stateable (each peel round unrolls to one
    CTE stage — same verifiability trade as :func:`pagerank`), and in
    practice peeling converges in a handful of rounds on similarity
    graphs because dedup families are shallow. Callers needing the
    certified fixpoint re-run with more rounds and compare (monotone:
    the surviving set only shrinks, so equality between round counts
    proves convergence).

    Scale shape: each round is one degree aggregation (O(edges)
    partial-combining shuffle) + two semi-joins filtering the edge
    list, ending in ``localCheckpoint`` to truncate lineage. Never
    materializes anything node-quadratic.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        alive = deg.filter(F.col("deg") >= k).select("src")
        e = (
            e.join(alive, "src", "left_semi")
            .join(alive.select(F.col("src").alias("dst")), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
    return (
        e.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("degree"))
        .filter(F.col("degree") >= k)
    )
