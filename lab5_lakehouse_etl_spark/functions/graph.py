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

    Early-exits when an iteration changes no label (monotone decreasing
    integer labels ⇒ the sum is a convergence witness costing one tiny
    agg per round, not a full dataframe compare).
    """
    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("component")
    ).localCheckpoint(eager=True)
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]
    edges = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iter):
        msgs = edges.join(
            labels, edges.src == labels.node, "inner"
        ).select(F.col("dst").alias("node"), "component")
        labels = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
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
