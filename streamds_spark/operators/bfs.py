"""Distributed BFS: minimum hop distances from a source set over an
undirected simple graph — the frontier-expansion pattern (Pregel/GraphX's
shortest-path primitive) as plain DataFrame ops, completing the iterative-
graph family next to the peel loop (kcore), the H-index decomposition, the
fixed-point PageRank, and the fixpoint connected components.

Each round is one equi-join of the CURRENT FRONTIER against the adjacency
plus an anti-join against the visited set — the frontier is the only
relation that moves, and it only ever shrinks after the expansion wave
passes its peak, so per-round cost tracks the wave, not the graph. Rounds
are bounded by the graph's eccentricity from the sources (the diameter in
the worst case), NOT its size; `max_iter` guards pathological chains and
the function raises rather than return a partial traversal. Lineage is
truncated per round (localCheckpoint) — without it the plan doubles per
hop. Distances are small integers, so the whole traversal is hash-exact
against a DuckDB recursive-CTE replay of the same wave (see
queries/graph.py copurchase_hops_from_hub).

At cluster scale the adjacency is the big relation: it shuffles on the
join key once per round, frontier-sized probes ride it, and nothing is
ever broadcast by hint (AQE is free to broadcast a genuinely small
frontier at runtime — the same discipline as the size-gated peel join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hop_distances(
    edges: DataFrame, sources: DataFrame, max_iter: int = 50
) -> DataFrame:
    """DataFrame[node, dist: bigint] — minimum hop count from any node in
    `sources(node)` over `edges(u, v)`. Unreached nodes are absent."""
    adj = edges.select("u", "v").unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    adj = adj.localCheckpoint(eager=True)
    frontier = sources.select("node").distinct().localCheckpoint(eager=True)
    dist = frontier.withColumn("dist", F.lit(0).cast("bigint"))
    for d in range(1, max_iter + 1):
        nxt = (
            adj.join(frontier, adj.u == frontier.node)
            .select(F.col("v").alias("node"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            return dist
        dist = dist.unionByName(
            nxt.withColumn("dist", F.lit(d).cast("bigint"))
        ).localCheckpoint(eager=True)
        frontier = nxt
    raise RuntimeError(f"BFS did not exhaust the reachable set in {max_iter} hops")
