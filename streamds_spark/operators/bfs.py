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

from streamds_spark.operators.iterate import lineage_cut, lineage_cut_eager


def hop_distances(
    edges: DataFrame, sources: DataFrame, max_iter: int = 50
) -> DataFrame:
    """DataFrame[node, dist: bigint] — minimum hop count from any node in
    `sources(node)` over `edges(u, v)`. Unreached nodes are absent."""
    adj = edges.select("u", "v").unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    adj = adj.transform(lineage_cut_eager)
    frontier = sources.select("node").distinct().transform(lineage_cut_eager)
    dist = frontier.withColumn("dist", F.lit(0).cast("bigint"))
    for d in range(1, max_iter + 1):
        nxt = (
            adj.join(frontier, adj.u == frontier.node)
            .select(F.col("v").alias("node"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .transform(lineage_cut_eager)
        )
        if nxt.isEmpty():
            return dist
        # LAZY union checkpoint: the visited table is consumed inside the
        # NEXT hop's eager frontier job (or the caller's terminal action), so
        # the copy folds into that job — one driver job per hop, not two
        # (guide §1.3; the eager nxt checkpoint stays: isEmpty() is the exit)
        dist = dist.unionByName(
            nxt.withColumn("dist", F.lit(d).cast("bigint"))
        ).transform(lineage_cut)
        frontier = nxt
    raise RuntimeError(f"BFS did not exhaust the reachable set in {max_iter} hops")


def weighted_distances(
    edges: DataFrame, sources: DataFrame, max_iter: int = 100
) -> DataFrame:
    """DataFrame[node, dist: bigint] — minimum path COST from any node in
    `sources(node)` over the undirected weighted graph `edges(u, v, w)`
    (positive integer weights). Unreached nodes are absent.

    Frontier Bellman-Ford (min-plus relaxation): each round relaxes only
    edges leaving nodes whose distance IMPROVED last round — the weighted
    generalization of the BFS wave above (hop_distances is this operator
    with w = 1, where an improvement can never revisit a settled node).
    With positive integer weights every improvement strictly lowers a
    bounded integer, so the fixpoint is reached in at most
    (max path cost / min weight) rounds and equals the true single-source
    distances; integer costs keep the whole census hash-exact against a
    DuckDB recursive-CTE replay of the dense relaxation (same fixpoint,
    per-round states may differ — only the fixpoint is compared).

    Scale shape: per round one adjacency equi-join PROBED BY THE FRONTIER
    (the only relation that moves; it tracks the relaxation wave, not the
    graph), a groupBy-min over candidate updates, and one carry-forward
    left join against the n-row distance table. Nothing broadcasts by hint
    (AQE may broadcast a genuinely small frontier at runtime); lineage is
    truncated per round, with `improved` STATS-PINNED: `improved` and
    `dist` each descend with the other through outer joins, so Catalyst's
    product-of-children size estimates would otherwise double their BigInt
    bit length per round and stall the driver in BigInteger.multiply on
    relaxation chains past ~20 rounds. Pinning `improved` to exact
    (small-constant) stats breaks the product chain — `dist`'s snapshot
    then grows a constant number of bits per round (linear), so its own
    truncation is a plain lazy checkpoint whose copy folds into the next
    round's pin job: one driver job per round (see operators/iterate.py;
    hop_distances above is join-against-fixed + union only, which grows
    linearly and needs no pin at all)."""
    from streamds_spark.operators.iterate import StatsPinnedCheckpointer
    adj = edges.select(
        "u", "v", F.col("w").cast("bigint").alias("w")
    ).unionAll(
        edges.select(
            F.col("v").alias("u"),
            F.col("u").alias("v"),
            F.col("w").cast("bigint").alias("w"),
        )
    )
    adj = adj.transform(lineage_cut_eager)
    dist = (
        sources.select("node")
        .distinct()
        .withColumn("dist", F.lit(0).cast("bigint"))
        .transform(lineage_cut_eager)
    )
    frontier = dist
    pin = StatsPinnedCheckpointer(lag=4)
    for _ in range(max_iter):
        cand = (
            adj.join(frontier, adj.u == frontier.node)
            .select(F.col("v").alias("node"), (F.col("dist") + F.col("w")).alias("nd"))
            .groupBy("node")
            .agg(F.min("nd").alias("nd"))
        )
        improved = pin.checkpoint(
            cand.join(dist.withColumnRenamed("node", "dn"), cand.node == F.col("dn"), "left")
            .where(F.col("dist").isNull() | (F.col("nd") < F.col("dist")))
            .select("node", F.col("nd").cast("bigint").alias("dist"))
        )
        # the pin's own materialization count answers the fixpoint test —
        # no separate isEmpty job (guide §1.3)
        if pin.last_count == 0:
            pin.release()
            return dist
        # dist needs only a LAZY unpinned truncation: with `improved` pinned
        # to exact (small-constant) stats each round, the carry's snapshot
        # grows a constant number of bits per round — linear, not the
        # doubling case (iterate.py) that needs the pin on BOTH relations.
        # The copy folds into the next round's pin job: one job per round.
        dist = (
            dist.join(
                improved.withColumnRenamed("dist", "nd"), "node", "left"
            )
            .select(
                "node",
                F.coalesce("nd", "dist").cast("bigint").alias("dist"),
            )
            .unionByName(
                improved.join(dist.select("node"), "node", "left_anti")
            )
            .transform(lineage_cut)
        )
        frontier = improved
    pin.release()
    raise RuntimeError(
        f"weighted relaxation did not reach the fixpoint in {max_iter} rounds"
    )


def keyed_distances(
    edges: DataFrame, sources: "DataFrame | None" = None, max_iter: int = 50
) -> DataFrame:
    """DataFrame[src, node, dist] — minimum hop count from EACH source to
    every node it reaches, swept together keyed by src (the stress
    operator's forward wave, distances only). sources(src) defaults to
    EVERY node — the exact all-pairs table behind the harmonic-centrality
    accuracy audit; state is sum over components of |c|^2, so this is for
    audit-scale graphs, not the 100 TB path (hop_distances /
    operators/anf.py are the single-source-set and sketched answers there).
    Unreached (src, node) pairs are absent; dist=0 rows are the sources."""
    adj = (
        edges.select("u", "v")
        .unionAll(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .transform(lineage_cut_eager)
    )
    spark = edges.sparkSession
    if sources is None:
        sources = adj.select(F.col("u").alias("src")).distinct()
    else:
        sources = sources.select(F.col(sources.columns[0]).alias("src")).distinct()
    frontier = sources.select(
        "src", F.col("src").alias("node")
    ).transform(lineage_cut_eager)
    if frontier.isEmpty():
        return spark.createDataFrame([], "src bigint, node bigint, dist bigint")
    dist = frontier.withColumn("dist", F.lit(0).cast("bigint"))
    for d in range(1, max_iter + 1):
        nxt = (
            frontier.join(adj, frontier.node == adj.u)
            .select("src", F.col("v").alias("node"))
            .distinct()
            .join(dist.select("src", "node"), ["src", "node"], "left_anti")
            .transform(lineage_cut_eager)
        )
        if nxt.isEmpty():
            return dist
        # LAZY union checkpoint — same one-job-per-hop economics as
        # hop_distances above
        dist = dist.unionByName(
            nxt.withColumn("dist", F.lit(d).cast("bigint"))
        ).transform(lineage_cut)
        frontier = nxt
    raise RuntimeError(
        f"keyed BFS did not exhaust the reachable set in {max_iter} hops"
    )
