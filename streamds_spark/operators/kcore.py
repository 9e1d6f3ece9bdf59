"""k-core decomposition: iteratively peel nodes of degree < k until the
remaining subgraph's minimum degree is ≥ k (the classic Matula/Beck
peeling, distributed as repeated degree-count + anti-join rounds).

No reference analog (the reference has no graph surface); companion to the
one-shot triangle census (queries/graph.py) and the fixpoint connected
components (operators/dedup_pipeline.py).

Scale posture: each round is one groupBy-degree shuffle plus an anti-join
against the peeled set. The peeled set is NOT always small — on a
heavy-tailed graph with a large k, the FIRST round's peel set (every node
with degree < k) is the majority of the graph, so a forced broadcast there
is a multi-GB OOM at cluster scale. The anti-join hint is therefore
size-gated: we already run one job per round to count the peel set (the
fixpoint test), so the same count decides broadcast (tiny peel set) vs a
plain shuffled anti-join where AQE is free to re-plan at runtime. Lineage
is truncated with localCheckpoint every round — without it the plan doubles
per iteration and the driver OOMs on plan size long before data size
matters. Rounds are bounded by the graph's degeneracy ordering depth,
~O(log n) on heavy-tailed graphs; `max_iter` caps pathological chains and
raising it is safe because each round strictly shrinks the node set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Broadcast the peel set only below this row count. At ~16 bytes per id row
# this stays well under the default 10 MB autoBroadcastJoinThreshold and far
# under executor memory at any scale; above it, the plain anti-join shuffles
# and AQE may still broadcast if runtime stats allow.
PEEL_BROADCAST_ROW_CAP = 100_000


def _peel_once(adj: DataFrame, low: DataFrame, n_low: int) -> DataFrame:
    """One peel round: drop every half-edge touching a peeled node.

    Returns the PRE-checkpoint plan so tests can pin the join strategy:
    broadcast hint only when the peel set is provably tiny (n_low ≤
    PEEL_BROADCAST_ROW_CAP); otherwise an unhinted anti-join that AQE
    sizes at runtime.
    """
    right = F.broadcast(low) if n_low <= PEEL_BROADCAST_ROW_CAP else low
    return adj.join(right, adj.u == low.n, "left_anti").join(
        right, adj.v == low.n, "left_anti"
    )


def kcore_nodes(edges: DataFrame, k: int, max_iter: int = 50) -> DataFrame:
    """Nodes of the k-core of the undirected simple graph `edges(u, v)`.

    Returns DataFrame[node: <id type>, degree: bigint] — the node's degree
    WITHIN the k-core (≥ k by construction). Empty result = no k-core.
    Raises RuntimeError if max_iter rounds don't reach the fixpoint (each
    round strictly shrinks the graph, so this only triggers on a peel chain
    deeper than max_iter — rerun with a higher cap).
    """
    # Symmetrize once: adjacency with one row per directed half-edge.
    adj = edges.select("u", "v").unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    adj = adj.localCheckpoint(eager=True)
    for _ in range(max_iter):
        deg = adj.groupBy("u").agg(F.count("*").alias("degree"))
        low = deg.filter(F.col("degree") < k).select(F.col("u").alias("n"))
        low = low.localCheckpoint(eager=True)  # feeds the count + two joins
        n_low = low.count()
        if n_low == 0:
            return deg.select(F.col("u").alias("node"), "degree")
        adj = _peel_once(adj, low, n_low).localCheckpoint(eager=True)
        if adj.isEmpty():
            return deg.filter(F.lit(False)).select(
                F.col("u").alias("node"), "degree"
            )
    raise RuntimeError(f"k-core peeling did not converge in {max_iter} rounds")


def kcore_summary(edges: DataFrame, k: int, max_iter: int = 50) -> DataFrame:
    """1-row census of the k-core: (k, n_core_nodes, n_core_edges,
    min_core_degree)."""
    core = kcore_nodes(edges, k, max_iter)
    return core.agg(
        F.lit(k).alias("k"),
        F.count("*").cast("bigint").alias("n_core_nodes"),
        (F.coalesce(F.sum("degree"), F.lit(0)) / 2).cast("bigint").alias("n_core_edges"),
        F.min("degree").cast("bigint").alias("min_core_degree"),
    )


def core_numbers(edges: DataFrame, max_iter: int = 100) -> DataFrame:
    """Per-node core numbers (full k-core decomposition) of the undirected
    simple graph `edges(u, v)` — DataFrame[node, core: bigint].

    Algorithm: the H-index fixpoint (Lü, Zhou, Zhang & Stanley, "The
    H-index of a network node and its relation to degree and coreness",
    Nature Communications 2016): start every node's estimate at its degree
    and repeatedly replace it with the H-index of its neighbors' estimates
    (the largest h such that at least h neighbors currently hold >= h).
    Estimates decrease monotonically and the fixpoint is exactly coreness —
    so unlike the peel loop (one k per run, rounds = peel depth), ONE run
    yields every node's core number, and every quantity is a small integer:
    the result is hash-exact against a DuckDB recursive-CTE replay of the
    same iteration.

    Scale posture: each round is one equi-join of the adjacency against the
    n-row estimate table, a row_number window PARTITIONED by node (bounded
    by that node's degree — never a global window), and one groupBy max.
    Nothing ever broadcasts the graph; lineage is truncated per round.
    Round count is the graph's "convergence depth", typically O(10) on
    heavy-tailed graphs (it tracks the longest chain along which a low
    estimate must propagate); max_iter guards pathological chains and the
    function raises rather than return a non-fixpoint (correctness over
    partial answers).

    Returns nodes of the whole graph (isolated nodes cannot appear — edges
    define the node set) with core >= 1.
    """
    df, _ = _core_numbers_with_rounds(edges, max_iter)
    return df


def _core_numbers_with_rounds(
    edges: DataFrame, max_iter: int = 100
) -> tuple[DataFrame, int]:
    """(core numbers, rounds used) — the rounds count backs the convergence
    bound test; callers wanting only the result use core_numbers."""
    from pyspark.sql import Window

    adj = edges.select("u", "v").unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    adj = adj.localCheckpoint(eager=True)
    est = (
        adj.groupBy("u")
        .agg(F.count("*").cast("bigint").alias("e"))
        .select(F.col("u").alias("node"), "e")
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("u").orderBy(F.col("ne").desc())
    for rounds in range(1, max_iter + 1):
        nbr = adj.join(est, adj.v == est.node).select(
            "u", F.col("e").alias("ne")
        )
        upd = (
            nbr.withColumn("rn", F.row_number().over(w))
            .groupBy("u")
            .agg(F.max(F.least(F.col("rn"), F.col("ne"))).alias("h"))
            .select(F.col("u").alias("node"), F.col("h").cast("bigint").alias("e"))
            .localCheckpoint(eager=True)
        )
        converged = (
            upd.alias("n")
            .join(est.alias("o"), "node")
            .where("n.e <> o.e")
            .isEmpty()
        )
        est = upd
        if converged:  # no estimate moved: fixpoint reached
            return est.select("node", F.col("e").alias("core")), rounds
    raise RuntimeError(
        f"core-number H-index iteration did not converge in {max_iter} rounds"
    )
