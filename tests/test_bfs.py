"""Frontier-expansion BFS (operators/bfs.py) vs a pure-Python reference:
crafted graphs, multi-source waves, unreachable components, randomized
fuzz, and the non-convergence guard."""

from __future__ import annotations

import random
from collections import deque

import pytest

from streamds_spark.operators.bfs import hop_distances


def _ref_bfs(edges: list[tuple[int, int]], sources: list[int]) -> dict[int, int]:
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    dist = {s: 0 for s in sources}
    dq = deque(sources)
    while dq:
        n = dq.popleft()
        for m in adj.get(n, ()):
            if m not in dist:
                dist[m] = dist[n] + 1
                dq.append(m)
    return dist


def _run(spark, edges, sources, **kw):
    e = spark.createDataFrame(edges, ["u", "v"])
    s = spark.createDataFrame([(x,) for x in sources], ["node"])
    return {r["node"]: r["dist"] for r in hop_distances(e, s, **kw).collect()}


def test_crafted_path_star_and_unreachable(spark):
    # path 0-1-2-3, star leaves off 2, and an island 100-101 nobody reaches
    edges = [(0, 1), (1, 2), (2, 3), (2, 10), (2, 11), (100, 101)]
    got = _run(spark, edges, [0])
    assert got == _ref_bfs(edges, [0])
    assert got[3] == 3 and got[10] == 3 and 100 not in got


def test_multi_source_wave(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)]
    got = _run(spark, edges, [0, 5])
    assert got == _ref_bfs(edges, [0, 5])
    assert got[2] == 2 and got[3] == 2  # met in the middle


def test_fuzz_vs_reference(spark):
    rng = random.Random(41)
    for trial in range(3):
        n = rng.randint(8, 20)
        edges = list(
            {
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(rng.randint(n, 3 * n))
            }
        )
        srcs = rng.sample(range(n), rng.randint(1, 2))
        assert _run(spark, edges, srcs) == _ref_bfs(edges, srcs), (trial, edges)


def test_max_iter_guard_raises(spark):
    edges = [(i, i + 1) for i in range(6)]  # needs 6 hops
    with pytest.raises(RuntimeError, match="hops"):
        _run(spark, edges, [0], max_iter=3)


# ---------------------------------------------------------------------------
# weighted_distances (round 9): frontier Bellman-Ford vs pure-Python Dijkstra
# ---------------------------------------------------------------------------


def _ref_dijkstra(
    edges: list[tuple[int, int, int]], sources: list[int]
) -> dict[int, int]:
    import heapq

    adj: dict[int, list[tuple[int, int]]] = {}
    for u, v, w in edges:
        adj.setdefault(u, []).append((v, w))
        adj.setdefault(v, []).append((u, w))
    dist = {s: 0 for s in sources}
    heap = [(0, s) for s in sources]
    heapq.heapify(heap)
    while heap:
        d, n = heapq.heappop(heap)
        if d > dist.get(n, 1 << 60):
            continue
        for m, w in adj.get(n, ()):
            nd = d + w
            if nd < dist.get(m, 1 << 60):
                dist[m] = nd
                heapq.heappush(heap, (nd, m))
    return dist


def _run_w(spark, edges, sources, **kw):
    from streamds_spark.operators.bfs import weighted_distances

    e = spark.createDataFrame(edges, ["u", "v", "w"])
    s = spark.createDataFrame([(x,) for x in sources], ["node"])
    return {r["node"]: r["dist"] for r in weighted_distances(e, s, **kw).collect()}


@pytest.mark.slow
def test_weighted_crafted_multihop_beats_direct(spark):
    """A cheap 3-hop chain must beat an expensive direct edge, multi-source
    takes the min over sources, and unreachable components stay absent."""
    edges = [
        (1, 5, 10),          # direct but expensive
        (1, 2, 1), (2, 3, 1), (3, 5, 1),  # cheap detour: cost 3
        (5, 6, 2),
        (90, 91, 4),         # separate component
    ]
    got = _run_w(spark, edges, [1])
    assert got == {1: 0, 2: 1, 3: 2, 5: 3, 6: 5}
    got2 = _run_w(spark, edges, [1, 91])
    assert got2[91] == 0 and got2[90] == 4 and got2[5] == 3


@pytest.mark.slow
def test_weighted_fuzz_vs_dijkstra(spark):
    """Randomized graphs with skewed integer weights: the distributed
    relaxation equals Dijkstra exactly (integer costs, no float anywhere)."""
    rng = random.Random(77)
    for trial in range(4):
        n = rng.randrange(8, 26)
        edges = [
            (rng.randrange(n), rng.randrange(n), rng.choice([1, 1, 2, 3, 7]))
            for _ in range(rng.randrange(n, 3 * n))
        ]
        edges = [(u, v, w) for u, v, w in edges if u != v]
        if not edges:
            continue
        sources = [edges[0][0]]
        assert _run_w(spark, edges, sources) == _ref_dijkstra(edges, sources), (
            trial,
            edges,
        )


def test_weighted_reduces_to_bfs_on_unit_weights(spark):
    """w = 1 must reproduce hop_distances exactly."""
    rng = random.Random(5)
    edges = [(rng.randrange(12), rng.randrange(12)) for _ in range(20)]
    edges = [(u, v) for u, v in edges if u != v]
    unit = [(u, v, 1) for u, v in edges]
    assert _run_w(spark, unit, [edges[0][0]]) == _run(spark, edges, [edges[0][0]])
