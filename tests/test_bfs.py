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
