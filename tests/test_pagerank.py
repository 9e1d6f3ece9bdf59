"""PageRank vs an independent NumPy power-iteration oracle."""

from __future__ import annotations

import numpy as np

from streamds_spark.operators.pagerank import pagerank

EDGES = [(0, 1), (1, 2), (2, 0), (2, 1), (3, 2), (0, 2)]  # node 3: no in-edges; no dangling? 3 has out-edge
N = 4
DAMPING = 0.85
ITERS = 10


def _numpy_pagerank():
    nodes = sorted({u for e in EDGES for u in e})
    idx = {n: i for i, n in enumerate(nodes)}
    deg = np.zeros(N)
    for s, _ in set(EDGES):
        deg[idx[s]] += 1
    r = np.ones(N)
    for _ in range(ITERS):
        inflow = np.zeros(N)
        for s, d in set(EDGES):
            inflow[idx[d]] += r[idx[s]] / deg[idx[s]]
        dangling = sum(r[i] for i in range(N) if deg[i] == 0)
        r = (1 - DAMPING) + DAMPING * (inflow + dangling / N)
    return {n: r[idx[n]] for n in nodes}


def test_pagerank_matches_power_iteration(spark):
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(edges, DAMPING, ITERS).collect()}
    want = _numpy_pagerank()
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-9, (n, got[n], want[n])
    # rank ordering sanity: node 2 has the most in-links
    assert max(got, key=got.get) == 2


def test_pagerank_with_dangling_node(spark):
    # 0→1, 1 has no out-edges (dangling): mass must redistribute, not vanish
    edges = spark.createDataFrame([(0, 1)], ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(edges, 0.85, 15).collect()}
    assert abs(sum(got.values()) - 2.0) < 1e-6  # total rank conserved ≈ N
    assert got[1] > got[0]
