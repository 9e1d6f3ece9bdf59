"""PageRank vs an independent NumPy power-iteration oracle."""

from __future__ import annotations

import numpy as np

from streamds_spark.operators.pagerank import pagerank
import pytest

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


@pytest.mark.slow
def test_pagerank_matches_power_iteration(spark):
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(edges, DAMPING, ITERS).collect()}
    want = _numpy_pagerank()
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-9, (n, got[n], want[n])
    # rank ordering sanity: node 2 has the most in-links
    assert max(got, key=got.get) == 2


@pytest.mark.slow
def test_pagerank_with_dangling_node(spark):
    # 0→1, 1 has no out-edges (dangling): mass must redistribute, not vanish
    edges = spark.createDataFrame([(0, 1)], ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(edges, 0.85, 15).collect()}
    assert abs(sum(got.values()) - 2.0) < 1e-6  # total rank conserved ≈ N
    assert got[1] > got[0]


def _py_fixed_point(edges, scale=1_000_000_000, dpct=85, iters=6):
    """Exact Python replay of pagerank_fixed_point's integer recurrence."""
    e = sorted(set(edges))
    nodes = sorted({u for p in e for u in p})
    deg = {}
    for s, _ in e:
        deg[s] = deg.get(s, 0) + 1
    r = {n: scale for n in nodes}
    base = ((100 - dpct) * scale) // 100
    for _ in range(iters):
        inflow = {n: 0 for n in nodes}
        for s, d in e:
            inflow[d] += r[s] // deg[s]
        r = {n: base + (dpct * inflow[n]) // 100 for n in nodes}
    return r


def test_fixed_point_matches_python_replay_exactly(spark):
    """The whole point of the integer variant: bit-exact reproducibility —
    Spark's distributed run equals a sequential Python replay, value for
    value (no float tolerance anywhere)."""
    from streamds_spark.operators.pagerank import pagerank_fixed_point

    # undirected ring + chords, fed as both directions (no dangling nodes)
    und = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (0, 2), (1, 3)]
    both = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(both, ["src", "dst"])
    got = {
        r["node"]: r["rank"]
        for r in pagerank_fixed_point(edges, max_iter=6).collect()
    }
    assert got == _py_fixed_point(both)


@pytest.mark.slow
def test_fixed_point_tracks_float_pagerank(spark):
    """Truncation error stays negligible: fixed-point ranks, rescaled, agree
    with the float pagerank (same undirected graph, same iterations) to
    well under the per-op truncation budget."""
    from streamds_spark.operators.pagerank import pagerank_fixed_point

    und = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (0, 2), (1, 3)]
    both = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(both, ["src", "dst"])
    fx = {
        r["node"]: r["rank"] / 1_000_000_000
        for r in pagerank_fixed_point(edges, max_iter=8).collect()
    }
    fl = {r["node"]: r["rank"] for r in pagerank(edges, 0.85, 8).collect()}
    for n in fx:
        assert abs(fx[n] - fl[n]) < 1e-6, (n, fx[n], fl[n])


def test_fixed_point_replay_is_duplicate_insensitive(spark):
    """Edge lists dedup before degree counting: duplicated input edges must
    not change ranks (same contract as the float variant)."""
    from streamds_spark.operators.pagerank import pagerank_fixed_point

    und = [(0, 1), (1, 2), (2, 0)]
    both = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(both * 3, ["src", "dst"])
    got = {
        r["node"]: r["rank"]
        for r in pagerank_fixed_point(edges, max_iter=4).collect()
    }
    assert got == _py_fixed_point(both, iters=4)
