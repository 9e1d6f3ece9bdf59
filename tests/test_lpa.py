"""Deterministic synchronous label propagation (operators/lpa.py):
crafted community shapes, pure-Python fuzz replay, determinism, and the
fixed-round contract."""

from __future__ import annotations

import random

import pytest

from streamds_spark.operators.lpa import community_sizes, label_propagation


def _py_lpa(edge_list, rounds):
    """Reference replay: synchronous, mode with min-label tie-break."""
    adj: dict = {}
    for u, v in edge_list:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    labels = {n: n for n in adj}
    for _ in range(rounds):
        nxt = {}
        for n, nbrs in adj.items():
            counts: dict = {}
            for b in nbrs:
                counts[labels[b]] = counts.get(labels[b], 0) + 1
            nxt[n] = min(counts, key=lambda l: (-counts[l], l))
        labels = nxt
    return labels


def test_two_cliques_with_bridge(spark):
    """Two 5-cliques joined by one bridge edge: LPA floods each clique with
    its own minimum label and the bridge cannot overturn a clique majority."""
    c1 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    c2 = [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
    edges = c1 + c2 + [(4, 10)]
    df = spark.createDataFrame(edges, "u bigint, v bigint")
    got = {r["node"]: r["label"] for r in label_propagation(df, rounds=4).collect()}
    assert got == _py_lpa(edges, 4)
    assert len({got[n] for n in range(5)}) == 1
    assert len({got[n] for n in range(10, 15)}) == 1
    assert got[0] != got[10]
    sizes = [tuple(r) for r in community_sizes(df, rounds=4, k=5).collect()]
    assert [s for _c, s in sizes] == sorted([s for _c, s in sizes], reverse=True)
    assert sum(s for _c, s in sizes) == 10


def test_fuzz_matches_python_replay(spark):
    """Random graphs x several round budgets: the Spark labeling equals the
    pure-Python synchronous replay node-for-node (total determinism)."""
    rng = random.Random(11)
    for trial in range(3):
        nodes = list(range(1, 25))
        edges = sorted(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    (rng.choice(nodes), rng.choice(nodes)) for _ in range(40)
                )
                if a != b
            }
        )
        df = spark.createDataFrame(edges, "u bigint, v bigint")
        for rounds in (1, 3):
            got = {
                r["node"]: r["label"]
                for r in label_propagation(df, rounds=rounds).collect()
            }
            assert got == _py_lpa(edges, rounds), (trial, rounds)


def test_determinism_and_validation(spark):
    edges = [(1, 2), (2, 3), (3, 1), (3, 4)]
    df = spark.createDataFrame(edges, "u bigint, v bigint")
    a = sorted(tuple(r) for r in label_propagation(df, 4).collect())
    b = sorted(tuple(r) for r in label_propagation(df, 4).collect())
    assert a == b
    with pytest.raises(ValueError, match="rounds"):
        label_propagation(df, 0)
    # duplicate edge rows don't inflate neighbor-label counts
    dup = spark.createDataFrame(edges + edges, "u bigint, v bigint")
    assert sorted(tuple(r) for r in label_propagation(dup, 4).collect()) == a
