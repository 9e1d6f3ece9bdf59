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


@pytest.mark.slow
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


@pytest.mark.slow
def test_bipartite_oscillation(spark):
    """The documented synchronous-LPA failure mode (Raghavan et al. 2007):
    on a 4-cycle (the smallest bipartite-ish structure) the labeling
    oscillates with period 2 forever — labels_changed never reaches 0, so
    convergence is NOT a usable stop rule and the operator's fixed round
    budget is the correct design. The census makes the oscillation
    measurable: every round past the first flips all 4 nodes."""
    from streamds_spark.operators.lpa import (
        label_propagation,
        lpa_convergence_census,
    )

    edges = [(1, 2), (2, 3), (3, 4), (1, 4)]
    df = spark.createDataFrame(edges, "u bigint, v bigint")
    census = {
        r["round"]: (r["labels_changed"], r["n_communities"])
        for r in lpa_convergence_census(df, max_rounds=6).collect()
    }
    assert set(census) == {1, 2, 3, 4, 5, 6}
    # round 1 collapses to the two-label checkerboard; every later round
    # flips the whole checkerboard — changed stays 4, never 0
    assert all(census[r] == (4, 2) for r in range(2, 7)), census
    # period-2: the labeling at round r equals the labeling at round r+2
    lab = lambda rounds: sorted(  # noqa: E731
        tuple(r) for r in label_propagation(df, rounds=rounds).collect()
    )
    assert lab(2) == lab(4) and lab(3) == lab(5)
    assert lab(2) != lab(3)


@pytest.mark.slow
def test_convergence_census_matches_label_propagation(spark):
    """The census's per-round labeling is the SAME trajectory
    label_propagation walks: n_communities at round r equals the distinct
    label count of label_propagation(rounds=r)."""
    from streamds_spark.operators.lpa import (
        label_propagation,
        lpa_convergence_census,
    )

    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4), (7, 8)]
    df = spark.createDataFrame(edges, "u bigint, v bigint")
    census = {
        r["round"]: r["n_communities"]
        for r in lpa_convergence_census(df, max_rounds=4).collect()
    }
    for r in (1, 2, 3, 4):
        want = (
            label_propagation(df, rounds=r)
            .select("label")
            .distinct()
            .count()
        )
        assert census[r] == want, r
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_rounds"):
        lpa_convergence_census(df, max_rounds=0)


def test_convergence_census_empty_graph(spark):
    """An edge-free graph has no labeling trajectory: zero census rows —
    matching the DuckDB oracle's empty per-iteration join (a row of zeros
    per round would hash-mismatch the registry twin on a degenerate SF)."""
    from streamds_spark.operators.lpa import lpa_convergence_census

    empty = spark.createDataFrame([], "u bigint, v bigint")
    out = lpa_convergence_census(empty, max_rounds=4)
    assert out.count() == 0
    assert out.columns == ["round", "labels_changed", "n_communities"]
