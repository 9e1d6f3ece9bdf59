"""Boruvka minimum spanning forest (operators/msf.py): fuzz vs a pure-
Python Kruskal (unique MSF under distinct weights — algorithm-independent
agreement), forests, self-loops, string node labels (the contracted-graph
case), and degenerate inputs."""

from __future__ import annotations

import random

from streamds_spark.operators.msf import minimum_spanning_forest
import pytest


def _kruskal(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for u, v, w in sorted(edges, key=lambda e: e[2]):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            out.add((u, v, w))
    return out


@pytest.mark.slow
def test_fuzz_vs_kruskal(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = rng.randint(10, 40)
        nodes = list(range(n))
        pairs = [(u, v) for u in nodes for v in nodes if u < v]
        rng.shuffle(pairs)
        m = rng.randint(n, min(len(pairs), 3 * n))
        edges = [(u, v, i + 1) for i, (u, v) in enumerate(pairs[:m])]
        want = _kruskal(nodes, edges)
        df = spark.createDataFrame(edges, "u int, v int, w bigint").repartition(8)
        got = {(r.u, r.v, r.w) for r in minimum_spanning_forest(df).collect()}
        assert got == want, f"trial {trial}: {got ^ want}"


def test_forest_self_loops_and_empty(spark):
    edges = [(0, 1, 5), (1, 2, 3), (0, 2, 9), (10, 11, 1), (3, 3, 2)]
    df = spark.createDataFrame(edges, "u int, v int, w bigint")
    got = sorted((r.u, r.v, r.w) for r in minimum_spanning_forest(df).collect())
    # two trees (0-1-2 and 10-11); the 0-2 edge closes a cycle; 3-3 ignored
    assert got == [(0, 1, 5), (1, 2, 3), (10, 11, 1)]
    empty = df.filter("u < 0")
    assert minimum_spanning_forest(empty).count() == 0


def test_string_node_labels(spark):
    """Contracted graphs carry label-space node ids (brand strings) — the
    connected-components contraction must converge on non-numeric ids."""
    edges = [("a", "b", 1), ("b", "c", 2), ("a", "c", 3), ("c", "d", 4)]
    df = spark.createDataFrame(edges, "u string, v string, w bigint")
    got = sorted((r.u, r.v, r.w) for r in minimum_spanning_forest(df).collect())
    assert got == [("a", "b", 1), ("b", "c", 2), ("c", "d", 4)]


def test_path_graph_deep_contraction(spark):
    """A pure path is Boruvka's deepest contraction shape (components chain
    instead of star): the whole path is the MSF."""
    edges = [(i, i + 1, 100 - i) for i in range(20)]
    df = spark.createDataFrame(edges, "u int, v int, w bigint")
    assert minimum_spanning_forest(df).count() == 20


def test_duplicate_weights_refused(spark):
    """Ties break both MSF uniqueness and the weight-keyed contraction —
    the operator must refuse loudly, not return a silently wrong forest."""
    import pytest

    edges = [(0, 1, 5), (1, 2, 5), (2, 3, 7)]
    df = spark.createDataFrame(edges, "u int, v int, w bigint")
    with pytest.raises(ValueError, match="DISTINCT total order"):
        minimum_spanning_forest(df)


def test_null_weights_refused(spark):
    """count(w)/count_distinct(w) both ignore NULLs, so a NULL-weight edge
    would pass the duplicate check yet spin as an unpickable phantom
    crossing edge for all max_rounds — it must be refused loudly up front."""
    import pytest

    edges = [(0, 1, 5), (1, 2, None), (2, 3, 7)]
    df = spark.createDataFrame(edges, "u int, v int, w bigint")
    with pytest.raises(ValueError, match="non-NULL"):
        minimum_spanning_forest(df)
