"""Unit tests for the first-class connected-components operator
(operators/concomp.py) — known graphs, a deep chain (pointer-jump halving),
a union-find fuzz, and the census shape."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from streamds_spark.operators.concomp import component_census, connected_components


def _labels(spark, edges):
    df = spark.createDataFrame(edges, "u bigint, v bigint")
    return {r["node"]: r["component"] for r in connected_components(df).collect()}


def test_two_components_min_label(spark):
    got = _labels(spark, [(3, 5), (5, 9), (20, 21)])
    assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20}


def test_long_chain_converges(spark):
    # 60-node path: diameter 59 >> default rounds without halving; pointer
    # jumping must collapse it well inside max_iter=25 (2^25 >> 59)
    chain = [(i, i + 1) for i in range(59)]
    got = _labels(spark, chain)
    assert set(got.values()) == {0}
    assert len(got) == 60


def test_fuzz_vs_union_find(spark):
    rng = random.Random(42)
    nodes = list(range(80))
    edges = {(min(a, b), max(a, b)) for a, b in
             (rng.sample(nodes, 2) for _ in range(70))}
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    # min id per union-find root, only for nodes that appear in an edge
    touched = {n for e in edges for n in e}
    want = {}
    root_min = {}
    for n in sorted(touched):
        root_min.setdefault(find(n), n)
    for n in touched:
        want[n] = root_min[find(n)]
    got = _labels(spark, sorted(edges))
    assert got == want


def test_component_census_histogram(spark):
    # components: {1,2,3} (size 3), {10,11} (size 2), {20,21} (size 2)
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)], "u bigint, v bigint"
    )
    rows = [(r["component_size"], r["n_components"])
            for r in component_census(df).collect()]
    assert rows == [(2, 2), (3, 1)]


def test_resolve_groups_delegation_unchanged(spark):
    # the dedup pipeline's cluster resolution delegates here; pin the
    # (node, rep) contract on a chained cluster
    from streamds_spark.operators.dedup_pipeline import resolve_groups

    verified = spark.createDataFrame(
        [(5, 7), (7, 9)], "id_a bigint, id_b bigint"
    )
    got = {r["node"]: r["rep"] for r in resolve_groups(verified).collect()}
    assert got == {5: 5, 7: 5, 9: 5}
