"""k-truss support peeling (operators/ktruss.py).

The oracle gate proves the census against a DuckDB recursive replay; these
pin the semantics directly: crafted graphs with known trusses, the
containment ladder (k-truss edges shrink as k grows), uniqueness against a
pure-Python peel, and the cascade-to-empty path.
"""

import itertools
import random

import pytest

from streamds_spark.operators.ktruss import ktruss_edges, ktruss_summary

pytestmark = pytest.mark.usefixtures("spark")


def _py_ktruss(edge_list, k):
    """Pure-Python reference peel (order-independent fixpoint)."""
    edges = {tuple(sorted(e)) for e in edge_list}
    while True:
        nbrs = {}
        for u, v in edges:
            nbrs.setdefault(u, set()).add(v)
            nbrs.setdefault(v, set()).add(u)
        sup = {
            (u, v): len(nbrs[u] & nbrs[v]) for (u, v) in edges
        }
        keep = {e for e in edges if sup[e] >= k - 2}
        if keep == edges:
            return edges, sup
        edges = keep
        if not edges:
            return edges, {}


def _clique(nodes):
    return [tuple(sorted(p)) for p in itertools.combinations(nodes, 2)]


def test_clique_plus_tail(spark):
    # K5 is a 5-truss (every edge closes 3 triangles); the tail edge dies
    edge_list = _clique([1, 2, 3, 4, 5]) + [(5, 99)]
    edges = spark.createDataFrame(edge_list, "u bigint, v bigint")
    truss, rounds = ktruss_edges(edges, 5)
    got = {(r["u"], r["v"]) for r in truss.collect()}
    assert got == set(_clique([1, 2, 3, 4, 5]))
    assert rounds <= 3
    sups = {r["s"] for r in truss.collect()}
    assert sups == {3}  # every K5 edge closes exactly 3 triangles


def test_truss_cascade_to_empty(spark):
    # a triangle chain: each edge has support 1, so k=4 wipes everything
    edge_list = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5)]
    edges = spark.createDataFrame(edge_list, "u bigint, v bigint")
    truss, _ = ktruss_edges(edges, 4)
    assert truss.count() == 0
    row = ktruss_summary(edges, 4).collect()[0]
    assert (
        row["n_truss_edges"] == 0
        and row["n_truss_nodes"] == 0
        and row["min_support"] == 0
        and row["max_support"] == 0
    )


@pytest.mark.slow
def test_containment_ladder(spark):
    rng = random.Random(17)
    nodes = list(range(1, 25))
    edge_list = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in ((rng.choice(nodes), rng.choice(nodes)) for _ in range(120))
            if a != b
        }
    ) + _clique([1, 2, 3, 4, 5, 6])
    edge_list = sorted(set(edge_list))
    edges = spark.createDataFrame(edge_list, "u bigint, v bigint")
    prev = None
    for k in (3, 4, 5, 6):
        got = {(r["u"], r["v"]) for r in ktruss_edges(edges, k)[0].collect()}
        expect, _ = _py_ktruss(edge_list, k)
        assert got == expect, k
        if prev is not None:
            assert got <= prev  # (k+1)-truss ⊆ k-truss
        prev = got


def test_summary_supports_match_reference(spark):
    edge_list = _clique([1, 2, 3, 4, 5, 6]) + [(6, 7), (7, 8), (6, 8)]
    edges = spark.createDataFrame(sorted(set(edge_list)), "u bigint, v bigint")
    row = ktruss_summary(edges, 5).collect()[0]
    expect, sup = _py_ktruss(edge_list, 5)
    assert row["n_truss_edges"] == len(expect)
    in_truss = {e: s for e, s in sup.items() if e in expect}
    assert row["min_support"] == min(in_truss.values())
    assert row["max_support"] == max(in_truss.values())


def test_k_below_3_refused(spark):
    """k <= 2 would make the inner support join wrongly drop zero-triangle
    edges (the 2-truss is the whole graph) — refuse loudly."""
    import pytest

    from streamds_spark.operators.ktruss import ktruss_edges

    df = spark.createDataFrame([(1, 2)], "u bigint, v bigint")
    with pytest.raises(ValueError, match="k must be >= 3"):
        ktruss_edges(df, 2)


def test_auto_partitions_self_sizing(spark):
    """Unset shuffle_partitions self-sizes from the edge count: small graphs
    keep the session default (fast wide plan), big graphs raise granularity
    past the measured x10 OOM boundary, and the session conf is restored."""
    from streamds_spark.operators.ktruss import _auto_partitions, ktruss_edges

    # calibration pins (BASELINE.md round-9 soak): sf0.1 stays at the
    # session's 32; the x10 edge count lands past the proven 256
    assert _auto_partitions(1_196_000, 32) == 32
    assert _auto_partitions(11_960_000, 32) == 299
    assert _auto_partitions(10, 32) == 32  # never below the session default
    assert _auto_partitions(10**9, 32) == 4096  # capped
    # default call signature leaves the session conf untouched afterwards
    before = spark.conf.get("spark.sql.shuffle.partitions")
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (1, 4)], "u bigint, v bigint"
    )
    truss, _ = ktruss_edges(edges, 3)
    assert truss.count() == 6
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    # an explicit 0 used to mean "no override" via the falsy check — now
    # that None is the self-size sentinel, 0/negative must refuse loudly
    import pytest

    with pytest.raises(ValueError, match="shuffle_partitions"):
        ktruss_edges(edges, 3, shuffle_partitions=0)
