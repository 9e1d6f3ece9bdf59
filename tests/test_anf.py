"""HyperANF neighborhood function (operators/anf.py).

The oracle gate proves the census against a DuckDB replay; these tests pin
the semantics the census alone can't show: the final-counter set invariant
(a node's fixpoint registers sketch exactly its connected component), the
round bound (graph diameter), monotonicity, and a pure-Python fuzz replay
of the register arithmetic.
"""

import hashlib
import math
import random

import pytest
from pyspark.sql import functions as F

from streamds_spark.operators.anf import (
    M_ANF,
    anf_census,
    anf_counters,
    hll64_registers,
)

pytestmark = pytest.mark.usefixtures("spark")

HEX = "0123456789abcdef"


def _py_registers(keys):
    """Pure-Python replay of the m=64 register scheme."""
    regs = {}
    for k in keys:
        h = hashlib.md5(str(k).encode()).hexdigest()
        bucket = (HEX.index(h[0])) * 4 + (HEX.index(h[1])) // 4
        t = h[2:17].lstrip("0")
        if not t:
            rho = 61
        else:
            rho = (15 - len(t)) * 4 + 4 - int(math.floor(math.log2(HEX.index(t[0]))))
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def _py_census(edge_list):
    """Pure-Python HyperANF census replay."""
    adj = {}
    nodes = set()
    for u, v in edge_list:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
        nodes.update((u, v))
    counters = {v: _py_registers([v]) for v in nodes}
    census = []

    def mass():
        return (
            sum(len(c) for c in counters.values()),
            sum(sum(c.values()) for c in counters.values()),
        )

    reg, rho = mass()
    census.append((0, reg, rho))
    for t in range(1, 64):
        nxt = {}
        for v in nodes:
            merged = dict(counters[v])
            for u in adj[v]:
                for b, r in counters[u].items():
                    merged[b] = max(merged.get(b, 0), r)
            nxt[v] = merged
        counters = nxt
        reg, rho = mass()
        if rho == census[-1][2]:
            break
        census.append((t, reg, rho))
    final = census[-1][1]
    return [(t, r, m, 1000 * r // final) for (t, r, m) in census]


def test_census_crafted_path(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "u bigint, v bigint"
    )
    rows = [tuple(r) for r in anf_census(edges).orderBy("t").collect()]
    assert rows == _py_census([(1, 2), (2, 3), (3, 4), (10, 11)])
    # path diameter 3 → fixpoint at t=3; permille monotone to 1000
    assert rows[-1][0] == 3 and rows[-1][3] == 1000
    assert all(a[1] <= b[1] and a[2] <= b[2] for a, b in zip(rows, rows[1:]))


def test_final_counters_equal_component_sketch(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "u bigint, v bigint"
    )
    cnt = anf_counters(edges)
    for node, comp in ((1, [1, 2, 3, 4]), (4, [1, 2, 3, 4]), (10, [10, 11])):
        got = sorted(
            (r["bucket"], r["max_rho"])
            for r in cnt.where(F.col("node") == node).collect()
        )
        direct = sorted(
            (r["bucket"], r["max_rho"])
            for r in hll64_registers(
                spark.createDataFrame([(k,) for k in comp], "k bigint"), "k"
            ).collect()
        )
        assert got == direct, node


@pytest.mark.slow
def test_census_fuzz_vs_python(spark):
    rng = random.Random(9)
    nodes = list(range(1, 41))
    edge_list = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.choice(nodes), rng.choice(nodes)) for _ in range(60)
            )
            if a != b
        }
    )
    edges = spark.createDataFrame(edge_list, "u bigint, v bigint")
    rows = [tuple(r) for r in anf_census(edges).orderBy("t").collect()]
    assert rows == _py_census(edge_list)


def test_register_count_bounded_by_m(spark):
    # a clique saturates every node's counter with the same register set,
    # bounded by M_ANF
    clique = [(a, b) for a in range(1, 9) for b in range(a + 1, 9)]
    edges = spark.createDataFrame(clique, "u bigint, v bigint")
    per_node = (
        anf_counters(edges).groupBy("node").agg(F.count("*").alias("c")).collect()
    )
    assert all(r["c"] <= M_ANF for r in per_node)
    assert len({r["c"] for r in per_node}) == 1  # identical saturated sets


@pytest.mark.slow
def test_striping_is_value_identical(spark):
    rng = random.Random(23)
    nodes = list(range(1, 31))
    edge_list = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in ((rng.choice(nodes), rng.choice(nodes)) for _ in range(45))
            if a != b
        }
    )
    edges = spark.createDataFrame(edge_list, "u bigint, v bigint")
    base = sorted(tuple(r) for r in anf_census(edges).collect())
    for stripes in (2, 8):
        got = sorted(tuple(r) for r in anf_census(edges, stripes=stripes).collect())
        assert got == base, stripes
    c1 = sorted(tuple(r) for r in anf_counters(edges).collect())
    c8 = sorted(tuple(r) for r in anf_counters(edges, stripes=8).collect())
    assert c1 == c8


@pytest.mark.slow
def test_packed_layout_striping_and_overclamp(spark):
    """Round 12: the PACKED register layout is the ONLY layout (the r11
    narrow/wide pair is retired; the census fuzz test above pins packed
    against the pure-Python dense replay). What needs pinning here: the
    packed column-group striping is value-identical across census, final
    counters AND the harmonic top-k on one graph, and a stripes override
    PAST m (the ADVICE r11 wide-path crash) clamps instead of raising."""
    import streamds_spark.operators.anf as anf

    rng = random.Random(7)
    nodes = list(range(1, 31))
    edge_list = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in ((rng.choice(nodes), rng.choice(nodes)) for _ in range(45))
            if a != b
        }
    )
    edges = spark.createDataFrame(edge_list, "u bigint, v bigint")
    base_census = sorted(tuple(r) for r in anf.anf_census(edges).collect())
    base_h = [
        tuple(r) for r in anf.harmonic_centrality_topk(edges, k=10).collect()
    ]
    # 3 does not divide m=64: the last contiguous column group is narrower
    # (22+22+20 cells) — the slice/pad arithmetic's uneven case
    got = sorted(tuple(r) for r in anf.anf_census(edges, stripes=3).collect())
    assert got == base_census
    got_h = [
        tuple(r)
        for r in anf.harmonic_centrality_topk(edges, k=10, stripes=3).collect()
    ]
    assert got_h == base_h

    # Over-m override (the ADVICE r11 crash class) and the empty-trailing-
    # group break (k=48 -> width 2 -> groups past 32 are empty) on a
    # 2-node graph: k clamps to m and both runs stay value-identical.
    # Tiny graph deliberately — 64 column-group slices per round are pure
    # driver/plan cost, so exercising the clamp must not soak the suite.
    tiny = spark.createDataFrame([(1, 2)], "u bigint, v bigint")
    tiny_base = sorted(tuple(r) for r in anf.anf_census(tiny).collect())
    tiny_cnt = sorted(tuple(r) for r in anf.anf_counters(tiny).collect())
    for stripes in (48, 100):
        got = sorted(
            tuple(r) for r in anf.anf_census(tiny, stripes=stripes).collect()
        )
        assert got == tiny_base, stripes
    assert (
        sorted(tuple(r) for r in anf.anf_counters(tiny, stripes=100).collect())
        == tiny_cnt
    )


def test_empty_edge_list_zero_census(spark):
    """An empty graph must yield a (0, 0) zero-mass census, not a
    TypeError from int(None) on the NULL sum."""
    from streamds_spark.operators.anf import anf_census

    empty = spark.createDataFrame([], "u bigint, v bigint")
    rows = anf_census(empty).collect()
    assert all(r["reg_mass"] == 0 and r["rho_mass"] == 0 for r in rows)


def test_auto_stripes_self_sizing(spark):
    """Unset stripes self-sizes from directed-edge cell fan-out vs executor
    memory, at the round-12 PACKED-layout calibration (192M cells/GiB —
    the measured x10-completes-at-1 anchor, provenance in sizing.py):
    sf0.1 AND the x10 soak on 8 GiB stay at 1 (fast path), striping engages
    a decade later, and the value is clamped to [1, m]. Value-identity
    across stripe counts is pinned by test_striping_is_value_identical."""
    from streamds_spark.operators.anf import M_ANF, _auto_stripes, _mem_budget_bytes

    gib = 1 << 30
    assert _auto_stripes(2_392_000, 8 * gib) == 1  # sf0.1 on this box
    assert _auto_stripes(23_920_000, 8 * gib) == 1  # x10: measured completes
    assert _auto_stripes(239_200_000, 8 * gib) == 10  # x100 would stripe
    assert _auto_stripes(239_200_000, 48 * gib) == 2  # more memory, fewer
    assert _auto_stripes(0, 8 * gib) == 1  # clamp low
    assert _auto_stripes(10**13, 8 * gib) == M_ANF  # clamp high
    assert _mem_budget_bytes(spark.sparkSession if hasattr(spark, "sparkSession") else spark) > 0


@pytest.mark.slow
def test_harmonic_centrality_shape_and_striping(spark):
    """HyperBall harmonic fold: the star center dominates its leaves (it
    accrues the whole component at weight 1/1), a path's midpoint beats its
    endpoints, striping is value-identical, ties break deterministically,
    and the empty graph yields an empty frame."""
    from streamds_spark.operators.anf import (
        HARMONIC_SCALE,
        harmonic_centrality_topk,
    )

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 7)], "u bigint, v bigint"
    )
    rows = harmonic_centrality_topk(star, k=7).collect()
    assert len(rows) == 7
    assert rows[0]["node"] == 0  # center first
    assert rows[0]["h_scaled"] > max(r["h_scaled"] for r in rows[1:])
    # leaf values are NOT symmetric (each leaf's own seed register overlaps
    # the center's differently — the approximate-by-construction part), but
    # the ordering is total and deterministic: h desc, node asc
    key = [(-r["h_scaled"], r["node"]) for r in rows]
    assert key == sorted(key)
    # center saw everything at t=1: its h is exactly its total mass growth
    # times SCALE (weight floor(SCALE/1))
    assert rows[0]["h_scaled"] % HARMONIC_SCALE == 0

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "u bigint, v bigint"
    )
    h = {r["node"]: r["h_scaled"] for r in harmonic_centrality_topk(path, k=7).collect()}
    assert h[3] > h[0] and h[3] > h[6]  # midpoint beats endpoints

    base = [tuple(r) for r in harmonic_centrality_topk(star, k=7).collect()]
    for stripes in (2, 8):
        got = [
            tuple(r)
            for r in harmonic_centrality_topk(star, k=7, stripes=stripes).collect()
        ]
        assert got == base, stripes

    empty = spark.createDataFrame([], "u bigint, v bigint")
    assert harmonic_centrality_topk(empty, k=5).count() == 0
