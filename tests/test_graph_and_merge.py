"""Unit tests for the round-3 operators: batch MERGE, degree-ordered triangle
counting, and two-pass Misra-Gries heavy hitters (adversarial skew)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamds_spark.operators.heavy_hitters import heavy_hitters
from streamds_spark.operators.merge import merge_into
from streamds_spark.queries.graph import (
    copurchase_edges,
    oriented_by_degree,
    triangle_count,
)


@pytest.fixture()
def base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "s", "v"]
    )


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "k bigint, s string, v double, is_delete boolean"
    )


def test_merge_update_insert_delete(spark, base):
    changes = _changes(
        spark,
        [
            (2, "B", 99.0, False),  # update
            (4, "d", 40.0, False),  # insert
            (3, None, None, True),  # delete
            (7, None, None, True),  # delete of absent key: no-op
        ],
    )
    out = merge_into(base, changes, key="k", update_cols=("s", "v"))
    got = {r["k"]: (r["s"], r["v"]) for r in out.collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 99.0), 4: ("d", 40.0)}


def test_merge_partial_update_keeps_base_for_null(spark, base):
    # a NULL in an update column means "leave unchanged" (coalesce semantics)
    changes = _changes(spark, [(1, None, 77.0, False)])
    out = merge_into(base, changes, key="k", update_cols=("s", "v"))
    got = {r["k"]: (r["s"], r["v"]) for r in out.collect()}
    assert got[1] == ("a", 77.0)
    assert got[2] == ("b", 20.0)


def test_merge_is_single_shuffle_join(spark, base):
    changes = _changes(spark, [(1, "x", 1.0, False)])
    plan = merge_into(base, changes, "k", ("s",))._jdf.queryExecution().executedPlan().toString()
    assert "FullOuter" in plan and ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["u", "v"])


def test_triangle_count_known_graph(spark):
    # K4 has 4 triangles; plus a pendant edge (no new triangle)
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = _edges(spark, k4 + [(3, 9)])
    assert triangle_count(edges).collect()[0]["n_triangles"] == 4


def test_triangle_count_triangle_free(spark):
    # bipartite graphs have no triangles
    edges = _edges(spark, [(0, 10), (0, 11), (1, 10), (1, 11), (2, 10)])
    assert triangle_count(edges).collect()[0]["n_triangles"] == 0


def test_orientation_is_acyclic_and_complete(spark):
    edges = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    o = oriented_by_degree(edges).collect()
    assert len(o) == 4  # every edge oriented exactly once
    # out-degree of the max-degree node must be 0 or tiny: node 3 (deg 3)
    out3 = sum(1 for r in o if r["s"] == 3)
    assert out3 == 0


def test_copurchase_edges_dedup(spark):
    li = spark.createDataFrame(
        [(1, 100), (1, 200), (1, 100), (2, 100), (2, 200)],
        ["l_orderkey", "l_partkey"],
    )
    got = {(r["u"], r["v"]) for r in copurchase_edges(li).collect()}
    assert got == {(100, 200)}


def test_heavy_hitters_exact_on_skew(spark):
    # 10_000 copies of 'hot', 5_000 of 'warm', 3_000 distinct singletons.
    # With k=99 the threshold is n/100 = 180.x -> only hot and warm qualify.
    rows = (
        [("hot",)] * 10_000 + [("warm",)] * 5_000 + [(f"cold{i}",) for i in range(3_000)]
    )
    terms = spark.createDataFrame(rows, ["term"]).repartition(8)
    got = {r["term"]: r["cnt"] for r in heavy_hitters(terms, k=99).collect()}
    assert got == {"hot": 10_000, "warm": 5_000}


def test_heavy_hitters_no_false_negatives_property(spark):
    # adversarial: many mid-weight items right at the threshold boundary,
    # spread over many partitions so candidates must survive MG compression
    import collections

    rows = []
    for i in range(40):
        rows += [(f"mid{i}",)] * (100 + i)
    terms = spark.createDataFrame(rows, ["term"]).repartition(16)
    n = len(rows)
    k = 9
    got = {r["term"]: r["cnt"] for r in heavy_hitters(terms, k=k).collect()}
    true = collections.Counter(t for (t,) in rows)
    expect = {t: c for t, c in true.items() if c * (k + 1) > n}
    assert got == expect


def test_degree_assortativity_python_parity(spark):
    """The registered assortativity census vs a pure-Python Newman
    computation on a crafted graph with a known dissortative shape (star +
    clique): exact integer moments, matching rounded coefficient."""
    import math

    from pyspark.sql import functions as F

    edges = (
        [(0, i) for i in range(1, 8)]                    # star: hub 0
        + [(10, 11), (11, 12), (12, 10)]                  # triangle
    )
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    deg = {n: len(s) for n, s in adj.items()}
    xy = [(deg[a], deg[b]) for a in adj for b in adj[a]]
    n = len(xy)
    sx = sum(x for x, _ in xy)
    sxy = sum(x * y for x, y in xy)
    sxx = sum(x * x for x, _ in xy)
    want = round((n * sxy - sx * sx) / (n * sxx - sx * sx), 4) + 0.0

    e = spark.createDataFrame(edges, ["u", "v"])
    a = e.select(F.col("u").alias("a"), F.col("v").alias("b")).unionAll(
        e.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    d = a.groupBy("a").agg(F.count("*").cast("bigint").alias("d"))
    ends = (
        a.join(d.select(F.col("a").alias("na"), F.col("d").alias("x")),
               F.col("a") == F.col("na"))
        .join(d.select(F.col("a").alias("nb"), F.col("d").alias("y")),
              F.col("b") == F.col("nb"))
    )
    row = ends.agg(
        F.count("*").alias("n"), F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    ).first()
    assert (row["n"], row["sx"], row["sxy"], row["sxx"]) == (n, sx, sxy, sxx)
    got = round(
        (row["n"] * row["sxy"] - row["sx"] ** 2)
        / (row["n"] * row["sxx"] - row["sx"] ** 2),
        4,
    )
    assert math.isclose(got, want)
    assert want < 0  # star + clique: dissortative by construction


def test_clustering_coefficient_python_parity(spark):
    """Triangles + wedges census vs a pure-Python transitivity computation
    on a crafted graph (K4 has clustering 1.0; adding a pendant leaf opens
    wedges without closing any)."""
    from itertools import combinations

    from pyspark.sql import functions as F

    from streamds_spark.queries.graph import triangle_count

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = k4 + [(3, 9)]  # pendant leaf opens 3 wedges at node 3
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri = sum(
        1
        for trio in combinations(sorted(adj), 3)
        if trio[1] in adj[trio[0]] and trio[2] in adj[trio[0]] and trio[2] in adj[trio[1]]
    )
    wed = sum(len(s) * (len(s) - 1) // 2 for s in adj.values())
    want = round(3 * tri / wed, 4)

    e = spark.createDataFrame(edges, ["u", "v"])
    t = triangle_count(e).first()["n_triangles"]
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    w = deg.agg(
        F.sum((F.col("d") * (F.col("d") - 1) / 2).cast("bigint")).alias("w")
    ).first()["w"]
    assert (t, w) == (tri, wed) == (4, 15)
    assert round(3 * t / w, 4) == want
    # and the pure K4 closes every wedge: coefficient exactly 1.0
    t4 = triangle_count(spark.createDataFrame(k4, ["u", "v"])).first()[0]
    assert 3 * t4 / (4 * 3) == 1.0  # 4 nodes x C(3,2)=3 wedges each


@pytest.mark.slow
def test_mg_summary_merge_error_bound(spark):
    """Mergeable Misra-Gries (round 9): per-batch deterministic summaries
    folded by per-term SUM must (a) never overestimate, (b) undercount by
    at most the summed decrement bound, (c) contain every term whose true
    count exceeds that bound, and (d) be byte-deterministic under replay."""
    import random

    from streamds_spark.operators.heavy_hitters import mg_fold, mg_summary

    rng = random.Random(99)
    # skewed vocabulary: a few hot terms + a long tail, split into 3 batches
    pool = [f"hot{i}" for i in range(3)] * 200 + [
        f"t{rng.randrange(500)}" for _ in range(2000)
    ]
    rng.shuffle(pool)
    batches = [pool[0:900], pool[900:1700], pool[1700:]]
    cap = 20

    sums = []
    for b in batches:
        df = spark.createDataFrame([(t,) for t in b], "term string")
        sums.append(mg_summary(df, cap=cap))
    folded = sums[0]
    for s in sums[1:]:
        folded = folded.unionByName(s)
    est_df, stats_df = mg_fold(folded)
    est = {r["term"]: r["est"] for r in est_df.collect()}
    stats = stats_df.first()
    bound, n_total = stats["error_bound"], stats["n_total"]

    from collections import Counter

    true = Counter(pool)
    assert n_total == len(pool)
    assert bound <= n_total // (cap + 1) + 3  # sum of per-batch n_b/(cap+1)
    for t, e in est.items():
        assert e <= true[t], (t, e, true[t])          # never overestimates
        assert true[t] - e <= bound, (t, e, true[t])  # additive bound
    for t, c in true.items():
        if c > bound:
            assert t in est, (t, c, bound)            # guaranteed presence
    for h in ("hot0", "hot1", "hot2"):
        assert h in est

    # replay determinism: the same batch summarizes to identical rows
    def _rows(df):
        return sorted(map(tuple, df.collect()), key=lambda r: (r[0] or "", r[1:]))

    a = _rows(mg_summary(
        spark.createDataFrame([(t,) for t in batches[0]], "term string"),
        cap=cap,
    ))
    b = _rows(mg_summary(
        spark.createDataFrame([(t,) for t in batches[0]], "term string"),
        cap=cap,
    ))
    assert a == b


def test_modularity_python_parity(spark):
    """modularity_census vs a pure-Python Newman Q on a crafted graph with
    REAL community structure: two triangles joined by one bridge, labeled
    by their triangle (known Q ~ 0.357), plus the degenerate one-community
    labeling (Q = 0 exactly: A=m and B=(2m)^2)."""
    from pyspark.sql import functions as F

    from streamds_spark.queries.graph import modularity_census

    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    labels = [(n, "A" if n <= 2 else "B") for n in range(6)]

    m = len(edges)
    lab = dict(labels)
    a = sum(1 for u, v in edges if lab[u] == lab[v])
    dc = {}
    for u, v in edges:
        dc[lab[u]] = dc.get(lab[u], 0) + 1
        dc[lab[v]] = dc.get(lab[v], 0) + 1
    b = sum(d * d for d in dc.values())
    want = round(a / m - b / (4 * m * m), 4) + 0.0

    e = spark.createDataFrame(edges, ["u", "v"])
    l = spark.createDataFrame(labels, ["node", "brand"])
    row = modularity_census(e, l).collect()[0]
    assert row["m_edges"] == m and row["intra_edges"] == a
    assert row["sum_comm_deg_sq"] == b
    assert row["modularity"] == want
    assert row["modularity"] > 0.3  # the structure is real

    one = spark.createDataFrame([(n, "X") for n in range(6)], ["node", "brand"])
    row = modularity_census(e, one).collect()[0]
    assert row["modularity"] == 0.0  # single community is always exactly 0


def test_mg_summary_null_terms_excluded(spark):
    """A NULL term must not become a data row — mg_fold dispatches on
    term IS NULL, so it would be misread as a sentinel (double-counting
    n_total and dropping the estimate)."""
    from streamds_spark.operators.heavy_hitters import mg_fold, mg_summary

    df = spark.createDataFrame(
        [("a",), ("a",), (None,), ("b",)], "term string"
    )
    summ = mg_summary(df, cap=10)
    sentinels = summ.filter("term IS NULL").collect()
    assert len(sentinels) == 1  # exactly the real sentinel
    assert sentinels[0]["cnt"] == 3  # NULL row not counted in the batch total
    est, stats = mg_fold(summ)
    got = {r["term"]: r["est"] for r in est.collect()}
    assert got == {"a": 2, "b": 1}
    assert stats.collect()[0]["n_total"] == 3
