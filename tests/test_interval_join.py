"""Binned interval-overlap join: exactness vs the naive cross-join oracle,
exactly-once emission, contract guards, and the no-nested-loop plan pin."""

import random

import pytest
from pyspark.sql import functions as F

from streamds_spark.operators.interval_join import overlap_join


def _random_intervals(seed, n, lo=-50, hi=50, max_w=30, with_key=False):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        s = rng.randint(lo, hi)
        e = s + rng.randint(0, max_w)
        if with_key:
            rows.append((i, rng.randint(0, 3), s, e))
        else:
            rows.append((i, s, e))
    return rows


def _naive_pairs(left_rows, right_rows, keyed=False):
    out = set()
    for l in left_rows:
        for r in right_rows:
            if keyed and l[1] != r[1]:
                continue
            ls, le = l[-2], l[-1]
            rs, re = r[-2], r[-1]
            if ls <= re and rs <= le:
                out.add((l[0], r[0]))
    return out


@pytest.mark.parametrize("bin_size", [1, 7, 64])
@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.slow
def test_matches_naive_cross_join(spark, seed, bin_size):
    lrows = _random_intervals(seed, 60)
    rrows = _random_intervals(seed + 100, 60)
    left = spark.createDataFrame(lrows, "lid int, l_s int, l_e int")
    right = spark.createDataFrame(rrows, "rid int, r_s int, r_e int")
    got = overlap_join(
        left, right, "l_s", "l_e", "r_s", "r_e", bin_size=bin_size
    ).collect()
    pairs = [(r.lid, r.rid) for r in got]
    # exactly-once: no duplicate pair from multi-bin intervals
    assert len(pairs) == len(set(pairs))
    assert set(pairs) == _naive_pairs(lrows, rrows)


def test_keyed_overlap(spark):
    lrows = _random_intervals(7, 80, with_key=True)
    rrows = _random_intervals(8, 80, with_key=True)
    left = spark.createDataFrame(lrows, "lid int, k int, l_s int, l_e int")
    right = spark.createDataFrame(rrows, "rid int, k int, r_s int, r_e int")
    got = overlap_join(
        left, right, "l_s", "l_e", "r_s", "r_e", bin_size=16, keys=["k"]
    )
    pairs = [(r.lid, r.rid) for r in got.collect()]
    assert len(pairs) == len(set(pairs))
    assert set(pairs) == _naive_pairs(lrows, rrows, keyed=True)
    # keys appear exactly once in the output
    assert got.columns.count("k") == 1


def test_invalid_intervals_dropped(spark):
    left = spark.createDataFrame(
        [(0, 5, 1), (1, 0, 10)], "lid int, l_s int, l_e int"
    )  # row 0 has start > end -> dropped
    right = spark.createDataFrame([(0, 0, 10)], "rid int, r_s int, r_e int")
    got = overlap_join(left, right, "l_s", "l_e", "r_s", "r_e", bin_size=4)
    assert [(r.lid, r.rid) for r in got.collect()] == [(1, 0)]


def test_contract_guards(spark):
    df = spark.createDataFrame([(1, 0, 1)], "x int, s int, e int")
    other = spark.createDataFrame([(1, 0, 1)], "x int, s2 int, e2 int")
    with pytest.raises(ValueError, match="share non-key columns"):
        overlap_join(df, other, "s", "e", "s2", "e2", bin_size=1)
    renamed = other.withColumnRenamed("x", "y")
    with pytest.raises(ValueError, match="bin_size"):
        overlap_join(df, renamed, "s", "e", "s2", "e2", bin_size=0)


def test_negative_coordinates_and_boundary_touch(spark):
    # touching endpoints overlap (closed intervals); negatives bin correctly
    left = spark.createDataFrame([(0, -10, -5)], "lid int, l_s int, l_e int")
    right = spark.createDataFrame(
        [(0, -5, -1), (1, -4, -1)], "rid int, r_s int, r_e int"
    )
    got = overlap_join(left, right, "l_s", "l_e", "r_s", "r_e", bin_size=3)
    assert {(r.lid, r.rid) for r in got.collect()} == {(0, 0)}


def test_plan_is_equi_join_not_nested_loop(spark):
    left = spark.createDataFrame(
        _random_intervals(3, 50), "lid int, l_s int, l_e int"
    )
    right = spark.createDataFrame(
        _random_intervals(4, 50), "rid int, r_s int, r_e int"
    )
    plan = (
        overlap_join(left, right, "l_s", "l_e", "r_s", "r_e", bin_size=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
