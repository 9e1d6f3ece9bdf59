"""Unit tests for the Pareto frontier operator (operators/skyline.py):
brute-force fuzz across objective mixes, duplicate/tie semantics, NULL
hygiene, the local-phase completeness claim, and argument guards."""

from __future__ import annotations

import itertools
import random

import pytest

from streamds_spark.operators.skyline import pareto_frontier


def _brute(rows, mins, maxs):
    def dominates(b, a):
        le = all(b[c] <= a[c] for c in mins) and all(b[c] >= a[c] for c in maxs)
        lt = any(b[c] < a[c] for c in mins) or any(b[c] > a[c] for c in maxs)
        return le and lt

    return {
        i
        for i, a in enumerate(rows)
        if not any(dominates(b, a) for j, b in enumerate(rows) if j != i)
    }


def test_fuzz_matches_bruteforce(spark):
    rng = random.Random(11)
    rows = [
        {"id": i, "x": rng.randint(0, 20), "y": rng.randint(0, 20),
         "z": rng.randint(0, 5)}
        for i in range(120)
    ]
    df = spark.createDataFrame(rows).repartition(7)  # force multi-batch phase 1
    for mins, maxs in [(("x",), ("y",)), (("x", "y"), ()), ((), ("x", "y", "z")),
                       (("z",), ("x", "y"))]:
        got = {r["id"] for r in pareto_frontier(df, mins, maxs).collect()}
        want = {rows[i]["id"] for i in _brute(rows, mins, maxs)}
        assert got == want, (mins, maxs)


def test_duplicates_all_kept(spark):
    # two identical frontier points: neither dominates the other -> both kept
    rows = [(1, 10, 10), (2, 10, 10), (3, 1, 1)]
    df = spark.createDataFrame(rows, "id bigint, x bigint, y bigint")
    got = sorted(r["id"] for r in pareto_frontier(df, maximize=("x", "y")).collect())
    assert got == [1, 2]


def test_null_objectives_dropped(spark):
    rows = [(1, 5, 5), (2, None, 9), (3, 4, 4)]
    df = spark.createDataFrame(rows, "id bigint, x bigint, y bigint")
    got = sorted(r["id"] for r in pareto_frontier(df, maximize=("x", "y")).collect())
    assert got == [1]


def test_single_objective_is_max(spark):
    rows = [(i, v) for i, v in enumerate([3, 9, 9, 1])]
    df = spark.createDataFrame(rows, "id bigint, v bigint")
    got = sorted(r["id"] for r in pareto_frontier(df, maximize=("v",)).collect())
    assert got == [1, 2]


def test_anticorrelated_full_frontier(spark):
    # y = 100 - x: every point is on the frontier (worst case for size)
    rows = [(i, i, 100 - i) for i in range(50)]
    df = spark.createDataFrame(rows, "id bigint, x bigint, y bigint").repartition(5)
    assert pareto_frontier(df, maximize=("x", "y")).count() == 50


def test_bad_args_raise(spark):
    df = spark.createDataFrame([(1, 2)], "id bigint, x bigint")
    with pytest.raises(ValueError):
        pareto_frontier(df)
    with pytest.raises(ValueError):
        pareto_frontier(df, minimize=("nope",))


def test_date_first_objective(spark):
    """A date/string column as the FIRST objective must not crash the
    local-frontier sort (unary negation is undefined for those dtypes —
    the sort is reversed instead)."""
    import datetime

    from pyspark.sql import functions as F

    rows = [
        (1, datetime.date(2024, 1, 1), 11),
        (2, datetime.date(2024, 6, 1), 5),
        (3, datetime.date(2024, 6, 1), 10),
        (4, datetime.date(2023, 1, 1), 1),
    ]
    df = spark.createDataFrame(rows, "id bigint, d date, v bigint")
    got = sorted(
        r["id"]
        for r in pareto_frontier(df, maximize=("d", "v")).collect()
    )
    # 1 survives on value, 3 on recency; 2 dominated by 3, 4 by everyone
    assert got == [1, 3]
    # string first objective, minimized
    df2 = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 0), (3, "a", 0)], "id bigint, s string, v bigint"
    )
    got2 = sorted(
        r["id"] for r in pareto_frontier(df2, minimize=("s", "v")).collect()
    )
    assert got2 == [3]
