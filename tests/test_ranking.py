"""Distributed exact ranking (operators/ranking.py): the scale-safe replacement for
global row_number/ntile windows must produce IDENTICAL values to the
single-partition window it replaces, on adversarial inputs (heavy ties,
skew, N < buckets), while keeping the plan free of unpartitioned windows.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from streamds_spark.operators.ranking import ntile_from_rank, with_global_rank
from streamds_spark.plans.audit import count_global_windows


def _ref_ranks(spark, df, order_cols):
    w = Window.orderBy(*order_cols)
    return {
        r["id"]: r["rk"]
        for r in df.withColumn("rk", F.row_number().over(w)).collect()
    }


@pytest.mark.parametrize(
    "values",
    [
        "uniform",  # distinct values
        "ties",  # heavy duplicates straddling any boundary choice
        "skew",  # 80% of rows share one value
        "tiny",  # fewer rows than buckets
    ],
)
@pytest.mark.slow
def test_with_global_rank_matches_global_window(spark, values):
    rng = random.Random(42)
    n = {"uniform": 500, "ties": 400, "skew": 300, "tiny": 3}[values]
    gen = {
        "uniform": lambda i: rng.uniform(0, 1000),
        "ties": lambda i: float(rng.randint(0, 5)),
        "skew": lambda i: 7.0 if i % 5 else float(rng.randint(0, 100)),
        "tiny": lambda i: float(i),
    }[values]
    rows = [Row(id=i, v=gen(i)) for i in range(n)]
    df = spark.createDataFrame(rows).repartition(8)
    got = {
        r["id"]: r["rk"]
        for r in with_global_rank(df, ["v", "id"], "rk", num_buckets=7).collect()
    }
    assert got == _ref_ranks(spark, df, ["v", "id"])


def test_with_global_rank_plan_has_no_global_window(spark):
    rows = [Row(id=i, v=float(i % 13)) for i in range(200)]
    df = spark.createDataFrame(rows).repartition(4)
    ranked = with_global_rank(df, ["v", "id"], "rk", num_buckets=5)
    assert count_global_windows(ranked) == 0


@pytest.mark.parametrize("n_rows,n_buckets", [(500, 5), (499, 5), (17, 4), (3, 5), (5, 5)])
@pytest.mark.slow
def test_ntile_from_rank_matches_ntile(spark, n_rows, n_buckets):
    rng = random.Random(7)
    rows = [Row(id=i, v=rng.uniform(0, 100)) for i in range(n_rows)]
    df = spark.createDataFrame(rows)
    w = Window.orderBy("v", "id")
    expected = {
        r["id"]: r["b"]
        for r in df.withColumn("b", F.ntile(n_buckets).over(w)).collect()
    }
    ranked = with_global_rank(df, ["v", "id"], "rk", num_buckets=6)
    got = {
        r["id"]: r["b"]
        for r in ranked.withColumn(
            "b", ntile_from_rank(F.col("rk"), F.lit(n_rows), n_buckets)
        ).collect()
    }
    assert got == expected


def test_with_global_rank_nulls_match_window_nulls_first(spark):
    """NULL primary values must get the SAME ranks as the global window they
    replace (default asc = NULLS FIRST), not null ranks / a TypeError from
    comparing a None bucket size (ADVICE r3)."""
    rng = random.Random(11)
    rows = [
        Row(id=i, v=None if i % 5 == 0 else rng.uniform(0, 100)) for i in range(300)
    ]
    df = spark.createDataFrame(rows, schema="id int, v double").repartition(4)
    got = {
        r["id"]: r["rk"]
        for r in with_global_rank(df, ["v", "id"], "rk", num_buckets=7).collect()
    }
    assert got == _ref_ranks(spark, df, ["v", "id"])
    assert all(rk is not None for rk in got.values())
