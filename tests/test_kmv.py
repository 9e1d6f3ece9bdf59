"""Unit tests for the KMV intersection sketch (operators/kmv.py):
merge == whole, exactness when the union fits in k, estimator sanity on
known overlaps, and the k guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamds_spark.operators.kmv import kmv_merge, kmv_pair_jaccard, kmv_sketch


def _df(spark, rows):
    return spark.createDataFrame(rows, "group string, key string")


def test_merge_equals_whole(spark):
    rows = [("g1", f"k{i}") for i in range(200)] + [
        ("g2", f"k{i}") for i in range(100, 300)
    ]
    whole = _df(spark, rows)
    k = 32
    want = {(r["group"], r["h"]) for r in kmv_sketch(whole, "group", "key", k).collect()}
    shard_a = _df(spark, rows[:150])
    shard_b = _df(spark, rows[150:])
    folded = kmv_merge(
        k,
        kmv_sketch(shard_a, "group", "key", k),
        kmv_sketch(shard_b, "group", "key", k),
    )
    got = {(r["group"], r["h"]) for r in folded.collect()}
    assert got == want


def test_exact_when_union_below_k(spark):
    # |A|=6, |B|=6, inter=3, union=9 < k: estimate must be EXACT 3/9
    rows = [("a", x) for x in "pqrstu"] + [("b", x) for x in "stuvwx"]
    sk = kmv_sketch(_df(spark, rows), "group", "key", 64)
    pairs = _df(spark, [("a", "b")]).toDF("group_a", "group_b")
    r = kmv_pair_jaccard(sk, pairs, 64).collect()[0]
    assert (r["k_union"], r["kmv_matches"]) == (9, 3)
    assert r["jaccard_est"] == round(3 / 9, 4)


def test_estimate_tracks_true_jaccard(spark):
    # 1000-key sets with 500 shared: true jaccard = 500/1500 = 1/3;
    # k=256 minwise estimate should land within ~0.1
    rows = [("a", f"s{i}") for i in range(1000)] + [
        ("b", f"s{i}") for i in range(500, 1500)
    ]
    sk = kmv_sketch(_df(spark, rows), "group", "key", 256)
    pairs = _df(spark, [("a", "b")]).toDF("group_a", "group_b")
    r = kmv_pair_jaccard(sk, pairs, 256).collect()[0]
    assert r["k_union"] == 256
    assert abs(r["jaccard_est"] - 1 / 3) < 0.1


def test_disjoint_sets_estimate_zero(spark):
    rows = [("a", f"x{i}") for i in range(50)] + [("b", f"y{i}") for i in range(50)]
    sk = kmv_sketch(_df(spark, rows), "group", "key", 16)
    pairs = _df(spark, [("a", "b")]).toDF("group_a", "group_b")
    r = kmv_pair_jaccard(sk, pairs, 16).collect()[0]
    assert (r["kmv_matches"], r["jaccard_est"]) == (0, 0.0)


def test_bad_k_raises(spark):
    with pytest.raises(ValueError):
        kmv_sketch(_df(spark, [("a", "x")]), "group", "key", 0)


def test_pairs_with_empty_groups_yield_zero_rows(spark):
    """'for every row of pairs' means EVERY row: a pair naming a group with
    no sketch rows gets an explicit zero row, not silence."""
    from streamds_spark.operators.kmv import kmv_pair_jaccard, kmv_sketch

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 2)], "g string, key bigint"
    )
    sk = kmv_sketch(df, "g", "key", 8)
    pairs = spark.createDataFrame(
        [("a", "b"), ("a", "ghost"), ("ghost", "phantom")],
        "group_a string, group_b string",
    )
    rows = {(r["group_a"], r["group_b"]): r
            for r in kmv_pair_jaccard(sk, pairs, 8).collect()}
    assert len(rows) == 3
    assert rows[("a", "ghost")]["k_union"] == 2  # a's sketch alone
    assert rows[("a", "ghost")]["kmv_matches"] == 0
    assert rows[("ghost", "phantom")]["k_union"] == 0
    assert rows[("ghost", "phantom")]["jaccard_est"] == 0.0


def test_pre_distinct_same_result(spark):
    from streamds_spark.operators.kmv import kmv_sketch

    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2), ("b", 2)], "g string, key bigint"
    )
    plain = sorted(tuple(r) for r in kmv_sketch(df, "g", "key", 8).collect())
    pre = sorted(
        tuple(r)
        for r in kmv_sketch(
            df.select("g", "key").distinct(), "g", "key", 8, pre_distinct=True
        ).collect()
    )
    assert plain == pre
