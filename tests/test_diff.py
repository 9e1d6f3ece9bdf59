"""operators/diff.table_diff: change recovery semantics incl. NULLs."""

from __future__ import annotations

from streamds_spark.operators.diff import table_diff


def test_basic_diff(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, s string, v long"
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (4, "d", 40)], "k long, s string, v long"
    )
    got = {r.k: r.change_type for r in table_diff(old, new, ["k"]).collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}


def test_null_values_compare_null_safe(spark):
    old = spark.createDataFrame([(1, None), (2, "x")], "k long, s string")
    new = spark.createDataFrame([(1, None), (2, None)], "k long, s string")
    got = {r.k: r.change_type for r in table_diff(old, new, ["k"]).collect()}
    # NULL == NULL is "same" under eqNullSafe; x -> NULL is a change
    assert got == {2: "changed"}


def test_null_keys_match_each_other(spark):
    old = spark.createDataFrame([(None, "a"), (1, "b")], "k long, s string")
    new = spark.createDataFrame([(None, "a"), (1, "b2")], "k long, s string")
    rows = table_diff(old, new, ["k"]).collect()
    assert {(r.k, r.change_type) for r in rows} == {(1, "changed")}


def test_compare_cols_restriction(spark):
    old = spark.createDataFrame([(1, "a", 99)], "k long, s string, audit long")
    new = spark.createDataFrame([(1, "a", 100)], "k long, s string, audit long")
    assert table_diff(old, new, ["k"]).count() == 1  # audit col differs
    assert table_diff(old, new, ["k"], compare_cols=["s"]).count() == 0
