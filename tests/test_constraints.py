"""Declarative constraint suite (operators/constraints.py): violation
semantics per check kind, FK anti-join counting, NULL conventions, the
single-scan compilation pin, and degenerate inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamds_spark.operators import constraints as C
from streamds_spark.plans.audit import formatted_plan


def _report(df, checks, fks=()):
    rows = C.constraint_report(df, checks, fks).collect()
    return {(r["check_name"], r["target"]): r for r in rows}


def test_row_local_checks_count_violations(spark):
    df = spark.createDataFrame(
        [
            (1, "O", 10.0, "1-URGENT"),
            (2, None, -5.0, "9-BAD"),
            (None, "X", None, "2-HIGH"),
            (4, "F", 0.0, None),
        ],
        "id bigint, status string, total double, prio string",
    )
    rep = _report(
        df,
        [
            C.not_null("id"),
            C.not_null("status"),
            C.in_set("status", ["O", "F", "P"]),
            C.satisfies("positive_total", "total", F.col("total") > 0),
            C.matches("prio", "^[1-5]-"),
            C.non_negative("total"),
        ],
    )
    assert all(r["n_rows"] == 4 for r in rep.values())
    assert rep[("not_null", "id")]["violations"] == 1
    assert rep[("not_null", "status")]["violations"] == 1
    # NULL predicate counts as a violation (CHECK-constraint convention)
    assert rep[("in_set", "status")]["violations"] == 2  # 'X' and NULL
    assert rep[("positive_total", "total")]["violations"] == 3  # -5, NULL, 0
    assert rep[("matches", "prio")]["violations"] == 2  # '9-BAD' and NULL
    assert rep[("non_negative", "total")]["violations"] == 2  # -5 and NULL
    assert rep[("not_null", "id")]["passed"] is False


def test_unique_ignores_null_keys(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (2,), (None,), (None,)], "k bigint"
    )
    rep = _report(df, [C.unique("k")])
    # two non-null dup rows of k=1 -> 1 extra row; NULLs are not dups here
    assert rep[("unique", "k")]["violations"] == 1


def test_unique_multi_column(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, None)], "k bigint, s string"
    )
    rep = _report(df, [C.unique("k", "s")])
    # (1,a) twice -> 1 violation; (2,NULL) excluded from the non-null universe
    assert rep[("unique", "k,s")]["violations"] == 1
    assert rep[("unique", "k,s")]["target"] == "k,s"


def test_foreign_key_null_fk_is_not_violation(spark):
    child = spark.createDataFrame([(1,), (2,), (99,), (None,)], "fk bigint")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk bigint")
    rep = _report(child, [], [C.ForeignKey("fk", parent, "pk")])
    r = rep[("foreign_key", "fk->pk")]
    assert r["violations"] == 1  # only 99; NULL is REFERENCES-exempt
    assert r["n_rows"] == 4
    assert r["passed"] is False


def test_all_green_and_empty_input(spark):
    df = spark.createDataFrame([(1,), (2,)], "k bigint")
    rep = _report(df, [C.not_null("k"), C.unique("k")])
    assert all(r["passed"] for r in rep.values())
    empty = df.filter(F.lit(False))
    rep = _report(empty, [C.not_null("k"), C.unique("k")])
    assert all(r["n_rows"] == 0 and r["violations"] == 0 for r in rep.values())
    assert all(r["passed"] for r in rep.values())


def test_empty_suite_raises(spark):
    df = spark.createDataFrame([(1,)], "k bigint")
    with pytest.raises(ValueError):
        C.constraint_report(df, [])


def test_single_scan_compilation(spark, tmp_out):
    """The suite's scale contract: all row-local + uniqueness checks share
    ONE scan of the input — the plan carries exactly one parquet scan no
    matter how many checks ride it."""
    src = f"{tmp_out}/t.parquet"
    spark.createDataFrame(
        [(i, f"s{i % 3}", float(i)) for i in range(100)],
        "k bigint, s string, v double",
    ).write.parquet(src)
    df = spark.read.parquet(src)
    rep = C.constraint_report(
        df,
        [
            C.not_null("k"),
            C.unique("k"),
            C.in_set("s", ["s0", "s1", "s2"]),
            C.non_negative("v"),
            C.matches("s", "^s"),
        ],
    )
    plan = formatted_plan(rep)
    # formatted explain names each node once in the tree and once in the
    # detail section — count the detail headers "(N) Scan parquet"
    import re

    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
    assert len(rep.collect()) == 5
