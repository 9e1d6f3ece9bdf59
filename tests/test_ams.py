"""AMS tug-of-war sketch (operators/ams.py): exact-by-construction cases,
merge==whole linearity, estimator accuracy, NULL hygiene, k guard, and the
no-frequency-table single-scan pin."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from streamds_spark.operators.ams import ams_counters, ams_f2_estimate, ams_merge
from streamds_spark.plans.audit import formatted_plan


def test_single_value_is_exact(spark):
    # one distinct value with frequency f: every counter is ±f, so the
    # mean-of-squares is f^2 EXACTLY
    f = 17
    df = spark.createDataFrame([("x",)] * f, "v string")
    est = ams_f2_estimate(ams_counters(df, "v", k=16)).collect()[0]
    assert est["sum_c_sq"] == 16 * f * f
    assert est["f2_estimate"] == float(f * f)


def test_merge_equals_whole(spark):
    rows = [(i % 7, f"shard{i % 3}") for i in range(200)]
    df = spark.createDataFrame(rows, "v bigint, shard string")
    whole = {
        (r["j"],): r["c"] for r in ams_counters(df, "v", k=24).collect()
    }
    folded = {
        (r["j"],): r["c"]
        for r in ams_merge(
            ams_counters(df, "v", k=24, group_cols=("shard",))
        ).collect()
    }
    assert whole == folded  # linear state: addition is exact


def test_estimator_tracks_exact_f2(spark):
    # zipf-ish frequencies; k=60 gives ~18% stderr and md5 is
    # deterministic, so the observed ratio is stable run-to-run
    rows = [(v,) for v in range(50) for _ in range(v + 1)]
    df = spark.createDataFrame(rows, "v bigint")
    exact = sum((v + 1) ** 2 for v in range(50))
    est = ams_f2_estimate(ams_counters(df, "v", k=60)).collect()[0]
    assert 0.5 * exact < est["f2_estimate"] < 1.5 * exact


def test_nulls_skipped_and_k_guard(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",)], "v string")
    rows = ams_counters(df, "v", k=4).collect()
    assert all(abs(r["c"]) == 2 for r in rows)  # the NULL contributed nothing
    with pytest.raises(ValueError):
        ams_counters(df, "v", k=0)
    with pytest.raises(ValueError):
        ams_counters(df, "v", k=61)


def test_counters_single_scan_no_frequency_table(spark, tmp_out):
    """The scale contract: counters are one k-expression aggregate over
    the raw rows — one parquet scan, no groupBy-by-value shuffle feeding
    another aggregate."""
    src = f"{tmp_out}/t.parquet"
    spark.createDataFrame([(i % 9,) for i in range(100)], "v bigint").write.parquet(src)
    df = spark.read.parquet(src)
    plan = formatted_plan(ams_counters(df, "v", k=32))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
