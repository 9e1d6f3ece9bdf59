"""Incremental rollup maintenance: chunked refresh must equal the full
recompute, including key churn (new keys, untouched keys) and min/max merging."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamds_spark.operators.rollup_refresh import aggregate_delta, refresh_rollup
import pytest

AGGS = {
    "n": ("count", "*"),
    "total": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.slow
def test_incremental_refresh_equals_full_recompute(spark):
    data = [
        ("a", 10), ("a", 5), ("b", 7),          # batch 1
        ("a", 1), ("c", 100), ("c", -3),        # batch 2 (new key c)
        ("b", 2),                                # batch 3 (a untouched)
    ]
    full = spark.createDataFrame(data, ["k", "v"])
    b1 = spark.createDataFrame(data[:3], ["k", "v"])
    b2 = spark.createDataFrame(data[3:6], ["k", "v"])
    b3 = spark.createDataFrame(data[6:], ["k", "v"])

    rollup = aggregate_delta(b1, ["k"], AGGS)
    rollup = refresh_rollup(rollup, b2, ["k"], AGGS)
    rollup = refresh_rollup(rollup, b3, ["k"], AGGS)

    expect = aggregate_delta(full, ["k"], AGGS)
    assert _rows(rollup.select("k", "n", "total", "lo", "hi")) == _rows(
        expect.select("k", "n", "total", "lo", "hi")
    )


def test_refresh_rejects_non_mergeable_agg(spark):
    import pytest

    df = spark.createDataFrame([("a", 1)], ["k", "v"])
    with pytest.raises(ValueError):
        aggregate_delta(df, ["k"], {"m": ("avg", "v")})


def test_avg_maintained_as_sum_plus_count(spark):
    # the documented avg recipe: finalize sum/count at read time
    b1 = spark.createDataFrame([("a", 10.0), ("a", 20.0)], ["k", "v"])
    b2 = spark.createDataFrame([("a", 40.0)], ["k", "v"])
    aggs = {"n": ("count", "v"), "s": ("sum", "v")}
    r = refresh_rollup(aggregate_delta(b1, ["k"], aggs), b2, ["k"], aggs)
    got = r.select("k", (F.col("s") / F.col("n")).alias("avg")).collect()[0]
    assert got["avg"] == 70.0 / 3
