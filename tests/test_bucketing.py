"""Bucketed-table layout: joins on the bucket key must skip their shuffle —
the claim ARCHITECTURE.md makes for repeated co-located joins, asserted on the
actual plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamds_spark.io.sinks import write_bucketed
from streamds_spark.plans.audit import formatted_plan


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    left = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") % 100).alias("v1")
    )
    right = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v2")
    )
    write_bucketed(left, "bkt_left", ["k"], n_buckets=8, path=str(wh / "l"))
    write_bucketed(right, "bkt_right", ["k"], n_buckets=8, path=str(wh / "r"))
    yield spark.table("bkt_left"), spark.table("bkt_right")
    spark.sql("DROP TABLE IF EXISTS bkt_left")
    spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    left, right = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        joined = left.join(right, "k")
        plan = formatted_plan(joined)
        # both sides bucketed by k into the same bucket count → no Exchange
        assert "Exchange hashpartitioning(k" not in plan, plan[:2000]
        assert joined.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_groupby_has_no_shuffle(spark, bucketed_tables):
    left, _ = bucketed_tables
    plan = formatted_plan(left.groupBy("k").agg(F.sum("v1")))
    assert "Exchange hashpartitioning(k" not in plan, plan[:2000]
