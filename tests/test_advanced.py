"""Advanced-operator semantics: sessionization, as-of join, approx distinct."""

from __future__ import annotations

from pyspark.sql import functions as F
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.slow
def test_sessionize_crafted(spark):
    from streamds_spark.registry import load_all

    rows = [
        (1, 10, "2024-01-01 00:00:00"),
        (2, 10, "2024-01-01 00:10:00"),  # same session (10 min)
        (3, 10, "2024-01-01 01:00:00"),  # new session (50 min gap)
        (4, 20, "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts_s"]).select(
        "event_id", "user_id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    df.createOrReplaceTempView("_sess_input")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    flagged = df.withColumn(
        "new_sess",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > gap_us),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "sno", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    )
    got = {
        (r["user_id"], r["sno"]): r["n"]
        for r in sess.groupBy("user_id", "sno").agg(F.count("*").alias("n")).collect()
    }
    assert got == {(10, 1): 2, (10, 2): 1, (20, 1): 1}


def test_asof_crafted(spark):
    rows = [
        (1, 5, "2024-01-01 00:00:00", "click"),
        (2, 5, "2024-01-01 00:05:00", "error"),  # asof → 00:00 click
        (3, 5, "2024-01-01 00:06:00", "click"),
        (4, 5, "2024-01-01 00:07:00", "error"),  # asof → 00:06 click
        (5, 6, "2024-01-01 00:01:00", "error"),  # no prior click → NULL
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts_s", "event_type"]).select(
        "event_id", "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type"
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        df.withColumn("lc", F.max(F.when(F.col("event_type") == "click", F.col("ts"))).over(w))
        .filter(F.col("event_type") == "error")
        .select("event_id", F.date_format("lc", "HH:mm").alias("click_at"))
        .collect()
    )
    got = {r["event_id"]: r["click_at"] for r in out}
    assert got == {2: "00:00", 4: "00:06", 5: None}


def test_approx_distinct_error_bound(spark):
    from streamds_spark.registry import load_all

    specs = load_all()
    approx = {r["l_returnflag"]: r["approx_parts"] for r in specs["approx_distinct_parts"].fn(spark, SF).collect()}
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag").agg(F.countDistinct("l_partkey").alias("n")).collect()
    }
    for k, e in exact.items():
        assert abs(approx[k] - e) / e < 0.05, (k, approx[k], e)
