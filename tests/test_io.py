"""Typed reference-dataset readers and scale helpers (salted count)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamds_spark.io.sinks import salted_count
from streamds_spark.io.sources import read_lichess, read_parking, read_traffic_signs
from tests.conftest import reference_file


def test_typed_traffic_reader(spark):
    df = read_traffic_signs(spark, reference_file("Traffic_Signs_1000.txt"))
    assert df.count() == 1000
    row = df.filter(F.col("objectid") == 1).first()
    assert row["sign_post"] is not None and isinstance(row["x"], float)
    # typed filter matches the string-side RainStorm operator result
    n_typed = df.filter(F.col("sign_post") == "Punched Telespar").count()
    assert n_typed > 0


def test_typed_lichess_reader(spark):
    df = read_lichess(spark, reference_file("Lichess.txt"))
    assert df.count() == 5000  # header consumed by the reader
    assert df.filter(F.col("turns") > 40).count() > 0
    assert dict(df.dtypes)["turns"] == "int"


def test_typed_parking_reader(spark):
    df = read_parking(spark, reference_file("Parking_Meter_Spaces.txt"))
    assert dict(df.dtypes)["rate"] == "double"
    assert df.filter(F.col("rate") <= 0.5).count() > 0


def test_salted_count_matches_plain(spark):
    from streamds_spark.catalog import load_table

    df = load_table(spark, "/root/testdata/sf0.001", "events")
    plain = {
        r["event_type"]: r["n"]
        for r in df.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    salted = {r["event_type"]: r["cnt"] for r in salted_count(df, "event_type").collect()}
    assert salted == plain
