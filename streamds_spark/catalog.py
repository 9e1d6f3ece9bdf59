"""Table catalog over the driver TESTDATA parquet layout.

TESTDATA tables (one parquet per table under a scale-factor dir):
    region nation customer supplier part orders lineitem events documents embeddings

Scale posture: `load_table` is a plain parquet scan — Catalyst pushes filters and
prunes columns into the scan (verify with .explain(): `PushedFilters`, `ReadSchema`).
On a 100 TB deployment these would be partitioned/bucketed tables; the query code
below never assumes a physical layout, so swapping the catalog to Hive/Iceberg
tables changes nothing upstream.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # Pin UTC on whatever session calls us (the driver's session may not be
    # ours): parquet timestamps are UTC instants, and DuckDB oracles read them
    # as naive UTC — session-tz-dependent rendering/filtering would skew
    # date_trunc buckets and literal timestamp filters on non-UTC hosts.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Ship the package to Python workers (driver sys.path isn't inherited).
    from streamds_spark.session import ensure_workers_can_import

    ensure_workers_can_import(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts has shipped as parquet TIMESTAMP(NANOS) (round 1) and as
        # TIMESTAMP(MICROS) without timezone (round 2+); nanosAsLong lets the
        # NANOS layout load, normalize_events_ts makes both a plain TIMESTAMP.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_events_ts(spark.read.parquet(path))
    return spark.read.parquet(path)


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize the events table's `ts` column to a plain TIMESTAMP.

    The driver has shipped events.parquet with two physical layouts:
      * TIMESTAMP(NANOS): Spark's reader rejects it outright; with
        spark.sql.legacy.parquet.nanosAsLong=true it surfaces as bigint —
        floor-divide to micros (the same truncation DuckDB applies) and
        convert.
      * TIMESTAMP(MICROS) without timezone: Spark infers TIMESTAMP_NTZ, which
        unix_micros()/window() reject — cast to TIMESTAMP. The session tz is
        pinned UTC by load_table, so the wall-clock fields are reinterpreted
        as the same UTC instant and DuckDB naive-UTC comparisons stay exact.

    Shared by the batch catalog and streaming tests so the two paths can never
    diverge when the driver changes the physical type again.
    """
    from pyspark.sql import functions as F

    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        return df.withColumn(
            "ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("bigint"))
        )
    if ts_type == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every TESTDATA table as a temp view (for spark.sql queries)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
