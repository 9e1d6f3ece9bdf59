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
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects.
        # Read nanos as long, then floor-convert to a microsecond timestamp —
        # the same truncation DuckDB applies, so oracle comparisons agree.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        from pyspark.sql import functions as F

        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("bigint"))
            )
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every TESTDATA table as a temp view (for spark.sql queries)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
