"""SQL passthrough surface: register the catalog as views and run raw SQL —
the third query surface next to the Python registry and the RainStorm shim.

    from streamds_spark.sql import sql
    df = sql(spark, sf_dir, "SELECT o_orderpriority, count(*) FROM orders GROUP BY 1")
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from streamds_spark.catalog import register_views


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(query)
