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


def register_udfs(spark: SparkSession) -> None:
    """Register the engine's custom functions for SQL callers:
      tokenize(text)        -> array<string>   (whitespace, empties dropped)
      md5_int60(s)/md5_int28(s) -> bigint      (cross-engine hash)
    so `spark.sql("SELECT explode(tokenize(text)) ...")` works after
    register_views + register_udfs."""
    spark.udf.register(
        "tokenize",
        lambda s: [w for w in (s or "").split() if w],
        "array<string>",
    )
    import hashlib

    spark.udf.register(
        "md5_int60", lambda s: int(hashlib.md5((s or "").encode()).hexdigest()[:15], 16), "bigint"
    )
    spark.udf.register(
        "md5_int28", lambda s: int(hashlib.md5((s or "").encode()).hexdigest()[:7], 16), "bigint"
    )
