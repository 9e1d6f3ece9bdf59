"""Write-side scale helpers: bucketed tables (co-located joins) and salted
keys (skew mitigation).

At 100 TB the biggest wins are layout wins:
  - bucketing both sides of a repeated equi-join on the key removes the
    exchange from every subsequent join/agg on that key;
  - salting splits a pathological hot key across partitions at the cost of a
    second (tiny) re-combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame, table_name: str, bucket_cols: list[str], n_buckets: int = 64, path: str | None = None
) -> None:
    """Persist as a bucketed (and sorted) table: subsequent equi-joins and
    groupBys on bucket_cols skip their exchange (Catalyst recognizes the
    hash-distribution from the table layout)."""
    writer = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def with_salt(df: DataFrame, n_salts: int = 16, salt_col: str = "_salt") -> DataFrame:
    """Append a per-row salt in [0, n_salts): a hot key's rows spread across
    n_salts sub-keys. Aggregate per (key, salt) then re-combine per key, or
    join against a salt-exploded dim side."""
    return df.withColumn(salt_col, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))


def salted_count(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """Skew-proof keyed count: partial count per (key, salt) then final sum per
    key — the second shuffle carries at most n_salts rows per hot key."""
    partial = with_salt(df, n_salts).groupBy(key, "_salt").agg(F.count("*").alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").cast("bigint").alias("cnt"))
