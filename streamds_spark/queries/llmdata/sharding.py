"""Training-data sharding and batch packing over the `documents` table.

A 100 TB pretraining corpus reaches the trainer as (a) deterministic shards —
every run must route the same doc to the same shard with no coordination —
and (b) token-budget packs inside each shard, so data loaders stream
fixed-size batches without a global pass.

Both ops are pure expressions + ONE hash-partitioned window:
  shard_assignment    — shard = md5(doc_id) mod N. No shuffle at all beyond
                        the stats aggregation (map-side partial).
  token_budget_packing— packs are cut by a cumulative token sum windowed
                        PARTITION BY shard (not a global ORDER BY — a global
                        cumsum would serialize the corpus through one task;
                        per-shard packing is what a distributed loader does
                        anyway). Parallelism = n_shards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.functions.hashing import duckdb_md5_int, md5_int28
from streamds_spark.functions.text import tokens
from streamds_spark.registry import query

N_SHARDS = 32
PACK_TOKENS = 512  # token budget per pack (small so sf0.01 yields many packs)


@query(
    "shard_assignment",
    oracle=f"""
    SELECT {duckdb_md5_int("CAST(doc_id AS VARCHAR)", 7)} % {N_SHARDS} AS shard,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY shard
    ORDER BY shard
    """,
)
def shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sharding: shard = md5(doc_id) mod N — any process
    (Spark, the trainer, a different engine) recomputes the same routing with
    no shared state. Output is the per-shard balance report (docs, chars);
    uniform md5 keys mean no hot shard at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            (md5_int28(F.col("doc_id")) % N_SHARDS).alias("shard"), F.col("n_chars")
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("shard")
    )


@query(
    "token_budget_packing",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id,
               {duckdb_md5_int("CAST(doc_id AS VARCHAR)", 7)} % {N_SHARDS} AS shard,
               CAST(len(list_filter(string_split_regex(text, '\s+'), w -> w <> ''))
                    AS BIGINT) AS n_tokens
        FROM documents
    ),
    packed AS (
        SELECT shard, n_tokens,
               CAST(floor(CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                                   ROWS UNBOUNDED PRECEDING) - n_tokens
                               AS DOUBLE) / {PACK_TOKENS}) AS BIGINT) AS pack_id
        FROM toks
    )
    SELECT shard, pack_id, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
    FROM packed
    GROUP BY shard, pack_id
    ORDER BY shard, pack_id
    """,
)
def token_budget_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into ~fixed-token training batches WITHIN each shard:
    pack_id = floor(exclusive-cumsum(tokens) / budget). The window partitions
    by shard, so the cumsum runs in parallel across shards — no global
    ordering, no single-task scan. A pack can overshoot the budget by at most
    one document (start-offset packing), matching loader-side behavior."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        (md5_int28(F.col("doc_id")) % N_SHARDS).alias("shard"),
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    packed = toks.withColumn(
        "pack_id",
        F.floor(
            ((F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("double"))
            / PACK_TOKENS
        ).cast("bigint"),
    )
    return (
        packed.groupBy("shard", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
        )
        .orderBy("shard", "pack_id")
    )
