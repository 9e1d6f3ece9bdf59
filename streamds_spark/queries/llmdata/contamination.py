"""Train/eval contamination check + BPE-ish token counting — training-data
hygiene operators."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.functions.text import shingles_expr, tokens
from streamds_spark.registry import query

# src0 plays the held-out eval set; everything else is "train".
EVAL_SOURCE = "src0"
NGRAM = 5


@query(
    "contamination_check",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id, source,
               list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS t
        FROM documents
    ),
    grams AS (
        SELECT doc_id, source,
               unnest(CASE WHEN len(t) >= {NGRAM}
                      THEN list_transform(range(1, len(t) - {NGRAM} + 2),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])
                      ELSE [] END) AS g
        FROM toks
    ),
    train_grams AS (
        SELECT DISTINCT g FROM grams WHERE source <> '{EVAL_SOURCE}'
    ),
    eval_grams AS (
        SELECT doc_id, g FROM grams WHERE source = '{EVAL_SOURCE}'
    )
    SELECT e.doc_id,
           count(*) AS n_grams,
           CAST(count(t.g) AS BIGINT) AS n_contaminated,
           round(CAST(count(t.g) AS DOUBLE) / count(*), 4) AS contamination_rate
    FROM eval_grams e LEFT JOIN train_grams t ON e.g = t.g
    GROUP BY e.doc_id
    """,
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set contamination: fraction of each eval doc's 5-gram shingles that
    appear anywhere in the train split. One equi-join on the shingle string;
    at 100 TB join on the 60-bit md5 hash instead and bloom-filter the train
    side (the shingle set is the small side after distinct)."""
    docs = load_table(spark, sf_dir, "documents")
    grams = (
        docs.select("doc_id", "source", tokens(F.col("text")).alias("t"))
        .select("doc_id", "source", F.explode(shingles_expr("t", NGRAM)).alias("g"))
    )
    train = grams.filter(F.col("source") != EVAL_SOURCE).select("g").distinct()
    eval_ = grams.filter(F.col("source") == EVAL_SOURCE).select("doc_id", "g")
    joined = eval_.join(train.withColumn("_hit", F.lit(1)), "g", "left")
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_grams"),
        F.count("_hit").alias("n_contaminated"),
        F.round(F.count("_hit").cast("double") / F.count("*"), 4).alias("contamination_rate"),
    )


@query(
    "text_token_count_bpe",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT)
               AS n_bpe_tokens,
           CAST(len(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) AS INT)
               AS n_ws_tokens
    FROM documents
    """,
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish pre-tokenization count: letter runs, digit runs, and lone
    punctuation as separate tokens (the GPT-2-style pre-tokenizer shape),
    alongside the whitespace count."""
    docs = load_table(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all("text", F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    return docs.select(
        "doc_id",
        F.size(bpe).alias("n_bpe_tokens"),
        F.size(tokens(F.col("text"))).alias("n_ws_tokens"),
    )
