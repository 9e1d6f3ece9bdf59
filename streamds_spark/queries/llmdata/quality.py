"""Quality-filtering operators: repetition scoring and the composed
keep/drop filter pass — the C4/Gopher-style hygiene rules as one scan."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.functions.text import shingles_expr, tokens
from streamds_spark.registry import query


@query(
    "text_repetition_score",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS t
        FROM documents
    ),
    grams AS (
        SELECT doc_id,
               unnest(CASE WHEN len(t) >= 3
                      THEN list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                      ELSE [] END) AS g
        FROM toks
    ),
    per_gram AS (
        SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_grams,
           CAST(max(c) AS BIGINT) AS max_repeat,
           round(CAST(max(c) AS DOUBLE) / sum(c), 4) AS repetition_ratio
    FROM per_gram GROUP BY doc_id
    """,
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition detection: most-repeated 3-gram count / total 3-grams per doc
    (boilerplate and looped text score high). Two partial aggs on doc-local
    keys — no cross-doc shuffle beyond doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    grams = (
        docs.select("doc_id", tokens(F.col("text")).alias("t"))
        .select("doc_id", F.explode(shingles_expr("t", 3)).alias("g"))
    )
    per_gram = grams.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
    return per_gram.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        F.max("c").alias("max_repeat"),
        F.round(F.max("c").cast("double") / F.sum("c"), 4).alias("repetition_ratio"),
    )


@query(
    "quality_filter_pass",
    oracle=r"""
    WITH scored AS (
        SELECT doc_id, lang, n_chars,
               len(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) AS n_toks
        FROM documents
    )
    SELECT doc_id, lang, CAST(n_toks AS INT) AS n_toks
    FROM scored
    WHERE n_toks >= 10 AND n_chars >= 100 AND n_chars <= 2000
    """,
)
def quality_filter_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed keep-filter: min tokens + char-length band, evaluated in a
    single scan (compose more rules by AND-ing columns — still one stage)."""
    docs = load_table(spark, sf_dir, "documents")
    n_toks = F.size(tokens(F.col("text")))
    return (
        docs.withColumn("n_toks", n_toks)
        .filter((F.col("n_toks") >= 10) & (F.col("n_chars") >= 100) & (F.col("n_chars") <= 2000))
        .select("doc_id", "lang", "n_toks")
    )
