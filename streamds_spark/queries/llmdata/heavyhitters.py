r"""Heavy-hitter terms over the corpus via the two-pass Misra-Gries operator
(operators/heavy_hitters.py) — exact output, sketch-bounded shuffle. The
oracle is the naive full-group-by formulation; at 100 TB the naive plan
shuffles the whole vocabulary while this one shuffles ~k keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.functions.text import tokens
from streamds_spark.operators.heavy_hitters import heavy_hitters
from streamds_spark.registry import query

MG_CAPACITY = 199  # exact heavy hitters above n/200


@query(
    "heavy_hitter_terms",
    oracle=rf"""
    WITH toks AS (
        SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                                  w -> w <> '')) AS term
        FROM documents
    ),
    tot AS (SELECT count(*) AS n FROM toks)
    SELECT term, count(*) AS cnt
    FROM toks, tot
    GROUP BY term, n
    HAVING count(*) * {MG_CAPACITY + 1} > n
    """,
)
def heavy_hitter_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terms occurring in more than 1/200th of all token positions, found by
    partition-local Misra-Gries summaries + exact candidate recount."""
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(F.explode(tokens(F.col("text"))).alias("term"))
    return heavy_hitters(terms, k=MG_CAPACITY)


_MG_CAP = 50  # per-shard summary capacity for the audit
_MG_SHARDS = 4
_MG_TOPK = 10


@query(
    "mg_fold_containment_docs",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id % {_MG_SHARDS} AS shard,
               unnest(list_filter(string_split_regex(text, '\s+'),
                                  w -> w <> '')) AS term
        FROM documents
    ),
    shard_counts AS (
        SELECT shard, term, count(*) AS cnt
        FROM toks GROUP BY shard, term
    ),
    ranked AS (
        SELECT shard, term, cnt,
               row_number() OVER (PARTITION BY shard
                                  ORDER BY cnt DESC, term) AS rn
        FROM shard_counts
    ),
    shard_d AS (
        SELECT shard,
               max(CASE WHEN rn = {_MG_CAP + 1} THEN cnt ELSE 0 END) AS d
        FROM ranked GROUP BY shard
    ),
    summaries AS (
        SELECT c.term, c.cnt - d.d AS est0
        FROM shard_counts c JOIN shard_d d ON c.shard = d.shard
        WHERE c.cnt > d.d
    ),
    folded AS (
        SELECT term, sum(est0) AS est FROM summaries GROUP BY term
    ),
    exact AS (
        SELECT term, count(*) AS cnt FROM toks GROUP BY term
    ),
    topk AS (
        SELECT term, cnt FROM exact ORDER BY cnt DESC, term LIMIT {_MG_TOPK}
    ),
    bound AS (SELECT sum(d) AS b FROM shard_d)
    SELECT
        CAST((SELECT count(*) FROM topk) AS BIGINT) AS n_topk,
        CAST((SELECT count(*) FROM topk t JOIN folded f ON t.term = f.term)
             AS BIGINT) AS n_contained,
        CAST((SELECT b FROM bound) AS BIGINT) AS error_bound,
        CAST((SELECT max(e.cnt - f.est) FROM folded f
              JOIN exact e ON f.term = e.term) AS BIGINT)
            AS max_underestimate,
        CAST((SELECT min(f.est <= e.cnt) FROM folded f
              JOIN exact e ON f.term = e.term) AS BIGINT)
            AS never_overestimates
    """,
)
def mg_fold_containment_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability audit for the Misra-Gries summary store (the streaming
    heavy-hitter state, operators/heavy_hitters.mg_summary): shard the
    corpus 4 ways, build one deterministic count-then-trim MG summary per
    shard (capacity 50), fold by per-term SUM, and hash-check the mergeable-
    summaries guarantees against the exact counts — the true top-10 terms
    are all CONTAINED in the fold, no estimate exceeds its true count, and
    the worst undercount is within the summed decrement bound
    (max_underestimate <= error_bound, both shipped as columns so the
    oracle pins the actual numbers, not just a boolean).

    Plan: one tokenized scan -> shard-partitioned count + window (never
    global) -> two small joins over <= cap x shards rows; the fold is the
    exact read path of corpus_heavy_hitters over per-trigger stores."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        (F.col("doc_id") % _MG_SHARDS).alias("shard"),
        F.explode(tokens(F.col("text"))).alias("term"),
    )
    shard_counts = toks.groupBy("shard", "term").agg(
        F.count("*").alias("cnt")
    ).localCheckpoint(eager=False)
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy(F.desc("cnt"), "term")
    ranked = shard_counts.withColumn("rn", F.row_number().over(w))
    shard_d = ranked.groupBy("shard").agg(
        F.max(
            F.when(F.col("rn") == _MG_CAP + 1, F.col("cnt")).otherwise(0)
        ).alias("d")
    )
    summaries = (
        shard_counts.join(shard_d, "shard")
        .filter(F.col("cnt") > F.col("d"))
        .select("term", (F.col("cnt") - F.col("d")).alias("est0"))
    )
    folded = summaries.groupBy("term").agg(F.sum("est0").alias("est"))
    exact = toks.groupBy("term").agg(F.count("*").alias("cnt")).localCheckpoint(
        eager=False
    )
    topk = exact.orderBy(F.desc("cnt"), "term").limit(_MG_TOPK)
    joined = folded.join(exact, "term")
    return (
        topk.agg(F.count("*").cast("bigint").alias("n_topk"))
        .crossJoin(
            topk.join(folded, "term", "left_semi")
            .agg(F.count("*").cast("bigint").alias("n_contained"))
        )
        .crossJoin(
            shard_d.agg(F.sum("d").cast("bigint").alias("error_bound"))
        )
        .crossJoin(
            joined.agg(
                F.max(F.col("cnt") - F.col("est"))
                .cast("bigint")
                .alias("max_underestimate"),
                F.min((F.col("est") <= F.col("cnt")).cast("bigint"))
                .cast("bigint")
                .alias("never_overestimates"),
            )
        )
        .select(
            "n_topk",
            "n_contained",
            "error_bound",
            "max_underestimate",
            "never_overestimates",
        )
    )
