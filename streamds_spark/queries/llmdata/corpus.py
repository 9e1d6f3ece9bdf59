"""Corpus-level LLM-data queries: TF-IDF, dedup-pipeline verification, funnel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.functions.text import tokens
from streamds_spark.registry import query
from streamds_spark.queries.llmdata.webfilter import (
    _MOJIBAKE_PATTERN,
    C4_PAGE_DROP_SQL,
    c4_page_dropped_col,
)


@query(
    "tfidf_top_terms",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
    ),
    df_ AS (
        SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df_.df), 4) AS tfidf
        FROM tf JOIN df_ USING (term) CROSS JOIN n
    ),
    ranked AS (
        SELECT doc_id, term, tfidf,
               row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
        FROM scored
    )
    SELECT doc_id, term, tfidf FROM ranked WHERE rk <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF with top-3 terms per document. Three aggs + one broadcast join
    (document frequencies are vocabulary-sized → broadcast); the per-doc top-k
    is a window over tiny per-doc groups."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    # n_docs as a broadcast 1-row aggregate, not a driver-side count(): keeps
    # the whole plan lazy and avoids a second full scan of the corpus
    n_docs = docs.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tfidf")
    )


@query(
    "funnel_click_to_purchase",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               min(ts) FILTER (WHERE event_type = 'click') AS first_click,
               min(ts) FILTER (WHERE event_type = 'purchase') AS first_purchase
        FROM events GROUP BY user_id
    )
    SELECT
        CAST(count(*) FILTER (WHERE first_click IS NOT NULL) AS BIGINT) AS n_clicked,
        CAST(count(*) FILTER (WHERE first_click IS NOT NULL
                              AND first_purchase > first_click) AS BIGINT) AS n_converted,
        round(CAST(count(*) FILTER (WHERE first_click IS NOT NULL
                                    AND first_purchase > first_click) AS DOUBLE) /
              nullif(count(*) FILTER (WHERE first_click IS NOT NULL), 0), 4) AS conversion
    FROM firsts
    """,
)
def funnel_click_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: users whose first purchase follows their first click.
    Two-level conditional agg — one shuffle on user_id, then a 1-row reduce."""
    events = load_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("first_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    clicked = F.count(F.when(F.col("first_click").isNotNull(), 1))
    converted = F.count(
        F.when(
            F.col("first_click").isNotNull() & (F.col("first_purchase") > F.col("first_click")), 1
        )
    )
    return firsts.agg(
        clicked.alias("n_clicked"),
        converted.alias("n_converted"),
        F.round(
            converted.cast("double") / F.nullif(clicked.cast("double"), F.lit(0.0)), 4
        ).alias("conversion"),
    )


@query(
    "grouping_sets_orders",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS cnt
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), (o_orderstatus, o_orderpriority))
    """,
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (finer control than rollup/cube)."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS cnt
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), (o_orderstatus, o_orderpriority))
        """
    )


@query(
    "llm_pipeline_end_to_end",
    oracle=r"""
    WITH scored AS (
        SELECT doc_id, lang, source, n_chars, text,
               len(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) AS n_toks
        FROM documents
    ),
    quality AS (
        SELECT * FROM scored WHERE n_toks >= 10 AND n_chars BETWEEN 100 AND 2000
    ),
    deduped AS (
        SELECT * FROM quality
        WHERE doc_id IN (SELECT min(doc_id) FROM quality GROUP BY md5(text))
    ),
    sampled AS (
        SELECT * FROM deduped
        WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100) < 80
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS total_tokens,
           round(avg(n_chars), 4) AS avg_chars
    FROM sampled GROUP BY lang
    """,
)
def llm_pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data pipeline in one plan: quality filter →
    exact dedup (keep min-id per content hash) → deterministic 80% sample →
    per-language corpus stats. Everything fuses into scan → window/agg →
    filter → agg stages; at 100 TB the same composition runs unchanged with
    the LSH near-dup stage inserted after exact dedup."""
    from pyspark.sql import Window as W

    from streamds_spark.functions.hashing import md5_int60

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.withColumn("n_toks", F.size(tokens(F.col("text"))))
    quality = scored.filter(
        (F.col("n_toks") >= 10) & F.col("n_chars").between(100, 2000)
    )
    # exact dedup via min-id-per-hash (window min avoids a self-join)
    wh = W.partitionBy(F.md5(F.col("text").cast("binary")))
    deduped = (
        quality.withColumn("keep_id", F.min("doc_id").over(wh))
        .filter(F.col("doc_id") == F.col("keep_id"))
    )
    sampled = deduped.filter(md5_int60(F.col("doc_id").cast("string")) % 100 < 80)
    return sampled.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").alias("total_tokens"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


@query(
    "llm_pipeline_v2",
    oracle=rf"""
    WITH gated AS (
        SELECT doc_id, source, n_chars, text,
               len(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) AS n_toks
        FROM documents
        WHERE len(regexp_extract_all(text, '{_MOJIBAKE_PATTERN}')) = 0
          AND NOT {C4_PAGE_DROP_SQL}
    ),
    quality AS (
        SELECT * FROM gated WHERE n_toks >= 10 AND n_chars BETWEEN 100 AND 2000
    ),
    deduped AS (
        SELECT * FROM quality
        WHERE doc_id IN (SELECT min(doc_id) FROM quality GROUP BY md5(text))
    ),
    capped AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY source
                ORDER BY ('0x' || substr(md5('domaincap:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                         doc_id) AS rk
            FROM deduped
        ) WHERE rk <= 40
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum((n_toks + 23) // 24) AS BIGINT) AS n_chunks,
           CAST(sum(list_sum(list_transform(range(0, n_toks, 24),
                                            s -> least(32, n_toks - s)))) AS BIGINT)
               AS chunk_tokens
    FROM capped GROUP BY source
    """,
)
def llm_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-4 composed pipeline in ONE plan: encoding-damage gate →
    C4 page gate → length quality → exact dedup (min-id per content hash) →
    per-domain cap (40, deterministic md5 shuffle) → 32/24 sliding-window
    chunk accounting, rolled up per source. Each stage is the already-
    verified standalone operator's expression; composing them fuses into
    scan → window → window → agg with no Python in the loop. At 100 TB
    insert the LSH near-dup and bloom-decontamination stages between dedup
    and cap — same shape.

    The stages are module-level functions (pipeline_gate /
    pipeline_exact_dedup / pipeline_cap_report) shared VERBATIM with the
    continuous twin (streaming/llm_pipeline.py), whose stream==batch
    equality test rides on exactly this decomposition."""
    docs = load_table(spark, sf_dir, "documents")
    return pipeline_cap_report(pipeline_exact_dedup(pipeline_gate(docs)))


def pipeline_gate(docs: DataFrame) -> DataFrame:
    """Hygiene + quality gates, all map-only (hence directly usable on an
    unbounded stream): mojibake-free, C4 page rules, >=10 tokens, 100-2000
    chars. Adds n_toks."""
    moji = F.expr(f"regexp_count(text, '{_MOJIBAKE_PATTERN}')")
    gated = docs.filter((moji == 0) & ~c4_page_dropped_col()).withColumn(
        "n_toks", F.size(tokens(F.col("text")))
    )
    return gated.filter((F.col("n_toks") >= 10) & F.col("n_chars").between(100, 2000))


def pipeline_exact_dedup(quality: DataFrame) -> DataFrame:
    """Exact dedup: keep the min-doc_id occurrence per content hash (window
    min avoids a self-join). Global over the input relation — the streaming
    twin applies it per micro-batch and handles cross-batch occurrences with
    its persisted hash store."""
    wh = Window.partitionBy(F.md5(F.col("text").cast("binary")))
    return (
        quality.withColumn("keep_id", F.min("doc_id").over(wh))
        .filter(F.col("doc_id") == F.col("keep_id"))
        .drop("keep_id")
    )


def pipeline_cap_report(deduped: DataFrame) -> DataFrame:
    """Per-domain cap (40, deterministic md5 shuffle) + 32/24 sliding-window
    chunk accounting rolled up per source — the finalize/report stage, run on
    the corpus store contents in the streaming posture."""
    from streamds_spark.functions.hashing import md5_int60

    wcap = Window.partitionBy("source").orderBy(
        md5_int60(F.concat(F.lit("domaincap:"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    capped = deduped.withColumn("rk", F.row_number().over(wcap)).filter(F.col("rk") <= 40)
    chunk_tokens = F.expr(
        "aggregate(sequence(0, n_toks - 1, 24), CAST(0 AS BIGINT), "
        "(acc, s) -> acc + least(32, n_toks - s))"
    )
    return capped.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.floor((F.col("n_toks") + 23) / 24)).cast("bigint").alias("n_chunks"),
        F.sum(chunk_tokens).cast("bigint").alias("chunk_tokens"),
    )
