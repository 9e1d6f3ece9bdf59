"""Text retrieval over `documents` + `embeddings`: BM25 lexical scoring and
reciprocal-rank-fusion (RRF) hybrid search.

Scale posture:
  bm25_scores — per-term tf comes from `size(filter(tokens, ...))` array
    expressions (no explode, no per-term shuffle); corpus stats (N, avgdl,
    per-term df) are a 1-row aggregate broadcast back with crossJoin. Physical
    plan: two column-pruned scans of documents — one collapsing to the 1-row
    stats aggregate (partial agg map-side), one scoring against the broadcast.
    At 100 TB that's a COUNT(*)-shaped pass plus a map-only pass — nothing
    quadratic, no wide shuffle.
  rrf_hybrid_search — fuses the BM25 top-M with the embedding-cosine top-M
    (probe = vec_id 0, the ann_bruteforce probe). Each top-M is a
    TakeOrderedAndProject (per-partition local top-M, k-row driver merge — no
    global sort); the rank window then runs over M=50 rows, not the corpus.
    Fusion is the standard RRF sum 1/(K+rank) with absent-list terms dropped
    (full-outer union of the two lists). Ranks are integers computed from
    round(score, 6) with id tie-breaks, so the fused output is deterministic
    and cross-engine stable.

No reference analog (the reference has no ranking surface) — this is part of
the LLM-data-pipeline layer (corpus search / retrieval QA).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.functions.text import tokens
from streamds_spark.functions.vectors import as_double, cosine, duckdb_cosine
from streamds_spark.registry import query

QUERY_TERMS = ("spark", "window", "hash")  # the lexical probe
K1 = 1.2  # BM25 tf saturation
B = 0.75  # BM25 length normalization
RRF_K = 60  # standard RRF damping constant
TOP_M = 50  # per-ranking candidate list length fused by RRF
PROBE_VEC_ID = 0  # semantic probe (same as ann_bruteforce_topk)


def _tf_count(toks, term: str):
    # NB: the lambda must take exactly one parameter — F.filter passes the
    # element index as a second argument when the callable's arity is 2.
    return F.size(F.filter(toks, lambda w: w == F.lit(term)))


def _bm25_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, bm25) for every document matching >= 1 query term."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    per_doc = docs.select(
        "doc_id",
        F.size(toks).alias("dl"),
        *[_tf_count(toks, t).alias(f"tf_{t}") for t in QUERY_TERMS],
    )
    stats = per_doc.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"df_{t}")
            for t in QUERY_TERMS
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats))
    term_scores = [
        F.log(
            (F.col("n_docs") - F.col(f"df_{t}") + 0.5) / (F.col(f"df_{t}") + 0.5)
            + 1.0
        )
        * (
            F.col(f"tf_{t}")
            * (K1 + 1)
            / (F.col(f"tf_{t}") + K1 * (1 - B + B * F.col("dl") / F.col("avgdl")))
        )
        for t in QUERY_TERMS
    ]
    score = term_scores[0]
    for ts in term_scores[1:]:
        score = score + ts
    n_hit = sum(
        (F.col(f"tf_{t}") > 0).cast("int") for t in QUERY_TERMS
    )
    return scored.filter(
        sum(F.col(f"tf_{t}") for t in QUERY_TERMS) > 0
    ).select(
        "doc_id",
        F.col("dl").alias("n_tokens"),
        score.alias("bm25"),
        n_hit.alias("n_terms_hit"),
    )


def _bm25_oracle_cte() -> str:
    """DuckDB CTEs producing bm25(doc_id, n_tokens, bm25) — same math, same
    fixed term order so the floating sum is bit-identical."""
    toks_expr = r"list_filter(string_split_regex(text, '\s+'), w -> w <> '')"
    tf_cols = ", ".join(
        f"len(list_filter({toks_expr}, w -> w = '{t}')) AS tf_{t}"
        for t in QUERY_TERMS
    )
    df_cols = ", ".join(
        f"CAST(sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}"
        for t in QUERY_TERMS
    )
    score_terms = " + ".join(
        f"ln((n_docs - df_{t} + 0.5)/(df_{t} + 0.5) + 1.0)"
        f" * (tf_{t} * ({K1} + 1)"
        f" / (tf_{t} + {K1} * (1 - {B} + {B} * dl / avgdl)))"
        for t in QUERY_TERMS
    )
    any_tf = " + ".join(f"tf_{t}" for t in QUERY_TERMS)
    return f"""
    per_doc AS (
        SELECT doc_id,
               len({toks_expr}) AS dl,
               {tf_cols}
        FROM documents
    ),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl, {df_cols}
        FROM per_doc
    ),
    bm25 AS (
        SELECT doc_id, dl AS n_tokens, {score_terms} AS bm25
        FROM per_doc, stats
        WHERE {any_tf} > 0
    )
    """


@query(
    "bm25_scores",
    oracle=f"""
    WITH {_bm25_oracle_cte()}
    SELECT doc_id, n_tokens, round(bm25, 4) AS bm25
    FROM bm25
    """,
)
def bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (Robertson/Sparck Jones) lexical relevance of every document to the
    fixed query {QUERY_TERMS}: idf(t)·tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl))."""
    return _bm25_df(spark, sf_dir).select(
        "doc_id", "n_tokens", F.round("bm25", 4).alias("bm25")
    )


@query(
    "rrf_hybrid_search",
    oracle=f"""
    WITH {_bm25_oracle_cte()},
    lex AS (
        SELECT doc_id, rank() OVER (ORDER BY round(bm25, 6) DESC, doc_id) AS lex_rank
        FROM (SELECT doc_id, bm25 FROM bm25
              ORDER BY round(bm25, 6) DESC, doc_id LIMIT {TOP_M})
    ),
    sem0 AS (
        SELECT b.vec_id,
               {duckdb_cosine('b.embedding', 'probe.embedding')} AS cos
        FROM embeddings b,
             (SELECT embedding FROM embeddings WHERE vec_id = {PROBE_VEC_ID}) probe
        WHERE b.vec_id <> {PROBE_VEC_ID}
    ),
    sem AS (
        SELECT vec_id, rank() OVER (ORDER BY round(cos, 6) DESC, vec_id) AS sem_rank
        FROM (SELECT vec_id, cos FROM sem0
              ORDER BY round(cos, 6) DESC, vec_id LIMIT {TOP_M})
    )
    SELECT coalesce(lex.doc_id, sem.vec_id) AS doc_id,
           lex.lex_rank AS lex_rank,
           sem.sem_rank AS sem_rank,
           round(coalesce(1.0 / ({RRF_K} + lex.lex_rank), 0)
                 + coalesce(1.0 / ({RRF_K} + sem.sem_rank), 0), 6) AS rrf_score
    FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.vec_id
    """,
)
def rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: reciprocal-rank fusion of the BM25 top-{TOP_M} (lexical)
    with the cosine top-{TOP_M} around probe vec {PROBE_VEC_ID} (semantic).
    rrf = Σ 1/({RRF_K}+rank) over the lists containing the doc."""
    lex_top = (
        _bm25_df(spark, sf_dir)
        .select("doc_id", F.round("bm25", 6).alias("s"))
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(TOP_M)
    )
    lex = lex_top.select(
        "doc_id",
        F.rank().over(Window.orderBy(F.desc("s"), F.asc("doc_id"))).alias("lex_rank"),
    )
    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == PROBE_VEC_ID).select(
        as_double(F.col("embedding")).alias("q")
    )
    sem_top = (
        emb.filter(F.col("vec_id") != PROBE_VEC_ID)
        .select("vec_id", as_double(F.col("embedding")).alias("v"))
        .crossJoin(F.broadcast(probe))
        .select("vec_id", F.round(cosine(F.col("v"), F.col("q")), 6).alias("c"))
        .orderBy(F.desc("c"), F.asc("vec_id"))
        .limit(TOP_M)
    )
    sem = sem_top.select(
        "vec_id",
        F.rank().over(Window.orderBy(F.desc("c"), F.asc("vec_id"))).alias("sem_rank"),
    )
    fused = lex.join(sem, lex.doc_id == sem.vec_id, "full_outer")
    return fused.select(
        F.coalesce(lex.doc_id, sem.vec_id).alias("doc_id"),
        "lex_rank",
        "sem_rank",
        F.round(
            F.coalesce(1.0 / (RRF_K + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (RRF_K + F.col("sem_rank")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
    )


@query(
    "retrieval_eval_ndcg",
    oracle=f"""
    WITH {_bm25_oracle_cte()},
    rel AS (
        SELECT b.doc_id, round(b.bm25, 6) AS score,
               (CASE WHEN p.tf_spark > 0 THEN 1 ELSE 0 END
                + CASE WHEN p.tf_window > 0 THEN 1 ELSE 0 END
                + CASE WHEN p.tf_hash > 0 THEN 1 ELSE 0 END) AS g
        FROM bm25 b JOIN per_doc p USING (doc_id)
    ),
    sys AS (
        SELECT doc_id, g,
               row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
        FROM rel QUALIFY rnk <= 10
    ),
    ideal AS (
        SELECT g, row_number() OVER (ORDER BY g DESC, doc_id) AS rnk
        FROM rel QUALIFY rnk <= 10
    ),
    sums AS (
        SELECT
          (SELECT sum((pow(2.0, g) - 1) / log2(rnk + 1.0)) FROM sys
            WHERE rnk <= 5) AS dcg5,
          (SELECT sum((pow(2.0, g) - 1) / log2(rnk + 1.0)) FROM sys) AS dcg10,
          (SELECT sum((pow(2.0, g) - 1) / log2(rnk + 1.0)) FROM ideal
            WHERE rnk <= 5) AS idcg5,
          (SELECT sum((pow(2.0, g) - 1) / log2(rnk + 1.0)) FROM ideal) AS idcg10,
          (SELECT CAST(sum(CASE WHEN g >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / 5.0
             FROM sys WHERE rnk <= 5) AS p5,
          (SELECT CAST(sum(CASE WHEN g >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / 10.0
             FROM sys) AS p10
    )
    SELECT 5 AS k, round(dcg5 / idcg5, 4) + 0.0 AS ndcg,
           round(p5, 4) + 0.0 AS precision_graded
    FROM sums
    UNION ALL
    SELECT 10 AS k, round(dcg10 / idcg10, 4) + 0.0 AS ndcg,
           round(p10, 4) + 0.0 AS precision_graded
    FROM sums
    """,
)
def retrieval_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval QUALITY metrics for the BM25 ranking — nDCG@k and graded
    precision@k (k = 5, 10) against a term-coverage relevance grade
    (g = how many of the fixed query's terms the document contains, 0-3;
    "relevant" for precision = g >= 2). This is the eval half every
    retrieval stack needs next to its rankers: DCG with the standard
    (2^g - 1)/log2(rank+1) gain, ideal ranking by grade.

    Plan: the BM25 candidate pass (map-only + 1-row broadcast stats), two
    TakeOrdered top-10 lists (system by score, ideal by grade — never a
    global sort), rank windows over the 10-row lists, conditional-sum
    metric aggregates, one 2-row output. Rank ties broken by doc_id on
    round(score, 6) in both engines."""
    cand = _bm25_df(spark, sf_dir).select(
        "doc_id",
        F.round("bm25", 6).alias("score"),
        F.col("n_terms_hit").alias("g"),
    )
    # the candidate relation feeds both top-10 lists — share it
    cand = cand.localCheckpoint(eager=False)
    sys_top = cand.orderBy(F.desc("score"), "doc_id").limit(10)
    ideal_top = cand.orderBy(F.desc("g"), "doc_id").limit(10)
    w_sys = Window.orderBy(F.desc("score"), "doc_id")
    w_ideal = Window.orderBy(F.desc("g"), "doc_id")
    gain = lambda: (F.pow(F.lit(2.0), F.col("g")) - 1) / F.log2(F.col("rnk") + 1.0)  # noqa: E731
    sys_r = sys_top.withColumn("rnk", F.row_number().over(w_sys))
    ideal_r = ideal_top.withColumn("rnk", F.row_number().over(w_ideal))
    sys_sums = sys_r.agg(
        F.sum(F.when(F.col("rnk") <= 5, gain())).alias("dcg5"),
        F.sum(gain()).alias("dcg10"),
        (
            F.sum(F.when((F.col("rnk") <= 5) & (F.col("g") >= 2), 1).otherwise(0))
            .cast("double")
            / 5.0
        ).alias("p5"),
        (
            F.sum(F.when(F.col("g") >= 2, 1).otherwise(0)).cast("double") / 10.0
        ).alias("p10"),
    )
    ideal_sums = ideal_r.agg(
        F.sum(F.when(F.col("rnk") <= 5, gain())).alias("idcg5"),
        F.sum(gain()).alias("idcg10"),
    )
    both = sys_sums.crossJoin(F.broadcast(ideal_sums))
    rows = both.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(5).alias("k"),
                    (F.round(F.col("dcg5") / F.col("idcg5"), 4) + F.lit(0.0)).alias(
                        "ndcg"
                    ),
                    (F.round(F.col("p5"), 4) + F.lit(0.0)).alias("precision_graded"),
                ),
                F.struct(
                    F.lit(10).alias("k"),
                    (F.round(F.col("dcg10") / F.col("idcg10"), 4) + F.lit(0.0)).alias(
                        "ndcg"
                    ),
                    (F.round(F.col("p10"), 4) + F.lit(0.0)).alias("precision_graded"),
                ),
            )
        ).alias("m")
    )
    return rows.select("m.k", "m.ndcg", "m.precision_graded")
