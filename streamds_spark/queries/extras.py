"""Round-3 additions: production-pipeline resolution/diagnostic queries.

Registered OUTSIDE queries.llmdata on purpose: the rotation
(registry.rotate_for_driver_window) fronts never-checked llmdata queries
before other never-checked ones, and these must queue BEHIND the round-2
backlog (extended TPC-H etc.) rather than displace it from the driver's
50-query window. This module is imported last for the same reason.

No reference parity (the reference has no dedup/vector surface): these extend
the LLM-data layer (SURVEY.md §6) with the steps a user runs AFTER candidate
generation — cluster resolution (what to keep), tokenizer fertility (corpus
mix diagnostics), and embedding-norm outliers (broken-vector detection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.functions.hashing import md5_int60
from streamds_spark.functions.text import tokens
from streamds_spark.functions.vectors import as_double, norm
from streamds_spark.queries.llmdata.dedup import (
    _BAND_COLS,
    _duckdb_signature_sql,
    _lsh_pairs_df,
)
from streamds_spark.registry import query

_CLUSTER_LABELS_SQL = (
    "WITH RECURSIVE "
    + _duckdb_signature_sql()
    + f""",
    buckets AS (
        {" UNION ALL ".join(
            "SELECT doc_id, " + str(b) + " AS band, md5("
            + " || ',' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
            + ") AS bucket FROM sig"
            for b, cols in enumerate(_BAND_COLS)
        )}
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM buckets a JOIN buckets b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    bidir AS (
        SELECT doc_a AS s, doc_b AS t FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(s, t) AS (
        SELECT s, t FROM bidir
        UNION
        SELECT r.s, b.t FROM reach r JOIN bidir b ON r.t = b.s
    ),
    labels AS (
        SELECT s AS node, least(s, min(t)) AS rep FROM reach GROUP BY s
    ),
    members AS (
        SELECT d.doc_id, d.n_chars, coalesce(l.rep, d.doc_id) AS rep
        FROM documents d LEFT JOIN labels l ON d.doc_id = l.node
    )"""
)


@query(
    "dedup_cluster_keep_best",
    oracle=_CLUSTER_LABELS_SQL
    + """
    SELECT rep AS cluster_rep,
           CAST(count(*) AS BIGINT) AS cluster_size,
           CAST(count(*) - 1 AS BIGINT) AS n_dropped,
           arg_max(doc_id, n_chars ORDER BY n_chars DESC, doc_id) AS keep_doc_id,
           CAST(max(n_chars) AS BIGINT) AS keep_n_chars
    FROM members GROUP BY rep
    """,
)
def dedup_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster RESOLUTION — the decision step after candidate
    generation: connected components over the LSH pair graph (fixpoint
    min-label propagation, operators/dedup_pipeline.resolve_groups), then per
    cluster keep the highest-quality member (longest text, ties to lowest
    doc_id). Singleton documents are their own cluster, so the output is the
    post-dedup corpus manifest: one row per kept doc with how many it
    displaced. All shuffles key on doc_id/rep — uniform at 100 TB; no global
    ordering anywhere. The oracle recomputes components with a recursive
    transitive-closure CTE and the same longest-text/lowest-id argmax."""
    from streamds_spark.operators.dedup_pipeline import resolve_groups

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    pairs = _lsh_pairs_df(spark, sf_dir).select(
        F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
    )
    labels = resolve_groups(pairs)
    members = docs.join(
        labels.withColumnRenamed("node", "doc_id"), "doc_id", "left"
    ).withColumn("rep", F.coalesce("rep", "doc_id"))
    return members.groupBy(F.col("rep").alias("cluster_rep")).agg(
        F.count("*").alias("cluster_size"),
        (F.count("*") - 1).alias("n_dropped"),
        F.max_by("doc_id", F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg")))
        .alias("keep_doc_id"),
        F.max("n_chars").alias("keep_n_chars"),
    )


@query(
    "token_fertility_by_lang",
    oracle=r"""
    WITH t AS (
        SELECT lang, source,
               len(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) AS n_tokens,
               n_chars
        FROM documents
    )
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST((2 * sum(n_chars) * 10000 + sum(n_tokens)) // (2 * sum(n_tokens))
                AS DOUBLE) / 10000.0 AS chars_per_token
    FROM t GROUP BY lang, source
    """,
)
def token_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility (chars per whitespace token) by language × source —
    the corpus-mix diagnostic that decides tokenizer/vocab budgets. One
    codegen tokenize + one lang×source-sized aggregate; the ratio rounds
    half-up in integer math (registry contract: engine round() divergence on
    exact .xxxx5 halves)."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "lang", "source", F.size(tokens(F.col("text"))).alias("n_tokens"), "n_chars"
    )
    return t.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        (
            F.expr(
                "CAST((2 * sum(n_chars) * 10000 + sum(n_tokens)) DIV (2 * sum(n_tokens)) AS DOUBLE)"
            )
            / F.lit(10000.0)
        ).alias("chars_per_token"),
    )


@query(
    "curriculum_order",
    oracle="""
    SELECT doc_id, n_chars,
           row_number() OVER (ORDER BY n_chars, doc_id) AS curriculum_rank
    FROM documents
    """,
)
def curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering: every document's global position in a
    shortest-first schedule (difficulty proxy: n_chars). Per-doc output, so a
    global row_number window would serialize the corpus through one task —
    this runs the distributed exact rank instead (operators/ranking.py:
    approxQuantile bucket literals + per-bucket row_number + broadcast
    offsets), which the oracle's window formulation value-checks
    end-to-end. Also the registry's usage pin for the operator rfm_scores
    builds on."""
    from streamds_spark.operators.ranking import with_global_rank

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return with_global_rank(docs, ["n_chars", "doc_id"], "curriculum_rank")


_CLF_MOD = 1997  # weight lattice: w_j = ((j+1)·2654435761 mod 1997) − 998


@query(
    "quality_classifier_score",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS t
        FROM documents
    ),
    bks AS (
        SELECT doc_id,
               list_transform(t, w -> ('0x' || substr(md5(w), 1, 15))::BIGINT % 32) AS b
        FROM toks
    ),
    feats AS (
        SELECT doc_id,
               list_transform(range(0, 32),
                   j -> CAST(len(list_filter(b, x -> x = j)) AS BIGINT)) AS f
        FROM bks
    )
    SELECT doc_id,
           CAST(list_sum(list_transform(range(0, 32),
                j -> (((j + 1) * 2654435761) % {_CLF_MOD} - 998) * f[j + 1]))
               AS BIGINT) AS score_milli,
           CAST(list_sum(list_transform(range(0, 32),
                j -> (((j + 1) * 2654435761) % {_CLF_MOD} - 998) * f[j + 1])) > 0
               AS BOOLEAN) AS keep
    FROM feats
    """,
)
def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering (fastText-style linear classifier over
    hashed term-frequency features): score = Σ w_b·tf_b with a fixed integer
    weight lattice, keep = score > 0. INTEGER weights make the score exact
    cross-engine (no float accumulation-order divergence); swapping trained
    float weights in changes nothing structural. Plan: explode → (doc,
    bucket) partial-agg → weighted sum — one shuffle on doc_id, weights live
    in the expression (a real model would broadcast them). Bucket hash is the
    cross-engine md5 int (functions/hashing.py)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("w")), 1, 15), 16, 10).cast("bigint"),
        F.lit(32),
    )
    weight = ((bucket + 1) * F.lit(2654435761)) % _CLF_MOD - 998
    scored = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
        .select("doc_id", weight.alias("wt"))
        .groupBy("doc_id")
        .agg(F.sum("wt").alias("score_milli"))
    )
    return docs.select("doc_id").join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("score_milli", F.lit(0)).alias("score_milli"),
        (F.coalesce("score_milli", F.lit(0)) > 0).alias("keep"),
    )


@query(
    "bloom_decontaminate_docs",
    oracle=r"""
    WITH sh AS (
        SELECT doc_id,
               unnest(CASE WHEN len(t) >= 3
                      THEN list_transform(range(1, len(t) - 1),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                      ELSE [] END) AS shingle
        FROM (SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS t
              FROM documents)
    ),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 25),
    corpus AS (SELECT doc_id, shingle FROM sh WHERE doc_id >= 25)
    SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_contaminated_shingles
    FROM corpus c JOIN bench b USING (shingle)
    GROUP BY c.doc_id
    """,
)
def bloom_decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination via the Bloom two-phase plan
    (operators/bloom.py): benchmark = shingles of docs 0-24, corpus = the
    rest; the corpus side is pruned MAP-SIDE by a broadcast bloom bit array
    and only survivors reach the exact verifying join. The oracle is the
    plain equi-join — the two-phase plan's result is EXACT by construction
    (bloom has no false negatives; the verify join removes false positives),
    so the driver hash-checks that the fast plan changes nothing. At 100 TB
    the pruned join shuffles (true hits + FP·n) rows instead of every corpus
    shingle."""
    from streamds_spark.functions.text import shingles_expr
    from streamds_spark.operators.bloom import bloom_decontaminate

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", tokens(F.col("text")).alias("toks")).select(
        "doc_id", F.explode(shingles_expr("toks", 3)).alias("shingle")
    )
    bench = sh.filter(F.col("doc_id") < 25).select("shingle").distinct()
    corpus = sh.filter(F.col("doc_id") >= 25)
    return bloom_decontaminate(corpus, bench)


@query(
    "corpus_report",
    oracle=r"""
    WITH t AS (
        SELECT doc_id, lang, source, n_chars,
               len(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) AS n_tokens,
               md5(text) AS h
        FROM documents
    )
    SELECT 'n_docs' AS metric, CAST(count(*) AS DOUBLE) AS value FROM t
    UNION ALL SELECT 'n_langs', CAST(count(DISTINCT lang) AS DOUBLE) FROM t
    UNION ALL SELECT 'n_sources', CAST(count(DISTINCT source) AS DOUBLE) FROM t
    UNION ALL SELECT 'total_tokens', CAST(sum(n_tokens) AS DOUBLE) FROM t
    UNION ALL SELECT 'total_chars', CAST(sum(n_chars) AS DOUBLE) FROM t
    UNION ALL SELECT 'exact_dup_docs', CAST(count(*) - count(DISTINCT h) AS DOUBLE) FROM t
    UNION ALL SELECT 'max_doc_tokens', CAST(max(n_tokens) AS DOUBLE) FROM t
    UNION ALL SELECT 'min_doc_tokens', CAST(min(n_tokens) AS DOUBLE) FROM t
    """,
)
def corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card summary in one call: size, language/source diversity,
    token mass, exact-dup volume, length extremes — as (metric, value) rows
    so downstream tooling consumes it uniformly. ONE scan: all metrics are
    aggregates of the same tokenized projection (Spark computes them in a
    single partial-agg pass; the unpivot is an 8-row transform). The deeper
    per-family diagnostics (quality deciles, vocab growth, KL) stay their
    own queries — this is the front page."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "lang",
        "source",
        "n_chars",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
        F.md5(F.col("text").cast("binary")).alias("h"),
    )
    agg = t.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.countDistinct("lang").cast("double").alias("n_langs"),
        F.countDistinct("source").cast("double").alias("n_sources"),
        F.sum("n_tokens").cast("double").alias("total_tokens"),
        F.sum("n_chars").cast("double").alias("total_chars"),
        (F.count("*") - F.countDistinct("h")).cast("double").alias("exact_dup_docs"),
        F.max("n_tokens").cast("double").alias("max_doc_tokens"),
        F.min("n_tokens").cast("double").alias("min_doc_tokens"),
    )
    metrics = [
        "n_docs",
        "n_langs",
        "n_sources",
        "total_tokens",
        "total_chars",
        "exact_dup_docs",
        "max_doc_tokens",
        "min_doc_tokens",
    ]
    stack = ", ".join(f"'{m}', {m}" for m in metrics)
    return agg.selectExpr(f"stack({len(metrics)}, {stack}) AS (metric, value)")


@query(
    "dedup_rate_by_threshold",
    oracle=_CLUSTER_LABELS_SQL.replace("WITH RECURSIVE ", "WITH ", 1).split(",\n    bidir AS")[0]
    + r""",
    ssets AS (
        SELECT doc_id,
               list_distinct(CASE WHEN len(t) >= 3
                   THEN list_transform(range(1, len(t) - 1),
                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                   ELSE [] END) AS sset
        FROM toks
    ),
    tj AS (
        SELECT p.doc_a, p.doc_b,
               CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE) /
                   nullif(len(list_distinct(list_concat(a.sset, b.sset))), 0) AS j
        FROM pairs p
        JOIN ssets a ON a.doc_id = p.doc_a
        JOIN ssets b ON b.doc_id = p.doc_b
    )
    SELECT t.thr AS threshold,
           CAST(count(CASE WHEN tj.j >= t.thr THEN 1 END) AS BIGINT) AS n_pairs
    FROM tj CROSS JOIN
         (SELECT CAST(unnest([0.5, 0.6, 0.7, 0.8, 0.9]) AS DOUBLE) AS thr) t
    GROUP BY t.thr
    """,
)
def dedup_rate_by_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup DIAL: how many candidate pairs survive each Jaccard
    verification threshold (0.5–0.9) — the number you look at before picking
    the pipeline's cutoff. True Jaccard is computed once per LSH candidate
    (bounded by the candidate list, never all-pairs) and the 5 thresholds
    are a broadcast 5-row cross join over that small pair table."""
    from streamds_spark.functions.text import shingles_expr
    from streamds_spark.queries.llmdata.dedup import SHINGLE_N

    pairs = _lsh_pairs_df(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    ssets = docs.select("doc_id", tokens(F.col("text")).alias("toks")).select(
        "doc_id", F.array_distinct(shingles_expr("toks", SHINGLE_N)).alias("sset")
    )
    inter = F.size(F.array_intersect(F.col("a.sset"), F.col("b.sset"))).cast("double")
    union = F.size(F.array_union(F.col("a.sset"), F.col("b.sset"))).cast("double")
    tj = (
        pairs.join(ssets.alias("a"), F.col("doc_a") == F.col("a.doc_id"))
        .join(ssets.alias("b"), F.col("doc_b") == F.col("b.doc_id"))
        .select((inter / F.nullif(union, F.lit(0.0))).alias("j"))
    )
    thresholds = spark.createDataFrame([(t,) for t in (0.5, 0.6, 0.7, 0.8, 0.9)], ["thr"])
    return (
        tj.crossJoin(F.broadcast(thresholds))
        .groupBy(F.col("thr").alias("threshold"))
        .agg(F.sum(F.when(F.col("j") >= F.col("thr"), 1).otherwise(0)).alias("n_pairs"))
    )


@query(
    "cross_source_dup_matrix",
    oracle=_CLUSTER_LABELS_SQL.replace("WITH RECURSIVE ", "WITH ", 1).split(",\n    bidir AS")[0]
    + r"""
    SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM pairs p
    JOIN documents da ON da.doc_id = p.doc_a
    JOIN documents db ON db.doc_id = p.doc_b
    GROUP BY 1, 2
    """,
)
def cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which sources duplicate each other: LSH candidate pairs bucketed by
    the (unordered) source pair — the mixture diagnostic that finds mirror
    sites and cross-source scrapes before sampling weights are chosen. The
    pair table is candidate-bounded; the doc→source lookup joins on doc_id
    (broadcast at report scale, co-partitioned shuffle at 100 TB)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    pairs = _lsh_pairs_df(spark, sf_dir)
    joined = (
        pairs.join(docs.withColumnRenamed("source", "sa"), pairs.doc_a == docs.doc_id)
        .drop("doc_id")
        .join(
            docs.withColumnRenamed("source", "sb").withColumnRenamed("doc_id", "doc_id_b"),
            F.col("doc_b") == F.col("doc_id_b"),
        )
    )
    return joined.groupBy(
        F.least("sa", "sb").alias("source_a"), F.greatest("sa", "sb").alias("source_b")
    ).agg(F.count("*").alias("n_pairs"))


@query(
    "adaptive_length_filter",
    oracle=r"""
    WITH t AS (
        SELECT doc_id, lang,
               len(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) AS n_tokens
        FROM documents
    ),
    cuts AS (
        SELECT lang,
               quantile_cont(n_tokens, 0.05) AS lo,
               quantile_cont(n_tokens, 0.95) AS hi
        FROM t GROUP BY lang
    )
    SELECT t.doc_id, t.lang, CAST(t.n_tokens AS BIGINT) AS n_tokens,
           round(c.lo, 4) AS lo, round(c.hi, 4) AS hi,
           CAST(t.n_tokens < c.lo OR t.n_tokens > c.hi AS BOOLEAN) AS is_outlier
    FROM t JOIN cuts c USING (lang)
    """,
)
def adaptive_length_filter(
    spark: SparkSession, sf_dir: str, exact: bool = True
) -> DataFrame:
    """Per-language ADAPTIVE length filtering: flag docs outside their own
    language's [p05, p95] token-count band — fixed global cutoffs mis-filter
    short-token languages. Exact percentiles per lang (lang-sized groups:
    the aggregate is small even at 100 TB; the per-doc pass then joins the
    lang-count-sized cut table broadcast). DuckDB quantile_cont and Spark
    percentile share linear interpolation, so the bounds hash-match."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "lang", F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens")
    )
    if exact:
        cuts = t.groupBy("lang").agg(
            F.expr("percentile(n_tokens, 0.05)").alias("lo_raw"),
            F.expr("percentile(n_tokens, 0.95)").alias("hi_raw"),
        )
    else:
        # exact=False: GK-sketch percentiles (mergeable partials, bounded
        # agg buffers) — the 100 TB path when per-lang groups are no longer
        # "small"; bounds are data values within N_lang/accuracy rank error
        # (audited by adaptive_length_approx_audit + the paired test)
        cuts = t.groupBy("lang").agg(
            F.percentile_approx("n_tokens", F.lit(0.05), F.lit(10000))
            .cast("double")
            .alias("lo_raw"),
            F.percentile_approx("n_tokens", F.lit(0.95), F.lit(10000))
            .cast("double")
            .alias("hi_raw"),
        )
    return t.join(F.broadcast(cuts), "lang").select(
        "doc_id",
        "lang",
        "n_tokens",
        F.round("lo_raw", 4).alias("lo"),
        F.round("hi_raw", 4).alias("hi"),
        ((F.col("n_tokens") < F.col("lo_raw")) | (F.col("n_tokens") > F.col("hi_raw"))).alias(
            "is_outlier"
        ),
    )


@query(
    "adaptive_length_approx_audit",
    oracle="""
    SELECT DISTINCT lang, TRUE AS lo_within_bound, TRUE AS hi_within_bound
    FROM documents
    """,
)
def adaptive_length_approx_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-error audit for adaptive_length_filter(exact=False): each lang's
    sketch p05/p95 must sit at a true rank within N_lang/accuracy of target
    (tie-proof two-sided check against EXACT rank counts, same form as
    approx_percentile_audit). Oracle is literal TRUE per lang — the row
    hash-verifies only if the GK guarantee held on this data.

    Plan: one groupBy(lang) sketch agg (broadcast — lang-count-sized), one
    map-side conditional-sum pass per lang for the exact ranks. No window."""
    acc = 10000
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "lang", F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens")
    )
    cuts = t.groupBy("lang").agg(
        F.percentile_approx("n_tokens", F.lit(0.05), F.lit(acc)).alias("lo_a"),
        F.percentile_approx("n_tokens", F.lit(0.95), F.lit(acc)).alias("hi_a"),
    )
    ranked = (
        t.join(F.broadcast(cuts), "lang")
        .groupBy("lang", "lo_a", "hi_a")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("n_tokens") < F.col("lo_a")).cast("long")).alias("lo_below"),
            F.sum((F.col("n_tokens") <= F.col("lo_a")).cast("long")).alias("lo_ate"),
            F.sum((F.col("n_tokens") < F.col("hi_a")).cast("long")).alias("hi_below"),
            F.sum((F.col("n_tokens") <= F.col("hi_a")).cast("long")).alias("hi_ate"),
        )
    )
    eps = F.col("n").cast("double") / acc
    lo_t = F.col("n").cast("double") * 0.05
    hi_t = F.col("n").cast("double") * 0.95
    return ranked.select(
        "lang",
        ((F.col("lo_below") <= lo_t + eps) & (F.col("lo_ate") >= lo_t - eps)).alias(
            "lo_within_bound"
        ),
        ((F.col("hi_below") <= hi_t + eps) & (F.col("hi_ate") >= hi_t - eps)).alias(
            "hi_within_bound"
        ),
    )


@query(
    "skew_report_sources",
    oracle="""
    WITH c AS (
        SELECT source AS key_value, count(*) AS n_rows
        FROM documents GROUP BY source
    ),
    t AS (SELECT CAST(sum(n_rows) AS DOUBLE) AS total FROM c)
    SELECT key_value,
           CAST(n_rows AS BIGINT) AS n_rows,
           round(CAST(n_rows AS DOUBLE) / total, 4) AS share,
           round(CAST(n_rows AS DOUBLE) / (total / 32.0), 4) AS budget_ratio,
           CASE WHEN CAST(n_rows AS DOUBLE) / (total / 32.0) <= 1.0
                THEN 'hash-shuffle'
                ELSE 'salt:' || CAST(CAST(ceil(CAST(n_rows AS DOUBLE)
                                              / (total / 32.0)) AS BIGINT)
                                     AS VARCHAR)
           END AS recommendation
    FROM c CROSS JOIN t
    ORDER BY n_rows DESC, key_value
    LIMIT 20
    """,
)
def skew_report_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnostic over documents.source at a 32-partition budget
    (operators/skewjoin.skew_report): per heavy key, its mass, corpus share,
    ratio to one reducer's fair load, and the encoded decision — salt count
    if a single reducer would straggle, plain hash shuffle otherwise. The
    source column IS skewed by construction (few sources over the whole
    corpus), so this exercises the 'salt:<n>' branch the salted_join
    operator exists for; nothing before this round MEASURED when to use it.

    Plan: one map-combined count shuffle on the key + a broadcast 1-row
    total + a driver-sized top-k (TakeOrdered). Scale-invariant shape."""
    from streamds_spark.operators.skewjoin import skew_report

    docs = load_table(spark, sf_dir, "documents")
    return skew_report(docs, "source", n_partitions=32, top_k=20)


def _hard_negatives_oracle() -> str:
    from streamds_spark.queries.llmdata.retrieval import QUERY_TERMS, _bm25_oracle_cte

    all_terms = " AND ".join(f"tf_{t} > 0" for t in QUERY_TERMS)
    n_matched = " + ".join(f"CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END" for t in QUERY_TERMS)
    return f"""
    WITH {_bm25_oracle_cte()}
    SELECT b.doc_id, round(b.bm25, 4) AS bm25,
           CAST({n_matched} AS INT) AS n_terms_matched
    FROM bm25 b JOIN per_doc p USING (doc_id)
    WHERE NOT ({all_terms})
    ORDER BY round(b.bm25, 6) DESC, b.doc_id
    LIMIT 20
    """


@query("hard_negatives_bm25", oracle=_hard_negatives_oracle())
def hard_negatives_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for retrieval training: the 20 highest-BM25 docs
    that match SOME query terms but not ALL of them — lexically confusable
    non-answers, the negatives contrastive training actually needs (random
    negatives are too easy). One scan + 1-row stats broadcast (the bm25
    machinery) + TakeOrdered 20 — at 100 TB this is a map-only pass per
    query batch; the rank never sees more than the top-k."""
    from streamds_spark.queries.llmdata.retrieval import (
        QUERY_TERMS,
        _bm25_df,
        _tf_count,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    matches = docs.select(
        "doc_id",
        sum((_tf_count(toks, t) > 0).cast("int") for t in QUERY_TERMS).alias(
            "n_terms_matched"
        ),
    )
    return (
        _bm25_df(spark, sf_dir)
        .join(matches, "doc_id")
        .filter(F.col("n_terms_matched") < len(QUERY_TERMS))
        .orderBy(F.desc(F.round("bm25", 6)), F.asc("doc_id"))
        .limit(20)
        .select("doc_id", F.round("bm25", 4).alias("bm25"), "n_terms_matched")
    )


@query(
    "substring_dedup_report",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS t
        FROM documents
    ),
    pos AS (
        SELECT doc_id, unnest(range(0, greatest(len(t) - 7, 0))) AS pos,
               t[unnest(range(0, greatest(len(t) - 7, 0))) + 1] || ' ' ||
               t[unnest(range(0, greatest(len(t) - 7, 0))) + 2] || ' ' ||
               t[unnest(range(0, greatest(len(t) - 7, 0))) + 3] || ' ' ||
               t[unnest(range(0, greatest(len(t) - 7, 0))) + 4] || ' ' ||
               t[unnest(range(0, greatest(len(t) - 7, 0))) + 5] || ' ' ||
               t[unnest(range(0, greatest(len(t) - 7, 0))) + 6] || ' ' ||
               t[unnest(range(0, greatest(len(t) - 7, 0))) + 7] || ' ' ||
               t[unnest(range(0, greatest(len(t) - 7, 0))) + 8] AS shingle
        FROM toks
    ),
    dup AS (SELECT shingle FROM pos GROUP BY shingle HAVING count(*) > 1),
    marked AS (SELECT doc_id, pos FROM pos JOIN dup USING (shingle)),
    flagged AS (
        SELECT doc_id, pos,
               CASE WHEN max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                     OR pos > max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_span
        FROM marked
    ),
    grouped AS (
        SELECT doc_id, pos,
               sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS UNBOUNDED PRECEDING) AS grp
        FROM flagged
    ),
    spans AS (
        SELECT doc_id, grp, min(pos) AS s, max(pos) + 8 AS e
        FROM grouped GROUP BY doc_id, grp
    ),
    report AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(e - s) AS BIGINT) AS n_tokens_removed
        FROM spans GROUP BY doc_id
    )
    SELECT t.doc_id,
           coalesce(r.n_spans, 0) AS n_spans,
           coalesce(r.n_tokens_removed, 0) AS n_tokens_removed,
           CAST(len(t.t) AS BIGINT) AS n_tokens
    FROM toks t LEFT JOIN report r USING (doc_id)
    """,
)
def substring_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup at 8-token granularity (Lee et al. 2022 shape):
    per-doc count of maximal spans covered by corpus-duplicated 8-shingles
    and tokens removed (operators/substring_dedup.py; cleaned-text
    reconstruction is pytest-verified against a Python reference — the
    oracle checks the span arithmetic cross-engine). Three bounded shuffles;
    the only windows are per-doc interval merges."""
    from streamds_spark.operators.substring_dedup import substring_dedup

    docs = load_table(spark, sf_dir, "documents")
    return substring_dedup(docs, 8).select(
        "doc_id", "n_spans", "n_tokens_removed", "n_tokens"
    )


@query(
    "substring_dedup_keep_one",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS t
        FROM documents
    ),
    pos AS (
        SELECT doc_id, unnest(range(0, greatest(len(t) - 7, 0))) AS pos,
               t[unnest(range(0, greatest(len(t) - 7, 0))) + 1] || ' ' ||
               t[unnest(range(0, greatest(len(t) - 7, 0))) + 2] || ' ' ||
               t[unnest(range(0, greatest(len(t) - 7, 0))) + 3] || ' ' ||
               t[unnest(range(0, greatest(len(t) - 7, 0))) + 4] || ' ' ||
               t[unnest(range(0, greatest(len(t) - 7, 0))) + 5] || ' ' ||
               t[unnest(range(0, greatest(len(t) - 7, 0))) + 6] || ' ' ||
               t[unnest(range(0, greatest(len(t) - 7, 0))) + 7] || ' ' ||
               t[unnest(range(0, greatest(len(t) - 7, 0))) + 8] AS shingle
        FROM toks
    ),
    dup AS (SELECT shingle FROM pos GROUP BY shingle HAVING count(*) > 1),
    marked AS (  -- all occurrences EXCEPT the (doc_id, pos)-min canonical one
        SELECT doc_id, pos FROM (
            SELECT doc_id, pos,
                   row_number() OVER (PARTITION BY shingle
                                      ORDER BY doc_id, pos) AS rn
            FROM pos JOIN dup USING (shingle)
        ) WHERE rn > 1
    ),
    flagged AS (
        SELECT doc_id, pos,
               CASE WHEN max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                     OR pos > max(pos + 8) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_span
        FROM marked
    ),
    grouped AS (
        SELECT doc_id, pos,
               sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS UNBOUNDED PRECEDING) AS grp
        FROM flagged
    ),
    spans AS (
        SELECT doc_id, grp, min(pos) AS s, max(pos) + 8 AS e
        FROM grouped GROUP BY doc_id, grp
    ),
    report AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(e - s) AS BIGINT) AS n_tokens_removed
        FROM spans GROUP BY doc_id
    )
    SELECT t.doc_id,
           coalesce(r.n_spans, 0) AS n_spans,
           coalesce(r.n_tokens_removed, 0) AS n_tokens_removed,
           CAST(len(t.t) AS BIGINT) AS n_tokens
    FROM toks t LEFT JOIN report r USING (doc_id)
    """,
)
def substring_dedup_keep_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-one-canonical substring dedup (Lee et al. 2022's practical
    recipe): identical to substring_dedup_report, except ONE occurrence of
    each corpus-duplicated 8-shingle — the global min(doc_id, pos) — is
    preserved, so the duplicated text survives exactly once in the cleaned
    corpus. The canonical pick is one extra aggregate on the dup-occurrence
    relation (min struct per shingle, same shuffle key as the mark-back
    join); per-doc removal totals are the cross-engine check here, and
    cleaned-text reconstruction parity is pytest-verified against a Python
    reference (tests/test_substring_dedup.py)."""
    from streamds_spark.operators.substring_dedup import substring_dedup

    docs = load_table(spark, sf_dir, "documents")
    return substring_dedup(docs, 8, keep_one=True).select(
        "doc_id", "n_spans", "n_tokens_removed", "n_tokens"
    )


@query(
    "embedding_norm_outliers",
    oracle=r"""
    WITH norms AS (
        SELECT vec_id, label,
               sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
        FROM embeddings
    ),
    stats AS (
        SELECT avg(nrm) AS mu, stddev_samp(nrm) AS sd FROM norms
    )
    SELECT vec_id, label,
           round(nrm, 4) + 0.0 AS nrm,
           CAST(abs(nrm - mu) > 3 * sd AS BOOLEAN) AS is_outlier
    FROM norms CROSS JOIN stats
    """,
)
def embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broken-embedding detection: L2 norm per vector flagged at ±3σ from the
    corpus mean — catches zeroed, clipped, or unnormalized vectors before
    they poison ANN/SemDeDup. Norms are codegen array aggregates; the 1-row
    (μ, σ) aggregate broadcasts onto the scan (the repo's standard
    broadcast-of-1-row stat join) — two passes, no unbounded state."""
    emb = load_table(spark, sf_dir, "embeddings")
    norms = emb.select("vec_id", "label", norm(as_double(F.col("embedding"))).alias("nrm"))
    stats = norms.agg(
        F.avg("nrm").alias("mu"), F.stddev_samp("nrm").alias("sd")
    )
    return norms.crossJoin(F.broadcast(stats)).select(
        "vec_id",
        "label",
        (F.round(F.col("nrm"), 4) + F.lit(0.0)).alias("nrm"),
        (F.abs(F.col("nrm") - F.col("mu")) > 3 * F.col("sd")).alias("is_outlier"),
    )


@query(
    "distinct_parts_exact",
    oracle=r"""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(*) AS BIGINT) AS cnt
    FROM lineitem GROUP BY l_returnflag
    """,
)
def distinct_parts_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked exact twin of approx_distinct_parts (advanced.py:174):
    HLL sketches aren't cross-engine comparable, so the approx query is
    rows-only by design — this twin proves the same grouping/distinct shape
    against the oracle, and tests/test_advanced.py bounds the sketch's error
    against THIS exact count. Plan: partial distinct aggregation
    (two-phase hash agg on (flag, partkey) then flag) — no global sort,
    scales as the standard exact-distinct shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("n_parts"),
        F.count("*").alias("cnt"),
    )


# --- PQ/ADC driver-checkable twin ------------------------------------------
# The IVF-PQ index operators are pytest-only by nature (stateful index on
# disk); this query gives the COMPRESSED ANN path a driver CORRECTNESS row.
# Everything runs on an integer lattice so both engines compute bit-identical
# distances: embeddings are floored to integers (floor(x*1000) — an exact
# IEEE op, unlike round), the codebook and query vector are integer-valued
# closed forms, and every squared-distance sum stays exactly representable in
# doubles — no float-canonicalization risk anywhere.
_PQ_M, _PQ_SUBD, _PQ_K, _PQ_TOPK = 8, 8, 4, 20


def _pq_cb_int(s: int, c, d) -> str:
    """Codebook entry as a DuckDB scalar over lambda vars c, d."""
    return f"((({c} * 31 + {d} * 7 + {s} * 13) % 21 - 10) * 100)"


def _pq_oracle_sql() -> str:
    code_cols = []
    for s in range(_PQ_M):
        scored = (
            f"list_transform(range(0, {_PQ_K}), cc -> "
            f"list_sum(list_transform(range(0, {_PQ_SUBD}), d -> "
            f"pow(v[{s * _PQ_SUBD} + d + 1] - {_pq_cb_int(s, 'cc', 'd')}, 2))))"
        )
        code_cols.append(
            f"(list_position({scored}, list_min({scored})) - 1) AS c{s}"
        )
    adc_terms = []
    for s in range(_PQ_M):
        qv = f"((({s * _PQ_SUBD} + d) * 17) % 13 - 6) * 500"
        adc_terms.append(
            f"list_sum(list_transform(range(0, {_PQ_SUBD}), d -> "
            f"pow(({qv}) - {_pq_cb_int(s, f'c{s}', 'd')}, 2)))"
        )
    return f"""
    WITH e AS (
        SELECT vec_id,
               list_transform(embedding::DOUBLE[], x -> floor(x * 1000)) AS v
        FROM embeddings
    ),
    codes AS (
        SELECT vec_id, {", ".join(code_cols)} FROM e
    )
    SELECT vec_id, CAST({" + ".join(adc_terms)} AS BIGINT) AS adc_dist
    FROM codes
    ORDER BY adc_dist, vec_id
    LIMIT {_PQ_TOPK}
    """


@query("pq_adc_rank_check", oracle=_pq_oracle_sql())
def pq_adc_rank_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encode + ADC top-k (operators/pq.py encode_pq_expr + adc_topk) on a
    deterministic integer lattice, hash-checked against a DuckDB replica of
    the same codebook/LUT math — proof the compressed ANN scoring path (code
    assignment tie-breaks, LUT lookups, distance accumulation) is exact, not
    just recall-tested. Plan: map-only encode + one TakeOrdered, same as the
    production probe."""
    from streamds_spark.operators.pq import adc_topk, encode_pq_expr

    cb = [
        [
            [float(((c * 31 + d * 7 + s * 13) % 21 - 10) * 100) for d in range(_PQ_SUBD)]
            for c in range(_PQ_K)
        ]
        for s in range(_PQ_M)
    ]
    qvec = [float(((j * 17) % 13 - 6) * 500) for j in range(_PQ_M * _PQ_SUBD)]
    # spread=True (guide §2.2): the M×K×D encode distance evaluations are
    # row-local on a SINGLE-SPLIT scan, and every output is an exact integer
    # (floored lattice, code ids, ADC dist2) — partitioning-invariant
    emb = load_table(spark, sf_dir, "embeddings", spread=True)
    lat = emb.select(
        "vec_id",
        F.transform(
            as_double(F.col("embedding")), lambda x: F.floor(x * 1000).cast("double")
        ).alias("v"),
    )
    codes = lat.select("vec_id", encode_pq_expr(cb, F.col("v")).alias("codes"))
    top = adc_topk(codes, cb, qvec, topk=_PQ_TOPK)
    return top.select("vec_id", F.col("adc_dist2").cast("bigint").alias("adc_dist"))


# --- DSIR-style importance weighting ----------------------------------------
# Data Selection via Importance Resampling (Xie et al. 2023, public method):
# estimate target/raw distributions over HASHED n-gram features (here: hashed
# unigrams, the same cross-engine md5 bucket as feature_hash_vectors), weight
# every raw doc by its log likelihood ratio, and select the top quantile.
_DSIR_DIM = 256  # hashed feature buckets
_DSIR_TARGET = ("src0", "src1", "src2", "src3")  # the "curated" slice
_DSIR_KEEP_FRAC = 0.25


@query(
    "dsir_importance_weights",
    oracle=rf"""
    WITH tok AS (
        SELECT doc_id, source,
               ('0x' || substr(md5(unnest(
                    list_filter(string_split_regex(text, '\s+'), w -> w <> ''))), 1, 15)
               )::BIGINT % {_DSIR_DIM} AS b
        FROM documents
    ),
    tcnt AS (
        SELECT b, count(*) AS c FROM tok
        WHERE source IN {_DSIR_TARGET} GROUP BY b
    ),
    rcnt AS (
        SELECT b, count(*) AS c FROM tok
        WHERE source NOT IN {_DSIR_TARGET} GROUP BY b
    ),
    tot AS (
        SELECT (SELECT sum(c) FROM tcnt) AS tn, (SELECT sum(c) FROM rcnt) AS rn
    ),
    lut AS (  -- Laplace-smoothed per-bucket log ratio, D rows
        SELECT buckets.b,
               ln((coalesce(tcnt.c, 0) + 1.0) / (tot.tn + {_DSIR_DIM}))
             - ln((coalesce(rcnt.c, 0) + 1.0) / (tot.rn + {_DSIR_DIM})) AS llr
        FROM (SELECT unnest(range(0, {_DSIR_DIM})) AS b) buckets
        LEFT JOIN tcnt USING (b) LEFT JOIN rcnt USING (b) CROSS JOIN tot
    ),
    scored AS (
        SELECT tok.doc_id, sum(lut.llr) AS w
        FROM tok JOIN lut USING (b)
        WHERE tok.source NOT IN {_DSIR_TARGET}
        GROUP BY tok.doc_id
    ),
    cut AS (SELECT quantile_cont(w, {1 - _DSIR_KEEP_FRAC}) AS q FROM scored)
    SELECT doc_id,
           round(w, 4) + 0.0 AS log_weight,
           CAST(w >= cut.q AS BOOLEAN) AS selected
    FROM scored CROSS JOIN cut
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023): per-doc log importance weight
    log p_target(x)/p_raw(x) under hashed-unigram bag models (Laplace
    smoothed), plus the top-25%-by-weight selection verdict.

    Scale shape: exactly TWO corpus passes. Pass 1 tokenizes once and builds
    BOTH per-bucket count sides in a single groupBy (conditional sums), then
    collects the <=D=256 result rows ONCE; the totals are folded driver-side
    from those same rows (no standalone count jobs — the module's "nothing
    driver-side ever exceeds D rows" contract licenses this). Pass 2 scores:
    the per-bucket log-likelihood-ratio LUT is inlined as literal count maps
    (map-side element_at lookup — no join, no broadcast exchange) and
    partial-aggregates by doc_id (one shuffle). The log() stays a JVM-side
    expression over the literal counts, so values are bit-identical to the
    former broadcast-join formulation. The selection threshold is a 1-row
    exact percentile broadcast back. Interpolated quantile matches DuckDB's
    quantile_cont via percentile()."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "source", F.explode(tokens(F.col("text"))).alias("w")
    ).select("doc_id", "source", (md5_int60(F.col("w")) % _DSIR_DIM).alias("b"))
    is_target = F.col("source").isin(*_DSIR_TARGET)
    # ONE corpus pass for both count sides; ONE <=D-row collect for everything
    cnt_rows = (
        tok.groupBy("b")
        .agg(
            F.sum(F.when(is_target, 1).otherwise(0)).alias("tc"),
            F.sum(F.when(~is_target, 1).otherwise(0)).alias("rc"),
        )
        .collect()
    )
    tc_by_b = {int(r["b"]): int(r["tc"]) for r in cnt_rows if r["tc"]}
    rc_by_b = {int(r["b"]): int(r["rc"]) for r in cnt_rows if r["rc"]}
    tot_t = sum(tc_by_b.values())
    tot_r = sum(rc_by_b.values())

    def _count_lookup(by_b: "dict[int, int]") -> F.Column:
        if not by_b:
            return F.lit(0)
        m = F.create_map(
            *[x for b, c in by_b.items() for x in (F.lit(b).cast("bigint"), F.lit(c))]
        )
        return F.coalesce(F.element_at(m, F.col("b")), F.lit(0))

    llr = F.log((_count_lookup(tc_by_b) + 1.0) / F.lit(float(tot_t + _DSIR_DIM))) - F.log(
        (_count_lookup(rc_by_b) + 1.0) / F.lit(float(tot_r + _DSIR_DIM))
    )
    scored = (
        tok.filter(~is_target)
        .withColumn("llr", llr)
        .groupBy("doc_id")
        .agg(F.sum("llr").alias("w"))
    )
    cut = scored.agg(
        F.percentile("w", F.lit(1 - _DSIR_KEEP_FRAC)).alias("q")
    )
    return scored.crossJoin(F.broadcast(cut)).select(
        "doc_id",
        (F.round(F.col("w"), 4) + F.lit(0.0)).alias("log_weight"),
        (F.col("w") >= F.col("q")).alias("selected"),
    )


# --- Deterministic epoch shuffle --------------------------------------------
_SHUFFLE_SEED = 42
_SHUFFLE_SHARDS = 8


@query(
    "epoch_shuffle_order",
    oracle=rf"""
    WITH h AS (
        SELECT doc_id,
               ('0x' || substr(md5('epoch-{_SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 15)
               )::BIGINT AS hv
        FROM documents
    )
    SELECT doc_id,
           CAST(hv % {_SHUFFLE_SHARDS} AS INT) AS shard,
           CAST(row_number() OVER (PARTITION BY hv % {_SHUFFLE_SHARDS}
                                   ORDER BY hv, doc_id) AS BIGINT) AS pos
    FROM h
    """,
)
def epoch_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-epoch shuffle: every worker can compute its
    shard's read order with no coordination — shard = h % S and position =
    rank of h within the shard, where h = md5('epoch-<seed>:' || doc_id).
    Reseeding the epoch string gives a fresh permutation; the same seed
    always replays identically (the checkpoint/resume contract).

    Scale shape: one map pass computes h; the only shuffle is the window
    PARTITIONED by shard (S-way parallel sort, no global ordering). At 100 TB
    set S ≈ number of training readers and each shard sorts independently."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    h = docs.select(
        "doc_id",
        md5_int60(F.concat(F.lit(f"epoch-{_SHUFFLE_SEED}:"), F.col("doc_id"))).alias("hv"),
    )
    shard = (F.col("hv") % _SHUFFLE_SHARDS).cast("int")
    w = Window.partitionBy(shard).orderBy("hv", "doc_id")
    return h.select(
        "doc_id",
        shard.alias("shard"),
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


def _zorder_oracle_sql() -> str:
    from streamds_spark.operators.zorder import zorder_sql

    zx = "o_custkey % 4096"
    zy = "datediff('day', DATE '1992-01-01', o_orderdate) % 4096"
    return (
        f"SELECT o_orderkey, CAST({zx} AS INT) AS zx, CAST({zy} AS INT) AS zy, "
        f"{zorder_sql(zx, zy, bits=12)} AS zkey FROM orders"
    )


@query("zorder_key_orders", oracle=_zorder_oracle_sql())
def zorder_key_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) key over (customer, order-day) — the clustering key
    io/layout.write_zordered range-partitions 100 TB fact tables
    on so parquet footer stats prune reads filtered on EITHER column. The
    bit-interleave is one codegen'd arithmetic expression (zorder_sql emits
    the identical SQL for Spark and the DuckDB oracle); the layout write and
    file-skipping evidence are exercised in tests/test_zorder.py."""
    from streamds_spark.operators.zorder import zorder_sql

    orders = load_table(spark, sf_dir, "orders")
    zx = "o_custkey % 4096"
    zy = "datediff(o_orderdate, DATE '1992-01-01') % 4096"
    return orders.select(
        "o_orderkey",
        F.expr(zx).cast("int").alias("zx"),
        F.expr(zy).cast("int").alias("zy"),
        F.expr(zorder_sql(zx, zy, bits=12)).alias("zkey"),
    )


@query(
    "skew_aware_join_sources",
    oracle="""
    WITH dim AS (SELECT DISTINCT source, upper(source) AS label FROM documents)
    SELECT d.label AS label,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(dd.n_chars) AS BIGINT) AS sum_chars
    FROM documents dd JOIN dim d ON dd.source = d.source
    GROUP BY d.label
    ORDER BY label
    """,
)
def skew_aware_join_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """skew_report's decision rule APPLIED, not just printed: join documents
    (fact, skewed on source — a handful of sources carry the corpus) to a
    source-keyed dim via operators/skewjoin.skew_aware_join and aggregate.
    broadcast_threshold_rows=0 models the 100 TB case where the dim exceeds
    the broadcast budget, so the rule measures the key (one count-partials
    shuffle), sees every source's mass outweigh a 32-partition reducer
    budget, and picks the salted path — the oracle proves salting changed
    the PHYSICAL plan and nothing else. Production callers keep the default
    threshold and would broadcast a dim this small."""
    from streamds_spark.operators.skewjoin import skew_aware_join

    docs = load_table(spark, sf_dir, "documents")
    dim = docs.select("source").distinct().withColumn("label", F.upper("source"))
    choice = skew_aware_join(
        docs, dim, "source", n_partitions=32, broadcast_threshold_rows=0
    )
    if choice.strategy != "salted":  # the skewed branch, by design — a bare
        # assert would be stripped under `python -O` and let a regression to
        # the broadcast/plain branch pass silently
        raise RuntimeError(f"expected the salted branch, got {choice}")
    return (
        choice.df.groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .orderBy("label")
    )


@query(
    "pareto_customers",
    oracle="""
    WITH cust AS (
        SELECT o_custkey AS custkey,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS spend_cents,
               max(o_orderdate) AS last_order
        FROM orders GROUP BY 1
    )
    SELECT CAST(custkey AS BIGINT) AS custkey, n_orders, spend_cents, last_order
    FROM cust a
    WHERE NOT EXISTS (
        SELECT 1 FROM cust b
        WHERE b.n_orders >= a.n_orders AND b.spend_cents >= a.spend_cents
          AND b.last_order >= a.last_order
          AND (b.n_orders > a.n_orders OR b.spend_cents > a.spend_cents
               OR b.last_order > a.last_order)
    )
    """,
)
def pareto_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The undominated customers — the 3-objective Pareto frontier
    (skyline) over order count, lifetime spend, and recency, all
    maximized: no other customer is at-least-as-good on all three and
    strictly better on one. operators/skyline.py: local frontier per
    Arrow batch (map-only, vectorized dominance), then an exact
    dominance anti-join over the small candidate union — quadratic only
    in the frontier, never the customer count. Spend is integer cents
    (o_totalprice has 2 decimals), so dominance is integer/date-exact on
    both engines and the frontier hash-matches the oracle's NOT EXISTS
    replay at every SF."""
    from streamds_spark.operators.skyline import pareto_frontier

    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("spend_cents"),
        F.max("o_orderdate").alias("last_order"),
    )
    return pareto_frontier(
        cust, maximize=("n_orders", "spend_cents", "last_order")
    ).select(
        F.col("custkey").cast("bigint").alias("custkey"),
        "n_orders",
        "spend_cents",
        "last_order",
    )
