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


@query(
    "text_char_entropy",
    oracle=r"""
    WITH chars AS (
        SELECT doc_id, unnest(string_split(text, '')) AS ch, length(text) AS n
        FROM documents WHERE length(text) > 0
    ),
    freqs AS (
        SELECT doc_id, ch, count(*)::DOUBLE / any_value(n) AS p
        FROM chars GROUP BY doc_id, ch
    )
    SELECT doc_id, round(-sum(p * ln(p)), 4) AS char_entropy
    FROM freqs GROUP BY doc_id
    """,
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per doc — the cheap perplexity proxy
    (low entropy ⇒ repetitive/low-quality text; high ⇒ noise). Two doc-local
    aggregations, no cross-doc shuffle."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    chars = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), "")).alias("ch"), F.length("text").alias("n")
    )
    freqs = chars.groupBy("doc_id", "ch").agg(
        (F.count("*").cast("double") / F.first("n")).alias("p")
    )
    return freqs.groupBy("doc_id").agg(
        F.round(-F.sum(F.col("p") * F.log(F.col("p"))), 4).alias("char_entropy")
    )


@query(
    "vocab_growth",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) AS w
        FROM documents
    ),
    first_seen AS (
        SELECT w, min(doc_id) AS first_doc FROM tok GROUP BY w
    ),
    new_per_doc AS (
        SELECT first_doc AS doc_id, count(*) AS n_new FROM first_seen GROUP BY first_doc
    )
    SELECT doc_id,
           CAST(sum(n_new) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS vocab_size
    FROM new_per_doc
    """,
)
def vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve (Heaps'-law diagnostic): cumulative distinct
    token count in doc_id order — first-occurrence attribution + running sum,
    no quadratic distinct-over-prefix scan."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
    first_seen = tok.groupBy("w").agg(F.min("doc_id").alias("first_doc"))
    new_per_doc = first_seen.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count("*").alias("n_new")
    )
    w = W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    return new_per_doc.select(
        "doc_id", F.sum("n_new").over(w).cast("bigint").alias("vocab_size")
    )


@query(
    "text_bigram_logprob",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS t
        FROM documents
    ),
    big AS (
        SELECT doc_id,
               unnest(CASE WHEN len(t) >= 2
                      THEN list_transform(range(1, len(t)), i -> t[i])
                      ELSE [] END) AS w1,
               unnest(CASE WHEN len(t) >= 2
                      THEN list_transform(range(2, len(t) + 1), i -> t[i])
                      ELSE [] END) AS w2
        FROM toks
    ),
    bc AS (SELECT w1 AS bw1, w2 AS bw2, count(*) AS c2 FROM big GROUP BY w1, w2),
    uc AS (SELECT w1 AS uw1, count(*) AS c1 FROM big GROUP BY w1)
    SELECT doc_id, round(avg(ln(CAST(c2 AS DOUBLE) / c1)), 4) AS avg_logprob
    FROM big
    JOIN bc ON w1 = bw1 AND w2 = bw2
    JOIN uc ON w1 = uw1
    GROUP BY doc_id
    """,
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical LM quality score: per-doc mean log P(w2|w1) under the
    corpus's own bigram model (c(w1,w2)/c(w1)) — the classic cheap perplexity
    proxy for pretrain filtering (gibberish and boilerplate score low/high
    against the corpus distribution).

    Plan: one explode to bigrams, two partial-agg count tables (pair and
    unigram), then two shuffled equi-joins back on the bigram stream and a
    per-doc aggregate. The count tables scale with vocabulary, not corpus
    size, but are NOT broadcast (a 100 TB corpus's bigram vocab can be
    billions) — the joins shuffle on (w1, w2)/(w1), where Zipf skew is
    AQE-splittable. No UDF anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens(F.col("text")).alias("t")).filter(
        F.size("t") >= 2
    )
    big = toks.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.expr("slice(t, 1, size(t) - 1)").alias("w1"),
                F.expr("slice(t, 2, size(t) - 1)").alias("w2"),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    bc = big.groupBy(
        F.col("w1").alias("bw1"), F.col("w2").alias("bw2")
    ).agg(F.count("*").alias("c2"))
    uc = big.groupBy(F.col("w1").alias("uw1")).agg(F.count("*").alias("c1"))
    return (
        big.join(bc, (big.w1 == bc.bw1) & (big.w2 == bc.bw2))
        .join(uc, big.w1 == uc.uw1)
        .groupBy("doc_id")
        .agg(
            F.round(F.avg(F.log(F.col("c2").cast("double") / F.col("c1"))), 4).alias(
                "avg_logprob"
            )
        )
    )


@query(
    "quality_deciles",
    oracle=r"""
    WITH sc AS (
        SELECT doc_id, n_chars,
               CASE WHEN len(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) > 0
                    THEN CAST(len(list_filter(list_filter(string_split_regex(text, '\s+'), w -> w <> ''),
                              w -> list_contains(['the','a','of','and','to','in','is','it','for','on'], lower(w))))
                         AS DOUBLE)
                         / len(list_filter(string_split_regex(text, '\s+'), w -> w <> ''))
                    ELSE 0.0 END AS score
        FROM documents
    ),
    binned AS (
        SELECT doc_id, n_chars, score,
               ntile(10) OVER (ORDER BY score, doc_id) AS decile
        FROM sc
    )
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(min(score), 4) AS min_score,
           round(max(score), 4) AS max_score,
           round(avg(n_chars), 4) AS avg_chars
    FROM binned GROUP BY decile
    """,
)
def quality_deciles(
    spark: SparkSession, sf_dir: str, exact: bool = True
) -> DataFrame:
    """Decile report over the stopword-ratio quality score — the curriculum /
    threshold-picking view ("what do I lose if I cut the bottom 20%?").

    ntile runs over a GLOBAL order, which is a single-partition window — fine
    here because the windowed rows are (doc_id, score) pairs, not documents.
    At 100 TB you'd swap the exact ntile for approx_percentile bin edges
    (one aggregate) and a broadcast range join; the report schema is identical."""
    from streamds_spark.functions.text import stopword_ratio

    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    sc = docs.select(
        "doc_id", "n_chars", stopword_ratio(tokens(F.col("text"))).alias("score")
    )
    if not exact:
        # exact=False IS that documented swap: sketch edges + map-side
        # assignment (no window at all); depths off by ≤2N/accuracy plus
        # boundary tie groups (ties land whole in the lower decile) —
        # divergence quantified by tests/test_approx_variants.py
        from streamds_spark.operators.ranking import approx_equidepth_buckets

        return (
            approx_equidepth_buckets(sc, "score", 10, bucket_col="decile")
            .groupBy("decile")
            .agg(
                F.count("*").alias("n_docs"),
                F.round(F.min("score"), 4).alias("min_score"),
                F.round(F.max("score"), 4).alias("max_score"),
                F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            )
        )
    w = Window.orderBy("score", "doc_id")
    return (
        sc.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.min("score"), 4).alias("min_score"),
            F.round(F.max("score"), 4).alias("max_score"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
    )


_PREF_K = 5  # pairs per source


@query(
    "preference_pairs",
    oracle=rf"""
    WITH scored AS (
        SELECT doc_id, source,
               len(list_filter(string_split_regex(text, '\s+'), w -> w <> ''))
                   AS n_toks
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, source, n_toks,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_toks DESC, doc_id) AS rk_top,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_toks ASC, doc_id) AS rk_bot
        FROM scored
    )
    SELECT t.source,
           CAST(t.rk_top AS INT) AS pair_rank,
           t.doc_id AS chosen_id,
           b.doc_id AS rejected_id,
           CAST(t.n_toks - b.n_toks AS BIGINT) AS margin
    FROM ranked t
    JOIN ranked b ON b.source = t.source AND b.rk_bot = t.rk_top
    WHERE t.rk_top <= {_PREF_K} AND t.doc_id <> b.doc_id
    """,
)
def preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair assembly (RLHF/DPO data prep): within each source,
    pair the k-th best document with the k-th worst by a quality proxy
    (token count here; swap in quality_classifier_score for the modeled
    version) and report the quality margin. Deterministic rank tie-breaks
    make the pairing replayable.

    Plan: both rank windows PARTITION BY source (rank filter directly above
    each window — WindowGroupLimit-eligible like domain_cap_sample), then a
    (source, rank) equi-join of two k-row-per-source sides."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        F.size(tokens(F.col("text"))).alias("n_toks"),
    )
    w_top = Window.partitionBy("source").orderBy(F.col("n_toks").desc(), "doc_id")
    w_bot = Window.partitionBy("source").orderBy(F.col("n_toks").asc(), "doc_id")
    top = scored.select(
        "source", "doc_id", "n_toks", F.row_number().over(w_top).alias("pair_rank")
    ).filter(F.col("pair_rank") <= _PREF_K)
    bot = scored.select(
        "source",
        F.col("doc_id").alias("rejected_id"),
        F.col("n_toks").alias("bot_toks"),
        F.row_number().over(w_bot).alias("pair_rank"),
    ).filter(F.col("pair_rank") <= _PREF_K)
    return (
        top.join(bot, ["source", "pair_rank"])
        .filter(F.col("doc_id") != F.col("rejected_id"))
        .select(
            "source",
            F.col("pair_rank").cast("int").alias("pair_rank"),
            F.col("doc_id").alias("chosen_id"),
            "rejected_id",
            (F.col("n_toks") - F.col("bot_toks")).cast("bigint").alias("margin"),
        )
    )


@query(
    "logreg_gradient_check",
    oracle=r"""
    WITH tf AS (
        SELECT doc_id,
               ('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024 AS j,
               count(*) AS c
        FROM (SELECT doc_id,
                     unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                        w -> w <> '')) AS tok
              FROM documents)
        GROUP BY doc_id, 2
    ),
    labeled AS (
        SELECT tf.doc_id, tf.j, tf.c,
               CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
        FROM tf JOIN documents d ON tf.doc_id = d.doc_id
    ),
    grad AS (
        SELECT j, CAST(sum((1 - 2 * y) * c) AS BIGINT) AS grad2
        FROM labeled GROUP BY j
    )
    SELECT j, grad2 FROM grad ORDER BY abs(grad2) DESC, j LIMIT 20
    """,
)
def logreg_gradient_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first GD iteration of the distributed quality-classifier trainer
    (operators/logreg.py), made exactly checkable: at w=0 every residual is
    0.5 - y, so with raw term counts the gradient is sum((0.5 - y) * c) —
    reported doubled as the integer grad2 = sum((1-2y)*c), which both
    engines compute exactly. Labels: y = 1 iff lang='en'. Top-20 features by
    |gradient| — the machinery (hashing, doc join, feature-keyed aggregate)
    is the trainer's per-iteration data path."""
    docs = load_table(spark, sf_dir, "documents")
    from streamds_spark.functions.hashing import md5_int60

    tf = (
        docs.select("doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("tok"))
        .select("doc_id", (md5_int60(F.col("tok")) % 1024).alias("j"))
        .groupBy("doc_id", "j")
        .agg(F.count("*").alias("c"))
    )
    y = docs.select("doc_id", (F.col("lang") == "en").cast("int").alias("y"))
    grad = (
        tf.join(y, "doc_id")
        .groupBy("j")
        .agg(F.sum((1 - 2 * F.col("y")) * F.col("c")).cast("bigint").alias("grad2"))
    )
    return grad.orderBy(F.abs("grad2").desc(), "j").limit(20)
