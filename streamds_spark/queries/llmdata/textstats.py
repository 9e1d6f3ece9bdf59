"""Text analysis operators over `documents`: language-ID heuristic, quality
scoring, token counting, document fingerprinting.

All pure Catalyst expressions (split/filter/aggregate higher-order functions) —
one scan, no shuffle except where a groupBy is the point. At 100 TB each of
these is a map-only pass that pushes `text` column pruning into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.functions.hashing import md5_int60
from streamds_spark.functions.text import EN_STOPWORDS, shingles_expr, tokens
from streamds_spark.registry import query

_SW_LIST = ", ".join(f"'{w}'" for w in EN_STOPWORDS)


@query(
    "text_token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) AS INT)
               AS n_tokens,
           n_chars
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count per document (the BPE-ish regex variant is in
    tests; this is the canonical cheap pass)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.size(tokens(F.col("text"))).alias("n_tokens"), "n_chars"
    )


@query(
    "text_quality_score",
    oracle=rf"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS toks,
               length(text) AS nchar
        FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_tokens,
           round(CASE WHEN len(toks) > 0
                 THEN CAST(len(list_filter(toks, w -> list_contains([{_SW_LIST}], lower(w))))
                      AS DOUBLE) / len(toks) ELSE 0.0 END, 4) AS stopword_ratio,
           round(CASE WHEN len(toks) > 0
                 THEN CAST(nchar AS DOUBLE) / len(toks) ELSE 0.0 END, 4) AS avg_token_len
    FROM t
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristics: token count, stopword ratio, chars-per-token.
    (Length/punct/stopword family per C4/Gopher-style filtering rules.)"""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_toks = F.size(toks)
    n_sw = F.size(F.filter(toks, lambda w: F.array_contains(sw, F.lower(w))))
    return docs.select(
        "doc_id",
        n_toks.alias("n_tokens"),
        F.round(
            F.when(n_toks > 0, n_sw.cast("double") / n_toks).otherwise(F.lit(0.0)), 4
        ).alias("stopword_ratio"),
        F.round(
            F.when(n_toks > 0, F.length("text").cast("double") / n_toks).otherwise(F.lit(0.0)), 4
        ).alias("avg_token_len"),
    )


@query(
    "text_lang_id",
    oracle=rf"""
    WITH t AS (
        SELECT doc_id, lang AS labeled_lang,
               list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS toks
        FROM documents
    )
    SELECT doc_id, labeled_lang,
           CASE WHEN len(toks) > 0 AND
                     CAST(len(list_filter(toks, w -> list_contains([{_SW_LIST}], lower(w))))
                          AS DOUBLE) / len(toks) >= 0.05
                THEN 'en' ELSE 'und' END AS detected_lang
    FROM t
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/stopword language-ID heuristic: English stopword density ≥ 5% → 'en'.
    (A real model would be a broadcast n-gram profile table joined the same way;
    the labeled `lang` column rides along for evaluation.)"""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_toks = F.size(toks)
    ratio = F.size(F.filter(toks, lambda w: F.array_contains(sw, F.lower(w)))).cast("double") / n_toks
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.when((n_toks > 0) & (ratio >= 0.05), F.lit("en")).otherwise(F.lit("und")).alias(
            "detected_lang"
        ),
    )


@query(
    "text_fingerprint",
    oracle=r"""
    WITH t AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS t
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               unnest(CASE WHEN len(t) >= 4
                      THEN list_transform(range(1, len(t) - 2),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
                      ELSE [] END) AS g
        FROM t
    )
    SELECT doc_id, min(('0x' || substr(md5(g), 1, 15))::BIGINT) AS fingerprint
    FROM sh GROUP BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: min rolling-hash over 4-word windows (winnowing with
    window = whole doc). Identical-content docs collide exactly; the hash is the
    cross-engine md5-int (functions/hashing.py)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = (
        docs.select("doc_id", tokens(F.col("text")).alias("toks"))
        .select("doc_id", F.explode(shingles_expr("toks", 4)).alias("g"))
    )
    return sh.groupBy("doc_id").agg(F.min(md5_int60(F.col("g"))).alias("fingerprint"))


@query(
    "text_corpus_stats",
    oracle="""
    SELECT lang, source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(avg(n_chars), 4) AS avg_chars
    FROM documents GROUP BY lang, source
    """,
)
def text_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition rollup by (lang, source) — the pipeline health query."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


WINNOW_K = 2  # shingle size (words) hashed into the k-gram stream
WINNOW_W = 4  # winnowing window: one fingerprint chosen per w consecutive hashes


@query(
    "text_winnowing_fingerprints",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS t
        FROM documents
    ),
    hs AS (
        SELECT doc_id,
               CASE WHEN len(t) >= {WINNOW_K}
                    THEN list_transform(range(1, len(t) - {WINNOW_K} + 2),
                         i -> ('0x' || substr(md5(t[i] || ' ' || t[i+1]), 1, 7))::BIGINT)
                    ELSE [] END AS h
        FROM toks
    ),
    fp AS (
        SELECT doc_id,
               list_distinct(CASE WHEN len(h) >= {WINNOW_W}
                    THEN list_transform(range(1, len(h) - {WINNOW_W} + 2),
                         i -> list_min(h[i:i+{WINNOW_W}-1]))
                    ELSE [] END) AS fps
        FROM hs
    )
    SELECT doc_id,
           CAST(len(fps) AS BIGINT) AS n_fingerprints,
           list_min(fps) AS min_fp,
           list_max(fps) AS max_fp
    FROM fp
    WHERE len(fps) > 0
    """,
)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003, the MOSS
    scheme): hash the document's 2-word shingle stream, slide a window of
    {w}, keep each window's minimum hash — guaranteed to share fingerprints
    with any document that shares a long-enough substring, at a bounded
    sampling density. The distinct fingerprint set per doc is summarized as
    (count, min, max) for cross-engine comparison.

    The shingle hashes are exploded to (doc_id, pos, hash) rows — md5 runs
    exactly once per shingle — and the per-window minimum is a sliding frame
    min over ONE shuffle on doc_id; the final per-doc aggregate reuses that
    partitioning (no second exchange). (A pure-array formulation was 20-50×
    slower: CollapseProject inlines the array expression into every reference,
    re-running the hash pipeline per output column and per window slice.)"""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    k, w = WINNOW_K, WINNOW_W
    toks = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    sh = toks.filter(F.size("t") >= k).select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - k + 1),
                lambda i: F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                " ", F.element_at("t", i), F.element_at("t", i + 1)
                            )
                        ),
                        1,
                        7,
                    ),
                    16,
                    10,
                ).cast("bigint"),
            )
        ).alias("pos", "hv"),
    )
    byname = Window.partitionBy("doc_id")
    sliding = byname.orderBy("pos").rowsBetween(Window.currentRow, w - 1)
    wins = (
        sh.withColumn("n", F.max("pos").over(byname))
        .withColumn("fp", F.min("hv").over(sliding))
        .filter(F.col("pos") <= F.col("n") - w + 1)
    )
    return wins.groupBy("doc_id").agg(
        F.count_distinct("fp").alias("n_fingerprints"),
        F.min("fp").alias("min_fp"),
        F.max("fp").alias("max_fp"),
    )


# Stopword families for the multi-language voting upgrade of text_lang_id.
# Small, high-frequency function words per language (public linguistic
# knowledge); overlaps (fr/es 'la', 'de') are fine — argmax voting with an
# alphabetical tie-break decides.
LANG_STOPWORDS = {
    "de": ("der", "die", "und", "das", "ist", "nicht", "mit", "ein"),
    "en": ("the", "and", "of", "to", "in", "is", "that", "with"),
    "es": ("el", "los", "que", "y", "en", "un", "por", "como"),
    "fr": ("le", "les", "et", "des", "une", "est", "dans", "pour"),
}


@query(
    "lang_id_multi",
    oracle=rf"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS toks
        FROM documents
    ),
    scored AS (
        SELECT doc_id, len(toks) AS n,
               {', '.join(
                   f"len(list_filter(toks, w -> list_contains(["
                   + ", ".join(f"'{w}'" for w in ws)
                   + f"], w))) AS c_{lang}"
                   for lang, ws in sorted(LANG_STOPWORDS.items())
               )}
        FROM t WHERE len(toks) > 0
    )
    SELECT doc_id,
           {', '.join(
               f"round(CAST(c_{lang} AS DOUBLE) / n, 4) AS score_{lang}"
               for lang in sorted(LANG_STOPWORDS)
           )},
           CASE greatest(c_de, c_en, c_es, c_fr)
                WHEN c_de THEN 'de' WHEN c_en THEN 'en'
                WHEN c_es THEN 'es' ELSE 'fr' END AS lang_guess
    FROM scored
    """,
)
def lang_id_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-language ID by stopword-family voting: per-language hit rates
    over {de, en, es, fr} function-word sets, argmax with alphabetical
    tie-break (the CASE checks languages in sorted order, so the first
    language attaining the max wins — identical in both engines). Map-only;
    real pipelines swap the families for fastText-style n-gram profiles, the
    plan shape is unchanged."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", tokens(F.lower(F.col("text"))).alias("toks")
    ).where(F.size("toks") > 0)
    langs = sorted(LANG_STOPWORDS)
    def _family_count(ws):
        fam = F.array(*[F.lit(x) for x in ws])
        return F.size(F.filter("toks", lambda w: F.array_contains(fam, w)))

    counts = [
        _family_count(LANG_STOPWORDS[lang]).alias(f"c_{lang}") for lang in langs
    ]
    scored = t.select("doc_id", F.size("toks").alias("n"), *counts)
    best = F.greatest(*[F.col(f"c_{lang}") for lang in langs])
    guess = F.when(F.col("c_de") == best, "de")
    for lang in ("en", "es"):
        guess = guess.when(F.col(f"c_{lang}") == best, lang)
    guess = guess.otherwise("fr")
    return scored.select(
        "doc_id",
        *[
            F.round(F.col(f"c_{lang}").cast("double") / F.col("n"), 4).alias(
                f"score_{lang}"
            )
            for lang in langs
        ],
        guess.alias("lang_guess"),
    )


@query(
    "sentence_stats",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[.!?]+(\s|$)')) AS INT) AS n_sentences,
           CAST(len(regexp_extract_all(text, ',|;|:')) AS INT) AS n_clause_marks,
           round(CASE WHEN len(regexp_extract_all(text, '[.!?]+(\s|$)')) > 0
                 THEN CAST(length(text) AS DOUBLE)
                      / len(regexp_extract_all(text, '[.!?]+(\s|$)'))
                 ELSE 0.0 END, 4) AS avg_sentence_chars
    FROM documents
    """,
)
def sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation stats via terminator counting (a lookbehind-free
    rule so the Java and RE2 regex engines agree): sentence ends are runs of
    .!? followed by whitespace or end-of-text. Map-only regexp_count — the
    cheap pre-pass before a real segmenter, and the denominator for
    sentences-per-doc style quality gates."""
    docs = load_table(spark, sf_dir, "documents")
    n_sent = F.expr(r"regexp_count(text, '[.!?]+(\\s|$)')")
    return docs.select(
        "doc_id",
        n_sent.cast("int").alias("n_sentences"),
        F.expr("regexp_count(text, ',|;|:')").cast("int").alias("n_clause_marks"),
        F.round(
            F.when(n_sent > 0, F.length("text").cast("double") / n_sent).otherwise(0.0), 4
        ).alias("avg_sentence_chars"),
    )


TEXTRANK_ITERS = 6
TEXTRANK_SCALE = 1_000_000_000
TEXTRANK_MINLEN = 4  # content words only (drops short function words)
TEXTRANK_MINPAIR = 3  # adjacency count floor for an undirected edge
TEXTRANK_TOPK = 25


@query(
    "textrank_keywords",
    oracle=f"""
    WITH RECURSIVE toks AS (
        SELECT doc_id,
               lower(unnest(list_filter(string_split_regex(text, '\\s+'),
                                        w -> w <> ''))) AS w,
               generate_subscripts(list_filter(string_split_regex(text, '\\s+'),
                                               w -> w <> ''), 1) AS i
        FROM documents
    ),
    adj AS (
        SELECT w AS a,
               lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS b
        FROM toks
    ),
    pairs AS (
        SELECT least(a, b) AS u, greatest(a, b) AS v, count(*) AS c
        FROM adj
        WHERE b IS NOT NULL AND a <> b
          AND length(a) >= {TEXTRANK_MINLEN} AND length(b) >= {TEXTRANK_MINLEN}
        GROUP BY 1, 2
    ),
    und AS (SELECT u, v FROM pairs WHERE c >= {TEXTRANK_MINPAIR}),
    edges AS (
        SELECT u AS src, v AS dst FROM und
        UNION ALL SELECT v AS src, u AS dst FROM und
    ),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
    pr(it, node, rank) AS (
        SELECT 0, src, CAST({TEXTRANK_SCALE} AS BIGINT)
        FROM (SELECT DISTINCT src FROM edges)
      UNION ALL
        SELECT it + 1, node,
               CAST({((100 - 85) * TEXTRANK_SCALE) // 100}
                    + (85 * inflow) // 100 AS BIGINT)
        FROM (
            SELECT pr.it, e.dst AS node, SUM(pr.rank // d.deg) AS inflow
            FROM pr
            JOIN edges e ON pr.node = e.src
            JOIN deg d ON d.src = e.src
            WHERE pr.it < {TEXTRANK_ITERS}
            GROUP BY 1, 2
        )
    )
    SELECT node AS word, CAST(rank AS BIGINT) AS rank_units
    FROM pr WHERE it = {TEXTRANK_ITERS}
    ORDER BY rank_units DESC, word LIMIT {TEXTRANK_TOPK}
    """,
)
def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004, unweighted-graph
    simplification): corpus keywords = top-{TEXTRANK_TOPK} PageRank nodes of
    the undirected word co-occurrence graph (adjacent lowercased content
    words of >= {TEXTRANK_MINLEN} chars, edge kept when the pair co-occurs >=
    {TEXTRANK_MINPAIR} times). Ranking runs in FIXED-POINT INTEGER PageRank
    (operators/pagerank.pagerank_fixed_point): every step is truncated
    integer arithmetic, so the result is aggregation-ORDER independent and
    the DuckDB recursive-CTE oracle replaying the same recurrence matches
    hash-exactly — the float formulation could never be cross-engine exact.

    Plan: one scan explodes adjacency (map-only), the pair count + floor
    collapses to a VOCABULARY-bounded edge relation before anything
    iterative, then {TEXTRANK_ITERS} rounds of the same-key join+agg over
    that bounded graph; TakeOrdered emits the k-sized tail. At 100 TB only
    the adjacency count touches corpus-sized data. spread=True (round 11):
    the tokenize+zip+explode adjacency stage otherwise runs as ONE task on
    the single-split scan; everything downstream is integer pair counts —
    partitioning-invariant."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    t = F.expr("filter(split(text, '\\\\s+'), w -> w != '')")
    toks = docs.select(F.transform(t, lambda w: F.lower(w)).alias("ws"))
    adj = (
        toks.selectExpr(
            "slice(ws, 1, greatest(size(ws) - 1, 0)) AS xs",
            "slice(ws, 2, greatest(size(ws) - 1, 0)) AS ys",
        )
        .select(F.explode(F.arrays_zip("xs", "ys")).alias("p"))
        .select(F.col("p.xs").alias("a"), F.col("p.ys").alias("b"))
    )
    pairs = (
        adj.where(
            (F.col("a") != F.col("b"))
            & (F.length("a") >= TEXTRANK_MINLEN)
            & (F.length("b") >= TEXTRANK_MINLEN)
        )
        .select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .groupBy("u", "v")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= TEXTRANK_MINPAIR)
    )
    edges = pairs.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionByName(
        pairs.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    from streamds_spark.operators.pagerank import pagerank_fixed_point

    ranks = pagerank_fixed_point(
        edges, damping_pct=85, scale=TEXTRANK_SCALE, max_iter=TEXTRANK_ITERS
    )
    return (
        ranks.select(F.col("node").alias("word"), F.col("rank").alias("rank_units"))
        .orderBy(F.col("rank_units").desc(), "word")
        .limit(TEXTRANK_TOPK)
    )
