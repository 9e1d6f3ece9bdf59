"""Segment-level corpus operators: boilerplate removal, inverted index, SemDeDup.

Three operator families common in web-scale LLM corpus pipelines that act on
sub-document or cross-document structure rather than whole documents:

  segment dedup   — CCNet/RefinedWeb-style "line-level" dedup: split each doc
                    into fixed token segments, compute each segment's document
                    frequency corpus-wide, strip segments that repeat across
                    many documents (navigation chrome, license banners), and
                    re-emit the cleaned doc. The corpus here has no newlines,
                    so the segment unit is a fixed 3-token window; with real
                    web text the splitter would be `split(text, '\\n')` and
                    everything downstream is unchanged.
  inverted index  — term → (doc_freq, term_freq, postings) over the corpus;
                    the retrieval-side complement of bm25_scores.
  SemDeDup        — semantic dedup (Abbas et al. 2023): cluster embeddings
                    around k centroids, then look for near-duplicate pairs
                    only WITHIN a cluster — the cluster assignment prunes the
                    O(n²) pair space the way LSH bands do for MinHash.

Scale notes (100 TB posture):
  * segment dedup is two shuffles: one groupBy on a uniform md5 segment key
    (no skew by construction), one groupBy doc_id to reassemble. The join
    back to segments is an equi-join on the same md5 key, so AQE can plan it
    shuffle-local. No UDFs; everything is codegen'd expressions.
  * the inverted index caps the materialized postings at a head prefix —
    full postings at scale stay as the exploded (term, doc_id) relation,
    bucketed by term (io/sinks.write_bucketed), never a driver collect.
  * SemDeDup broadcasts k×dim centroid literals (k=8 here; n/avg_cluster
    in production) and bounds the within-cluster verify to an id band,
    exactly like dedup_embedding_cosine bounds its candidate set. The
    quadratic step is therefore O(n·band), not O(n²/k).

Cross-engine determinism: segment keys are md5 strings; cosine arithmetic is
a sequential left-fold in BOTH engines (Spark `aggregate`, DuckDB
`list_reduce`) over the same index order, so the doubles are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.functions.text import tokens
from streamds_spark.registry import query

SEG_TOKENS = 3  # tokens per segment ("line" stand-in; corpus has no newlines)
SEG_DF_MAX = 2  # segments seen in more than this many docs are boilerplate
POSTINGS_HEAD = 5  # materialized postings prefix per term
SEMDEDUP_K = 8  # centroid count (demo scale; n/avg_cluster_size in production)
SEMDEDUP_BAND = 20  # within-cluster candidate id band
SEMDEDUP_TAU = 0.3  # near-dup cosine threshold (synthetic vecs are near-random)


@query(
    "segment_dedup_boilerplate",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS t
        FROM documents
    ),
    chunked AS (
        SELECT doc_id,
               CASE WHEN len(t) >= 1
                    THEN list_transform(range(0, CAST(ceil(len(t) / {SEG_TOKENS}.0) AS INT)),
                         i -> {{'pos': i,
                               'seg': array_to_string(t[i*{SEG_TOKENS}+1 : i*{SEG_TOKENS}+{SEG_TOKENS}], ' ')}})
                    ELSE [] END AS cs
        FROM toks
    ),
    segs AS (
        SELECT doc_id, u.pos AS pos, u.seg AS seg
        FROM (SELECT doc_id, unnest(cs) AS u FROM chunked)
    ),
    freq AS (
        SELECT md5(seg) AS seg_h, count(DISTINCT doc_id) AS df
        FROM segs GROUP BY md5(seg)
    ),
    joined AS (
        SELECT s.doc_id, s.pos, s.seg, f.df
        FROM segs s JOIN freq f ON md5(s.seg) = f.seg_h
    ),
    rep AS (
        SELECT doc_id,
               count(*) AS n_segs,
               count(*) FILTER (WHERE df <= {SEG_DF_MAX}) AS kept_segs,
               md5(coalesce(string_agg(seg, ' ' ORDER BY pos) FILTER (WHERE df <= {SEG_DF_MAX}), ''))
                   AS clean_hash
        FROM joined GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(r.n_segs, 0) AS BIGINT) AS n_segs,
           CAST(coalesce(r.kept_segs, 0) AS BIGINT) AS kept_segs,
           coalesce(r.clean_hash, md5('')) AS clean_hash
    FROM documents d LEFT JOIN rep r ON d.doc_id = r.doc_id
    """,
)
def segment_dedup_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document segment dedup (boilerplate removal): fixed 3-token
    segments whose corpus document-frequency exceeds SEG_DF_MAX are stripped;
    emits per-doc total/kept segment counts and the md5 of the cleaned text.

    Plan: posexplode segments → groupBy md5(seg) for df (uniform key, map-side
    partial countDistinct) → equi-join back on the same key → groupBy doc_id
    reassembling kept segments in order via sort_array(collect_list(struct)).
    """
    docs = load_table(spark, sf_dir, "documents")
    n = SEG_TOKENS
    chunks = F.expr(
        f"CASE WHEN size(toks) >= 1 THEN transform("
        f"  sequence(0, CAST(ceil(size(toks) / {n}.0) AS INT) - 1),"
        f"  i -> concat_ws(' ', slice(toks, i*{n}+1, {n}))) "
        f"ELSE array() END"
    )
    segs = (
        docs.select("doc_id", tokens(F.col("text")).alias("toks"))
        .select("doc_id", F.posexplode(chunks).alias("pos", "seg"))
        .withColumn("seg_h", F.md5(F.col("seg").cast("binary")))
    )
    freq = segs.groupBy("seg_h").agg(F.countDistinct("doc_id").alias("df"))
    joined = segs.join(freq, "seg_h")
    kept = F.when(F.col("df") <= SEG_DF_MAX, F.struct("pos", "seg"))
    rep = joined.groupBy("doc_id").agg(
        F.count("*").alias("n_segs"),
        F.count(F.when(F.col("df") <= SEG_DF_MAX, 1)).alias("kept_segs"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(F.array_sort(F.collect_list(kept)), lambda x: x["seg"]),
            ).cast("binary")
        ).alias("clean_hash"),
    )
    return docs.select("doc_id").join(rep, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_segs"), F.lit(0)).cast("bigint").alias("n_segs"),
        F.coalesce(F.col("kept_segs"), F.lit(0)).cast("bigint").alias("kept_segs"),
        F.coalesce(F.col("clean_hash"), F.md5(F.lit("").cast("binary"))).alias("clean_hash"),
    )


@query(
    "inverted_index_postings",
    oracle=rf"""
    WITH terms AS (
        SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) AS w
        FROM documents
    )
    SELECT w,
           count(DISTINCT doc_id) AS doc_freq,
           count(*) AS term_freq,
           array_to_string(
               list_transform((list(DISTINCT doc_id ORDER BY doc_id))[1:{POSTINGS_HEAD}],
                              x -> x::VARCHAR), ',') AS postings_head
    FROM terms GROUP BY w
    """,
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index: per term, document frequency, collection term frequency,
    and the first POSTINGS_HEAD doc_ids of the sorted posting list.

    One explode + one shuffle on the term. The materialized posting list is a
    bounded prefix — at 100 TB the full postings remain the exploded
    (term, doc_id) relation written bucketed by term, and this query is the
    dictionary/stats head over it; collect_set here is bounded per term by
    the corpus df, and the prefix keeps the output row narrow.
    """
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
    return terms.groupBy("w").agg(
        F.countDistinct("doc_id").alias("doc_freq"),
        F.count("*").alias("term_freq"),
        F.concat_ws(
            ",",
            F.transform(
                F.slice(F.array_sort(F.collect_set("doc_id")), 1, POSTINGS_HEAD),
                lambda x: x.cast("string"),
            ),
        ).alias("postings_head"),
    )


def _centroid_rows(spark: SparkSession, sf_dir: str) -> list:
    """The SEMDEDUP_K embeddings with the lowest vec_id — deterministic
    centroid seeds (k-means++ at scale; fixed seeds keep the oracle exact).
    Driver holds k×dim floats only."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .orderBy("vec_id")
        .limit(SEMDEDUP_K)
        .collect()
    )


def _cos_expr(vec_col: str, other: str) -> str:
    """Sequential left-fold cosine between two array<double> SQL expressions —
    fold order matches DuckDB list_reduce so doubles agree bit-for-bit."""
    dot = (
        f"aggregate(zip_with({vec_col}, {other}, (x, y) -> x * y), "
        f"CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
    )
    n1 = (
        f"sqrt(aggregate(transform({vec_col}, x -> x * x), "
        f"CAST(0.0 AS DOUBLE), (a, x) -> a + x))"
    )
    n2 = (
        f"sqrt(aggregate(transform({other}, x -> x * x), "
        f"CAST(0.0 AS DOUBLE), (a, x) -> a + x))"
    )
    return f"({dot} / ({n1} * {n2}))"


def _duckdb_cos(a: str, b: str) -> str:
    """DuckDB mirror of _cos_expr: same fold order via list_reduce."""
    dot = f"list_reduce(list_transform(range(1, 65), i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
    na = f"sqrt(list_reduce(list_transform({a}, x -> x * x), (x, y) -> x + y))"
    nb = f"sqrt(list_reduce(list_transform({b}, x -> x * x), (x, y) -> x + y))"
    return f"({dot} / ({na} * {nb}))"


def _semdedup_oracle() -> str:
    cos_vc = _duckdb_cos("e.v", "c.v")
    cos_ab = _duckdb_cos("a.v", "b.v")
    return f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    c AS (
        SELECT vec_id AS centroid_id, v FROM e ORDER BY vec_id LIMIT {SEMDEDUP_K}
    ),
    scored AS (
        SELECT e.vec_id, c.centroid_id, {cos_vc} AS cos_c,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {cos_vc} DESC, c.centroid_id DESC) AS rn
        FROM e CROSS JOIN c
    ),
    assigned AS (
        SELECT vec_id, centroid_id, round(cos_c, 4) AS cos_c FROM scored WHERE rn = 1
    ),
    pairs AS (
        SELECT a.centroid_id, count(*) AS neardup_pairs
        FROM (SELECT s.vec_id, s.centroid_id, e.v FROM assigned s JOIN e USING (vec_id)) a
        JOIN (SELECT s.vec_id, s.centroid_id, e.v FROM assigned s JOIN e USING (vec_id)) b
          ON b.centroid_id = a.centroid_id
         AND b.vec_id > a.vec_id AND b.vec_id <= a.vec_id + {SEMDEDUP_BAND}
        WHERE {cos_ab} >= {SEMDEDUP_TAU}
        GROUP BY a.centroid_id
    )
    SELECT s.centroid_id,
           count(*) AS cluster_size,
           round(CAST(sum(CAST(s.cos_c AS DECIMAL(18, 6))) AS DOUBLE) / count(*), 4) + 0.0
               AS avg_cos_centroid,
           round(max(s.cos_c), 4) + 0.0 AS max_noncentroid_cos,
           CAST(coalesce(any_value(p.neardup_pairs), 0) AS BIGINT) AS neardup_pairs
    FROM (SELECT * FROM assigned WHERE vec_id <> centroid_id) s
    LEFT JOIN pairs p ON p.centroid_id = s.centroid_id
    GROUP BY s.centroid_id
    """


@query("semdedup_clusters", oracle=_semdedup_oracle())
def semdedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup cluster report: assign every embedding to its max-cosine
    centroid (k=8 deterministic seeds), then per cluster report size, mean and
    max cosine-to-centroid over non-centroid members, and the count of
    within-cluster near-duplicate pairs (cos ≥ τ) inside a bounded id band.

    Plan: centroids are k×dim literals folded into one codegen'd projection
    (no join for assignment); the verify self-join shuffles once on
    centroid_id with the band predicate bounding pairs to O(n·band).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    cents = _centroid_rows(spark, sf_dir)
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))

    # struct(cos, cid) per centroid; array_max = lexicographic (cos, cid) max,
    # mirroring the oracle's ORDER BY cos DESC, centroid_id DESC.
    scored = [
        F.struct(
            F.expr(_cos_expr("v", f"c{r['vec_id']}")).alias("cos"),
            F.lit(int(r["vec_id"])).alias("cid"),
        )
        for r in cents
    ]
    with_cents = e
    for r in cents:
        lit_arr = F.array(*[F.lit(float(x)) for x in r["v"]])
        with_cents = with_cents.withColumn(f"c{r['vec_id']}", lit_arr)
    best = F.array_max(F.array(*scored))
    assigned = with_cents.select(
        "vec_id",
        "v",
        best["cid"].alias("centroid_id"),
        F.round(best["cos"], 4).alias("cos_c"),
    )

    members = assigned.where(F.col("vec_id") != F.col("centroid_id"))
    a = assigned.select("vec_id", "centroid_id", "v").alias("a")
    b = assigned.select("vec_id", "centroid_id", "v").alias("b")
    pair_cos = F.expr(_cos_expr("a.v", "b.v"))
    pairs = (
        a.join(
            b,
            (F.col("b.centroid_id") == F.col("a.centroid_id"))
            & (F.col("b.vec_id") > F.col("a.vec_id"))
            & (F.col("b.vec_id") <= F.col("a.vec_id") + SEMDEDUP_BAND),
        )
        .where(pair_cos >= SEMDEDUP_TAU)
        .groupBy(F.col("a.centroid_id").alias("centroid_id"))
        .agg(F.count("*").alias("neardup_pairs"))
    )
    rep = members.groupBy("centroid_id").agg(
        F.count("*").alias("cluster_size"),
        (
            F.round(
                F.sum(F.col("cos_c").cast("decimal(18,6)")).cast("double")
                / F.count("*"),
                4,
            )
            + F.lit(0.0)
        ).alias("avg_cos_centroid"),
        (F.round(F.max("cos_c"), 4) + F.lit(0.0)).alias("max_noncentroid_cos"),
    )
    return rep.join(pairs, "centroid_id", "left").select(
        "centroid_id",
        "cluster_size",
        "avg_cos_centroid",
        "max_noncentroid_cos",
        F.coalesce(F.col("neardup_pairs"), F.lit(0)).cast("bigint").alias("neardup_pairs"),
    )


# RAG-style chunking: fixed token window with overlap. Chunk starts are every
# CHUNK_STRIDE tokens while < n; each chunk takes up to CHUNK_WIDTH tokens
# (the tail chunk may be shorter). chunk_idx = start / stride.
CHUNK_WIDTH = 32
CHUNK_STRIDE = 24


@query(
    "chunk_documents_overlap",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS t
        FROM documents
    ),
    starts AS (
        SELECT doc_id, t, unnest(range(0, len(t), {CHUNK_STRIDE})) AS s
        FROM toks WHERE len(t) > 0
    )
    SELECT doc_id,
           CAST(s // {CHUNK_STRIDE} AS INT) AS chunk_idx,
           CAST(s AS INT) AS start_token,
           CAST(len(list_slice(t, s + 1, s + {CHUNK_WIDTH})) AS INT) AS n_chunk_tokens,
           array_to_string(list_slice(t, s + 1, s + {CHUNK_WIDTH}), ' ') AS chunk_text
    FROM starts
    """,
)
def chunk_documents_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking for retrieval/context building:
    CHUNK_WIDTH-token chunks every CHUNK_STRIDE tokens (8-token overlap), tail
    chunk short. The overlap guarantees any CHUNK_WIDTH-STRIDE-token span is
    fully contained in some chunk — the standard RAG indexing layout.

    Plan: one explode of per-doc start offsets (a doc-local sequence — no
    shuffle at all; chunking is map-side) followed by codegen slice/concat.
    At 100 TB the output is written bucketed by doc_id so chunk->doc joins
    stay co-located."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens(F.col("text")).alias("t")).where(F.size("t") > 0)
    starts = t.select(
        "doc_id",
        "t",
        F.explode(
            F.sequence(F.lit(0), F.size("t") - 1, F.lit(CHUNK_STRIDE))
        ).alias("s"),
    )
    chunk = F.slice(F.col("t"), F.col("s") + 1, F.lit(CHUNK_WIDTH))
    return starts.select(
        "doc_id",
        (F.col("s") / CHUNK_STRIDE).cast("int").alias("chunk_idx"),
        F.col("s").cast("int").alias("start_token"),
        F.size(chunk).cast("int").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


@query(
    "cdc_chunk_sharing",
    oracle=r"""
    WITH d AS (
        SELECT doc_id, text, length(text) AS n FROM documents WHERE length(text) >= 1
    ),
    pos AS (
        SELECT doc_id, text, unnest(range(8, n + 1)) AS i FROM d WHERE n >= 8
    ),
    bnd AS (
        SELECT doc_id, i FROM pos
        WHERE substr(md5(substr(text, CAST(i AS INT) - 7, 8)), 1, 1) = '0'
    ),
    body AS (
        SELECT doc_id,
               COALESCE(lag(i) OVER (PARTITION BY doc_id ORDER BY i), 0) + 1 AS s,
               i AS e
        FROM bnd
    ),
    tail AS (
        SELECT d.doc_id, COALESCE(b.mx, 0) + 1 AS s, d.n AS e
        FROM d LEFT JOIN (SELECT doc_id, max(i) AS mx FROM bnd GROUP BY doc_id) b
          USING (doc_id)
        WHERE COALESCE(b.mx, 0) < d.n
    ),
    spans AS (SELECT * FROM body UNION ALL SELECT * FROM tail),
    chunks AS (
        SELECT spans.doc_id, s, e,
               md5(substr(text, CAST(s AS INT), CAST(e - s + 1 AS INT))) AS h
        FROM spans JOIN d USING (doc_id)
    ),
    sharing AS (SELECT h, count(DISTINCT doc_id) AS nd FROM chunks GROUP BY h)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
           round(CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 4) + 0.0 AS shared_ratio
    FROM chunks JOIN sharing USING (h)
    GROUP BY doc_id
    """,
)
def cdc_chunk_sharing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined-chunk boilerplate profile: chunk every document with
    windowed-hash CDC (operators/cdc.py, window 8, boundary p=1/16), count
    chunks whose content hash recurs in OTHER documents
    (doc_id, n_chunks, n_shared, shared_ratio) — the chunk-granularity
    cross-doc dedup signal that survives insertions/deletions that would
    shift every fixed-size chunk.

    Plan: map-only position explode + boundary filter, one doc-partitioned
    lag window, one doc-keyed join to slice chunk text, then a groupBy on
    the uniform md5 chunk hash for the sharing counts — no global windows,
    no UDFs; hash-checked against the DuckDB twin."""
    from streamds_spark.operators.cdc import cdc_chunks

    # spread=True (round 11): CDC position-explodes every character window —
    # the heaviest map stage in the extras set — from a single-split scan;
    # chunk hashes and the shared/total ratios are doc-local/integer, so any
    # partitioning computes identical values.
    docs = load_table(spark, sf_dir, "documents", spread=True)
    # the chunk relation feeds both the sharing aggregate and the final join —
    # one lazy materialization instead of chunking the corpus twice
    chunks = cdc_chunks(docs, window=8, prefix="0").localCheckpoint(eager=False)
    sharing = chunks.groupBy(F.col("chunk_hash").alias("h")).agg(
        F.countDistinct("doc_id").alias("nd")
    )
    shared_flag = F.when(F.col("nd") >= 2, 1).otherwise(0)
    return (
        chunks.join(sharing, chunks.chunk_hash == F.col("h"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_chunks"),
            F.sum(shared_flag).cast("bigint").alias("n_shared"),
            (
                F.round(
                    F.sum(shared_flag).cast("double") / F.count("*"), 4
                )
                + F.lit(0.0)
            ).alias("shared_ratio"),
        )
    )
