"""Deduplication operators over the `documents` table — the training-data-pipeline
layer (beyond reference parity).

Five dedup families, each designed for 100 TB:
  exact        — md5 groupBy: one shuffle on a 128-bit key, no skew (hash keys uniform).
  minhash-LSH  — shingle → k-permutation signature → band buckets → candidate
                 pairs only within buckets → exact-Jaccard verify. Pair blow-up is
                 bounded by bucket size, never O(n²). All codegen'd expressions.
  simhash      — 28-bit fingerprint via per-bit majority vote of token hashes;
                 near-dups collide on the fingerprint (or Hamming-ball probes).
  n-gram Jaccard — exact pairwise Jaccard, demonstrated on a bounded candidate
                 set (consecutive ids here; in production the LSH output).
  embedding cosine — near-dup by vector similarity (see similarity.py for ANN).

Cross-engine determinism: every hash is md5-derived (functions/hashing.py), so
the DuckDB oracle reproduces signatures bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.functions.hashing import (
    MINHASH_PRIME,
    md5_int28,
    md5_int60,
    minhash_perm_constants,
)
from streamds_spark.functions.text import shingles_expr, tokens
from streamds_spark.registry import query

NUM_PERM = 16  # minhash permutations
BANDS = 4  # 4 bands × 4 rows
ROWS_PER_BAND = NUM_PERM // BANDS
SHINGLE_N = 3
JACCARD_THRESHOLD = 0.5


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id, count(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    HAVING count(*) >= 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on md5(text), keep lowest doc_id per group."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.col("text").cast("binary")).alias("text_hash"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


def _minhash_signature_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id → array<bigint> minhash signature (NUM_PERM entries).

    Plan: tokenize → shingle (higher-order fn) → explode → 28-bit hash → for each
    permutation i, min((a_i*h+b_i) mod P) — expressed as NUM_PERM aggregate
    expressions over one explode, i.e. ONE shuffle on doc_id with map-side
    partial mins. No UDF anywhere. spread=True (round 11): the tokenize+md5
    map work is the dominant cost and a tiny documents file is one scan
    task — spreading parallelizes it; no-op once the input splits naturally.
    (A tighter 16 KB/task floor was tried and measured +9% within-session —
    task overhead beats the extra parallelism on this box; the 64 KB default
    stands.)
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    sh = (
        docs.select("doc_id", tokens(F.col("text")).alias("toks"))
        .select("doc_id", F.explode(shingles_expr("toks", SHINGLE_N)).alias("shingle"))
        .select("doc_id", md5_int28(F.col("shingle")).alias("h"))
    )
    mins = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"m{i}")
        for i, (a, b) in enumerate(minhash_perm_constants(NUM_PERM))
    ]
    sig = sh.groupBy("doc_id").agg(*mins)
    return sig


def _duckdb_signature_sql() -> str:
    """DuckDB CTEs producing the identical per-doc signature columns m0..m{k-1}."""
    perms = minhash_perm_constants(NUM_PERM)
    mins = ",\n           ".join(
        f"min(({a} * h + {b}) % {MINHASH_PRIME}) AS m{i}" for i, (a, b) in enumerate(perms)
    )
    return rf"""
    toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS t
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               unnest(CASE WHEN len(t) >= {SHINGLE_N}
                      THEN list_transform(range(1, len(t) - {SHINGLE_N} + 2),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                      ELSE [] END) AS shingle
        FROM toks
    ),
    hashed AS (
        SELECT doc_id, ('0x' || substr(md5(shingle), 1, 7))::BIGINT AS h FROM sh
    ),
    sig AS (
        SELECT doc_id,
           {mins}
        FROM hashed GROUP BY doc_id
    )"""


_BAND_COLS = [
    [f"m{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)] for b in range(BANDS)
]


@query(
    "dedup_minhash_signature",
    oracle="WITH " + _duckdb_signature_sql() + "\n    SELECT * FROM sig",
)
def dedup_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (k=16 permutations over 3-word shingles) — the
    verifiable core of MinHash-LSH dedup."""
    return _minhash_signature_df(spark, sf_dir)


def _lsh_pairs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate pairs via banding: docs sharing any band bucket.

    Band buckets are emitted with ONE posexplode over an array of band hashes
    (not a 4-way union, which would re-evaluate the whole signature subtree
    once per band per join side — 8× the shingle+agg work). The self-join's
    two identical sides cost nothing extra: AQE exchange reuse dedupes them
    at runtime (round-11 verified in the executed plan: ONE shingle Generate,
    ONE wide aggregate; an explicit localCheckpoint was tried and measured
    neutral-to-slower, see lsh_candidate_pairs). (Measured: a
    groupBy+collect_list pair-expansion alternative was slower AND worse at
    scale — a mega-bucket's id list materializes in a single aggregation
    buffer, while the join spills.)

    max_bucket_size=None here because this registry query's oracle specifies
    exact all-pairs semantics (buckets are tiny at oracle sf). Production
    dedup goes through operators/dedup_pipeline.dedup_corpus, where oversized
    buckets are star-connected (O(n) pairs, same groups after resolution).
    """
    from streamds_spark.operators.dedup_pipeline import lsh_candidate_pairs

    sig = _minhash_signature_df(spark, sf_dir)
    return lsh_candidate_pairs(sig, bands=BANDS, max_bucket_size=None).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )


@query(
    "dedup_minhash_lsh_pairs",
    oracle="WITH "
    + _duckdb_signature_sql()
    + f""",
    buckets AS (
        {" UNION ALL ".join(
            "SELECT doc_id, " + str(b) + " AS band, md5("
            + " || ',' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
            + ") AS bucket FROM sig"
            for b, cols in enumerate(_BAND_COLS)
        )}
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM buckets a JOIN buckets b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    """,
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs (band=4 × rows=4 ⇒ ~Jaccard>0.5 candidates).
    The bucket join is an equi-join on (band, bucket) — shuffles only bucket ids,
    never the O(n²) cross product."""
    return _lsh_pairs_df(spark, sf_dir)


@query(
    "dedup_cluster_sizes",
    oracle="WITH RECURSIVE "
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
    )
    SELECT rep AS rep_doc_id, count(*) AS cluster_size
    FROM labels GROUP BY rep
    ORDER BY cluster_size DESC, rep_doc_id
    """,
)
def dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size histogram: connected components over the LSH
    candidate graph (min-id representative per component), sizes per cluster.

    The Spark side runs the production fixpoint algorithm
    (operators/dedup_pipeline.resolve_groups — min-label propagation with
    pointer jumping, O(log diameter) shuffles); the oracle recomputes the
    same components with a recursive transitive-closure CTE, so the iterative
    code is value-checked cross-engine, not just row-counted."""
    from streamds_spark.operators.dedup_pipeline import resolve_groups

    pairs = _lsh_pairs_df(spark, sf_dir).select(
        F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
    )
    labels = resolve_groups(pairs)
    return (
        labels.groupBy(F.col("rep").alias("rep_doc_id"))
        .agg(F.count("*").alias("cluster_size"))
        .orderBy(F.desc("cluster_size"), "rep_doc_id")
    )


@query(
    "dedup_simhash",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) AS w
        FROM documents
    ),
    th AS (
        SELECT doc_id, ('0x' || substr(md5(w), 1, 7))::BIGINT AS h FROM toks
    ),
    bits AS (
        SELECT doc_id, b.i AS i,
               sum(CASE WHEN (h >> b.i) & 1 = 1 THEN 1 ELSE -1 END) AS vote
        FROM th, (SELECT unnest(range(0, 28)) AS i) b
        GROUP BY doc_id, b.i
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN vote > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS simhash
    FROM bits GROUP BY doc_id
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprint (28-bit): per-bit majority vote over token hashes.

    Implementation is exploded-by-bit (28 rows per token) → two-level agg. Both
    aggs are partial map-side; the only shuffle key is (doc_id) then doc_id.
    Near-dup docs differ in ≤3 bits — group by simhash (or probe Hamming balls)
    to collapse them. spread=True: parallelize the tokenize+md5 map stage of a
    single-split scan (exact same integer votes under any partitioning).
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    th = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
        .select("doc_id", md5_int28(F.col("w")).alias("h"))
    )
    bit = F.explode(F.sequence(F.lit(0), F.lit(27))).alias("i")
    votes = (
        th.select("doc_id", "h", bit)
        .groupBy("doc_id", "i")
        .agg(
            F.sum(
                F.when(F.expr("(h >> i) & 1") == 1, 1).otherwise(-1)
            ).alias("vote")
        )
    )
    return votes.groupBy("doc_id").agg(
        F.sum(F.when(F.col("vote") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), i)")).otherwise(0))
        .cast("bigint")
        .alias("simhash")
    )


@query(
    "dedup_ngram_jaccard",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS t
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               list_distinct(CASE WHEN len(t) >= {SHINGLE_N}
                   THEN list_transform(range(1, len(t) - {SHINGLE_N} + 2),
                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                   ELSE [] END) AS sset
        FROM toks
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE) /
                 nullif(len(list_distinct(list_concat(a.sset, b.sset))), 0), 4) AS jaccard
    FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram (3-word shingle) Jaccard over a bounded candidate set
    (adjacent doc_ids here; at scale the candidate list comes from
    dedup_minhash_lsh_pairs, keeping the verify join linear in candidates)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = (
        docs.select("doc_id", tokens(F.col("text")).alias("toks"))
        .select("doc_id", F.array_distinct(shingles_expr("toks", SHINGLE_N)).alias("sset"))
    )
    a = sh.alias("a")
    b = sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sset"), F.col("b.sset"))).cast("double")
    union = F.size(F.array_union(F.col("a.sset"), F.col("b.sset")))
    return (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(inter / F.nullif(union.cast("double"), F.lit(0.0)), 4).alias("jaccard"),
        )
    )


@query(
    "dedup_embedding_cosine",
    oracle="""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
                 (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                  sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4)
               AS cos_sim
    FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup scoring on a bounded candidate set (adjacent vec_ids;
    at scale candidates come from LSH bucketing — similarity.py). Pure
    zip_with/aggregate expressions, no UDF."""
    from streamds_spark.functions.vectors import as_double, cosine

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    a = emb.alias("a")
    b = emb.alias("b")
    return (
        a.join(b, F.col("b.vec_id") == F.col("a.vec_id") + 1)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 4).alias("cos_sim"),
        )
    )


@query(
    "dedup_levenshtein",
    oracle="""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(substr(a.text, 1, 80), substr(b.text, 1, 80)) AS INT) AS edit_dist
    FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    WHERE (a.doc_id % 5) = 0
    """,
)
def dedup_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance dedup scoring on a bounded candidate set (adjacent ids,
    text prefix-capped at 80 chars — Levenshtein is O(len²), so at scale it is
    strictly a VERIFY step on LSH candidates with capped prefixes, never a
    primary pass)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 80).alias("t80")
    )
    a = docs.alias("a")
    b = docs.alias("b")
    return (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .filter(F.col("a.doc_id") % 5 == 0)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.levenshtein(F.col("a.t80"), F.col("b.t80")).alias("edit_dist"),
        )
    )


@query(
    "dedup_pair_graph_degree",
    oracle="WITH "
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
    deg AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS degree FROM (
            SELECT doc_a AS doc_id FROM pairs
            UNION ALL
            SELECT doc_b AS doc_id FROM pairs
        ) GROUP BY doc_id
    )
    SELECT degree, CAST(count(*) AS BIGINT) AS n_docs
    FROM deg GROUP BY degree
    """,
)
def dedup_pair_graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the LSH candidate-pair graph — the dedup
    health/skew dashboard (a fat tail here is the mega-bucket early warning
    that operators/dedup_pipeline's star cap addresses). Reuses the pair plan;
    the degree histogram is two small aggregates over the pair list."""
    pairs = _lsh_pairs_df(spark, sf_dir)
    ends = pairs.select(F.col("doc_a").alias("doc_id")).unionAll(
        pairs.select(F.col("doc_b").alias("doc_id"))
    )
    deg = ends.groupBy("doc_id").agg(F.count("*").alias("degree"))
    return deg.groupBy("degree").agg(F.count("*").alias("n_docs"))


@query(
    "dedup_minhash_estimate_error",
    oracle="WITH "
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
    est AS (
        SELECT p.doc_a, p.doc_b,
               ({" + ".join(
                   f"CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END" for i in range(NUM_PERM)
               )}) / CAST({NUM_PERM} AS DOUBLE) AS est_jaccard
        FROM pairs p
        JOIN sig sa ON sa.doc_id = p.doc_a
        JOIN sig sb ON sb.doc_id = p.doc_b
    ),
    ssets AS (
        SELECT doc_id,
               list_distinct(CASE WHEN len(t) >= {SHINGLE_N}
                   THEN list_transform(range(1, len(t) - {SHINGLE_N} + 2),
                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                   ELSE [] END) AS sset
        FROM toks
    )
    SELECT e.doc_a, e.doc_b,
           round(e.est_jaccard, 4) AS est_jaccard,
           round(CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE) /
                 nullif(len(list_distinct(list_concat(a.sset, b.sset))), 0), 4)
               AS true_jaccard,
           round(abs(e.est_jaccard -
                 CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE) /
                 nullif(len(list_distinct(list_concat(a.sset, b.sset))), 0)), 4)
               AS abs_err
    FROM est e
    JOIN ssets a ON a.doc_id = e.doc_a
    JOIN ssets b ON b.doc_id = e.doc_b
    """,
)
def dedup_minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quality audit: for every LSH candidate pair, the MinHash-
    estimated Jaccard (matching signature components / k) against the TRUE
    shingle-set Jaccard, with per-pair absolute error — the measurement that
    justifies the (bands, rows) choice. Candidates and both verify joins are
    bounded by the LSH pair list, so the whole audit stays linear in
    candidates at 100 TB (the all-pairs version would be quadratic).

    Round 11: ONE lazily-checkpointed signature table feeds the banding AND
    both verify-join sides (sa/sb) — previously the scan→shingle→md5→agg
    subtree appeared 4× in the plan (once per band-join side, once per
    signature join side) and ran up to 4× at execution. Signatures are
    (1+k) numbers per doc at any corpus size — cheap to materialize, far
    cheaper than recomputing."""
    from streamds_spark.operators.dedup_pipeline import lsh_candidate_pairs

    sig = _minhash_signature_df(spark, sf_dir).localCheckpoint(eager=False)
    pairs = lsh_candidate_pairs(sig, bands=BANDS, max_bucket_size=None).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    est_expr = sum(
        F.when(F.col(f"sa.m{i}") == F.col(f"sb.m{i}"), 1).otherwise(0)
        for i in range(NUM_PERM)
    ) / F.lit(float(NUM_PERM))
    est = (
        pairs.join(sig.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sig.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", est_expr.alias("est_jaccard"))
    )
    docs = load_table(spark, sf_dir, "documents")
    ssets = docs.select("doc_id", tokens(F.col("text")).alias("toks")).select(
        "doc_id", F.array_distinct(shingles_expr("toks", SHINGLE_N)).alias("sset")
    )
    inter = F.size(F.array_intersect(F.col("a.sset"), F.col("b.sset"))).cast("double")
    union = F.size(F.array_union(F.col("a.sset"), F.col("b.sset"))).cast("double")
    true_j = inter / F.nullif(union, F.lit(0.0))
    return (
        est.join(ssets.alias("a"), F.col("doc_a") == F.col("a.doc_id"))
        .join(ssets.alias("b"), F.col("doc_b") == F.col("b.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round("est_jaccard", 4).alias("est_jaccard"),
            F.round(true_j, 4).alias("true_jaccard"),
            F.round(F.abs(F.col("est_jaccard") - true_j), 4).alias("abs_err"),
        )
    )


SPAN_N = 8  # tokens per span shingle (cross-doc repeated-span detector)


@query(
    "repeated_ngram_spans",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS t
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(CASE WHEN len(t) >= {SPAN_N}
                      THEN list_transform(range(1, len(t) - {SPAN_N} + 2),
                           i -> ('0x' || substr(md5({" || ' ' || ".join(("t[i]" if j == 0 else f"t[i+{j}]") for j in range(SPAN_N))}), 1, 15))::BIGINT)
                      ELSE [] END) AS h
        FROM toks
    ),
    df AS (SELECT h, CAST(count(*) AS BIGINT) AS doc_freq FROM sh GROUP BY h)
    SELECT doc_freq, CAST(count(*) AS BIGINT) AS n_spans
    FROM df GROUP BY doc_freq
    """,
)
def repeated_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-span census: hash every {N}-token span, count
    how many DISTINCT documents contain each span (doc_freq), and report the
    doc_freq histogram — the scalable proxy for exact-substring dedup (the
    suffix-array pass of "Deduplicating Training Data Makes Language Models
    Better", Lee et al. 2022): spans with doc_freq ≥ 2 are verbatim text
    shared across documents.

    Plan: explode spans (map-side), distinct per (doc, hash), two hash
    aggregates — every stage partial-aggregates before its exchange, and the
    span string never shuffles (only its 60-bit hash)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    spans = (
        toks.filter(F.size("toks") >= SPAN_N)
        .select("doc_id", F.explode(shingles_expr("toks", SPAN_N)).alias("g"))
        .select("doc_id", md5_int60(F.col("g")).alias("h"))
        .distinct()
    )
    df_per_span = spans.groupBy("h").agg(F.count("*").alias("doc_freq"))
    return df_per_span.groupBy("doc_freq").agg(F.count("*").alias("n_spans"))


@query(
    "semantic_dedup_keep",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (
        SELECT vec_id, v,
               CAST((CASE WHEN v[1] >= 0 THEN 32 ELSE 0 END)
                  + (CASE WHEN v[2] >= 0 THEN 16 ELSE 0 END)
                  + (CASE WHEN v[3] >= 0 THEN 8 ELSE 0 END)
                  + (CASE WHEN v[4] >= 0 THEN 4 ELSE 0 END)
                  + (CASE WHEN v[5] >= 0 THEN 2 ELSE 0 END)
                  + (CASE WHEN v[6] >= 0 THEN 1 ELSE 0 END) AS INT)
                   AS cluster_id
        FROM e
    ),
    drops AS (
        SELECT DISTINCT bb.vec_id AS ib
        FROM b a JOIN b bb
          ON a.cluster_id = bb.cluster_id AND bb.vec_id > a.vec_id
        WHERE round(
                list_dot_product(a.v, bb.v)
                / (sqrt(list_dot_product(a.v, a.v))
                   * sqrt(list_dot_product(bb.v, bb.v))), 4) >= 0.8
    )
    SELECT b.vec_id, b.cluster_id, (drops.ib IS NULL) AS is_kept
    FROM b LEFT JOIN drops ON b.vec_id = drops.ib
    """,
)
def semantic_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) over the embeddings table: sign-bucket
    clustering on the first 6 dimensions (64 training-free clusters), then
    within-cluster cosine >= 0.8 drops every above-threshold row except the
    lowest id — (vec_id, cluster_id, is_kept). Semantic near-dups survive
    paraphrase, so this is the dedup family MinHash/SimHash text shingles
    cannot provide.

    Plan (operators/semdedup.py): map-side cluster assignment, ONE
    cluster-keyed self-join for candidates (quadratic only within a
    cluster — the knob is cluster granularity, same discipline as LSH
    mega-bucket caps), a distinct + left join for the keep flags. Cosines
    round to 4 decimals before the threshold compare on both engines."""
    from streamds_spark.functions.vectors import as_double
    from streamds_spark.operators.semdedup import semdedup

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    return semdedup(emb, threshold=0.8, n_sign_bits=6)


SETSIM_TAU = (1, 2)  # Jaccard >= 1/2, integer-exact on both engines


@query(
    "setsim_exact_pairs",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS t
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               list_distinct(CASE WHEN len(t) >= {SHINGLE_N}
                   THEN list_transform(range(1, len(t) - {SHINGLE_N} + 2),
                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                   ELSE [] END) AS sset
        FROM toks
    ),
    inv AS (SELECT doc_id, unnest(sset) AS tok FROM sh),
    sz  AS (SELECT doc_id, len(sset) AS s FROM sh),
    -- ALL token-sharing pairs (no prefix filter): the oracle proves the
    -- Spark side's prefix filter loses nothing
    pairs AS (
        SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
        FROM inv a JOIN inv b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT CAST(p.da AS BIGINT) AS id_a, CAST(p.db AS BIGINT) AS id_b,
           CAST(p.inter AS BIGINT) AS n_inter,
           CAST(sa.s + sb.s - p.inter AS BIGINT) AS n_union,
           round(CAST(p.inter AS DOUBLE) / (sa.s + sb.s - p.inter), 4) AS jaccard
    FROM pairs p
    JOIN sz sa ON sa.doc_id = p.da
    JOIN sz sb ON sb.doc_id = p.db
    WHERE p.inter * {SETSIM_TAU[1]} >= (sa.s + sb.s - p.inter) * {SETSIM_TAU[0]}
      AND sa.s + sb.s - p.inter > 0
    """,
)
def setsim_exact_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity self-join on 3-word shingles at Jaccard >= 1/2
    via prefix filtering (operators/setsim.py — AllPairs/PPJoin family):
    the exact complement to dedup_minhash_lsh_pairs, with candidate
    generation bounded by the PREFIX inverted lists (rarest tokens first)
    instead of minhash bands, and membership decided in integer arithmetic
    (tau_den*inter >= tau_num*union) so no float boundary can diverge
    between engines. The oracle joins ALL token-sharing pairs and applies
    the same integer predicate — hash-equality proves the prefix filter
    loses no pair. spread=True (round 11): the tokenize+shingle map stage
    otherwise runs as ONE task on the single-split documents scan; every
    downstream quantity is an integer set statistic, partitioning-
    invariant."""
    from streamds_spark.operators.setsim import setsim_join

    docs = load_table(spark, sf_dir, "documents", spread=True)
    sh = (
        docs.select("doc_id", tokens(F.col("text")).alias("toks"))
        .select("doc_id", F.array_distinct(shingles_expr("toks", SHINGLE_N)).alias("sset"))
    )
    return setsim_join(
        sh, SETSIM_TAU[0], SETSIM_TAU[1], id_col="doc_id", set_col="sset"
    )


# Recall-audit thresholds: integer-exact Jaccard cutoffs bracketing the
# 4-band x 4-row s-curve (p(candidate) = 1-(1-s^4)^4: ~0.2 at s=0.5,
# ~0.7 at s=0.7, ~0.99 at s=0.9) — the measured evidence behind the
# BANDS/ROWS_PER_BAND dial, beside lsh_param_planner's theoretical curve.
LSH_AUDIT_TAUS = ((1, 2), (7, 10), (9, 10))


@query(
    "lsh_recall_audit",
    oracle="WITH "
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
    cand AS MATERIALIZED (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM buckets a JOIN buckets b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    inv AS (SELECT DISTINCT doc_id, shingle FROM sh),
    sz AS MATERIALIZED (
        SELECT doc_id, count(*) AS s FROM inv GROUP BY doc_id
    ),
    tp AS MATERIALIZED (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        FROM inv a JOIN inv b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    truth AS MATERIALIZED (
        SELECT t.id_a, t.id_b, t.inter, sa.s + sb.s - t.inter AS un,
               (c.id_a IS NOT NULL) AS is_cand
        FROM tp t
        JOIN sz sa ON sa.doc_id = t.id_a
        JOIN sz sb ON sb.doc_id = t.id_b
        LEFT JOIN cand c ON c.id_a = t.id_a AND c.id_b = t.id_b
    ),
    taus(tau_num, tau_den) AS (
        SELECT * FROM (VALUES {", ".join(f"({n}, {d})" for n, d in LSH_AUDIT_TAUS)})
    )
    SELECT CAST(t.tau_num AS BIGINT) AS tau_num,
           CAST(t.tau_den AS BIGINT) AS tau_den,
           CAST(count(tr.id_a) AS BIGINT) AS n_true,
           CAST(COALESCE(sum(CASE WHEN tr.is_cand THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_hit,
           (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates
    FROM taus t
    LEFT JOIN truth tr
      ON tr.inter * t.tau_den >= t.tau_num * tr.un AND tr.un > 0
    GROUP BY t.tau_num, t.tau_den
    ORDER BY tau_num * 1.0 / tau_den
    """,
)
def lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall evidence behind the MinHash-LSH dedup dial (round 11, the
    estimator-audit discipline): candidate pairs from the production
    banding (4 bands x 4 rows over 16 permutations) graded against EXACT
    Jaccard ground truth (the prefix-filtered set-similarity join at
    tau = 1/2, with higher cutoffs derived from its integer n_inter /
    n_union — no second pair enumeration). One row per audited threshold:
    (tau, true pairs at or above it, how many LSH banded into a candidate
    bucket, total candidates). All integers — hash-exact against the
    DuckDB twin, which replays the signature/banding AND enumerates ALL
    shingle-sharing pairs so the Spark side's prefix filter is re-proven
    lossless here too. The recall ratios per threshold land in BASELINE.md
    beside lsh_param_planner's theoretical s-curve."""
    from streamds_spark.operators.dedup_pipeline import lsh_candidate_pairs
    from streamds_spark.operators.setsim import setsim_join

    # spread=True (round 11): same single-split tokenize parallelization as
    # setsim_exact_pairs — all graded quantities are integer set statistics
    docs = load_table(spark, sf_dir, "documents", spread=True)
    sh = docs.select("doc_id", tokens(F.col("text")).alias("toks")).select(
        "doc_id", F.array_distinct(shingles_expr("toks", SHINGLE_N)).alias("sset")
    )
    truth = setsim_join(sh, 1, 2, id_col="doc_id", set_col="sset").select(
        "id_a", "id_b", "n_inter", "n_union"
    )
    cand = (
        lsh_candidate_pairs(
            _minhash_signature_df(spark, sf_dir), bands=BANDS, max_bucket_size=None
        )
        .select("id_a", "id_b")
        .withColumn("is_cand", F.lit(True))
    )
    graded = truth.join(cand, ["id_a", "id_b"], "left").localCheckpoint(
        eager=False
    )
    n_candidates = cand.count()
    rows = []
    for num, den in LSH_AUDIT_TAUS:
        at = graded.where(
            (F.col("n_inter") * den >= num * F.col("n_union"))
            & (F.col("n_union") > 0)
        )
        stat = at.agg(
            F.count(F.lit(1)).alias("t"),
            F.coalesce(
                F.sum(F.col("is_cand").cast("bigint")), F.lit(0)
            ).alias("h"),
        ).collect()[0]
        rows.append((num, den, int(stat["t"]), int(stat["h"]), n_candidates))
    return spark.createDataFrame(
        rows,
        "tau_num bigint, tau_den bigint, n_true bigint, n_hit bigint, "
        "n_candidates bigint",
    )
