"""Reproducible sampling operators for dataset curation — deterministic by
construction (hash/modulo, not RNG), so pipelines are replayable and the same
row set is selected on any engine, any cluster, any day."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.functions.hashing import duckdb_md5_int, md5_int60
from streamds_spark.registry import query

# Per-source mixture weights (fraction to keep) — the dataset-mixing knob.
MIX_WEIGHTS = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1}
DEFAULT_WEIGHT = 0.05


@query(
    "sample_systematic",
    oracle="""
    SELECT doc_id, lang FROM documents WHERE doc_id % 10 = 3
    """,
)
def sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic 10% sample by id stride — the reproducible debug-subset
    selector (same rows every run, trivially pushed to the scan)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("doc_id") % 10 == 3).select("doc_id", "lang")


def _weight_expr_sql() -> str:
    cases = " ".join(
        f"WHEN source = '{s}' THEN {w}" for s, w in MIX_WEIGHTS.items()
    )
    return f"(CASE {cases} ELSE {DEFAULT_WEIGHT} END)"


@query(
    "mixture_sample",
    oracle=f"""
    SELECT source, count(*) AS n_sampled
    FROM documents
    WHERE ({duckdb_md5_int("CAST(doc_id AS VARCHAR)")} % 10000) / 10000.0
          < {_weight_expr_sql()}
    GROUP BY source
    """,
)
def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted mixture sampling (dataset mixing): keep each doc with a
    per-source probability, decided by a deterministic hash of its id — the
    replayable alternative to rand()-based sampling. Map-only (no shuffle
    before the count); changing the mix re-selects only the delta."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.lit(DEFAULT_WEIGHT)
    for s, wt in MIX_WEIGHTS.items():
        w = F.when(F.col("source") == s, F.lit(wt)).otherwise(w)
    u = (md5_int60(F.col("doc_id").cast("string")) % 10000) / F.lit(10000.0)
    return (
        docs.filter(u < w)
        .groupBy("source")
        .agg(F.count("*").alias("n_sampled"))
    )


STRATUM_QUOTA = 40  # docs per language stratum


@query(
    "stratified_quota_sample",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY {duckdb_md5_int("CAST(doc_id AS VARCHAR)")}, doc_id)
                   AS rk
        FROM documents
    )
    SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {STRATUM_QUOTA}
    """,
)
def stratified_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified EXACT-quota sampling: the N hash-smallest docs per language —
    a balanced, replayable subset (every engine picks the identical rows;
    md5 order is uniform, so it is a uniform sample within each stratum).

    One shuffle on the stratum key. Caveat at 100 TB: parallelism is bounded
    by stratum count for the window — for few, huge strata switch to the
    two-phase plan (approx_percentile on the hash to find each stratum's
    quota threshold, then a map-only filter); same output, no rank window."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        md5_int60(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).cast("bigint").alias("rk"))
        .filter(F.col("rk") <= STRATUM_QUOTA)
    )


WSAMPLE_K = 50


@query(
    "weighted_sample_topk",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, n_chars,
               ln(({duckdb_md5_int("CAST(doc_id AS VARCHAR)")} + 1.0) / 1152921504606846976.0)
                   / n_chars AS k
        FROM documents
        WHERE n_chars > 0
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
           round(k, 6) + 0.0 AS sample_key
    FROM keyed
    ORDER BY k DESC, doc_id
    LIMIT {WSAMPLE_K}
    """,
)
def weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006): each
    row gets key ln(u)/w for deterministic u = md5-uniform(0,1] and weight
    w = n_chars; the top-k keys ARE a weighted sample without replacement.
    One scan + TakeOrderedAndProject — no shuffle, no RNG state, reproducible
    on any engine/cluster; this is how you draw a quality-weighted training
    subset from 100 TB in a single pass."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (md5_int60(F.col("doc_id")) + F.lit(1.0)) / F.lit(float(1 << 60))
    k = F.log(u) / F.col("n_chars")
    return (
        docs.select(
            "doc_id",
            F.col("n_chars").alias("weight"),
            k.alias("k"),
        )
        .orderBy(F.desc("k"), F.asc("doc_id"))
        .limit(WSAMPLE_K)
        .select(
            "doc_id",
            "weight",
            (F.round("k", 6) + F.lit(0.0)).alias("sample_key"),
        )
    )


_DOMAIN_CAP = 40


@query(
    "domain_cap_sample",
    oracle=rf"""
    WITH ranked AS (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY {duckdb_md5_int("'domaincap:' || CAST(doc_id AS VARCHAR)")}, doc_id
               ) AS rk,
               count(*) OVER (PARTITION BY source) AS domain_docs
        FROM documents
    )
    SELECT doc_id, source, CAST(rk AS INT) AS keep_rank,
           CAST(domain_docs AS BIGINT) AS domain_docs
    FROM ranked WHERE rk <= {_DOMAIN_CAP}
    """,
)
def domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (the FineWeb/RefinedWeb-style guard against a
    single site dominating the mix): keep at most {_DOMAIN_CAP} docs per
    source, chosen by a deterministic md5 shuffle within the domain so the
    kept subset is an unbiased sample, not the crawl-order head.

    Plan: the rank filter sits DIRECTLY above the row_number window so Spark
    inserts WindowGroupLimit (Partial before the exchange + Final after —
    each task ships at most {cap} rows per domain into the shuffle; pinned by
    tests/test_plans.py). Domain totals come from a separate tiny
    groupBy(source) joined by broadcast, NOT a count(*) window — a second
    window function over the same partition would block the group-limit
    pushdown and re-sort every domain. At 100 TB a mega-domain (the skew
    case) is exactly the thing the partial group limit truncates at the map
    side."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    h = md5_int60(F.concat(F.lit("domaincap:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    kept = (
        docs.select("doc_id", "source", F.row_number().over(w).alias("keep_rank"))
        .filter(F.col("keep_rank") <= _DOMAIN_CAP)
    )
    totals = docs.groupBy("source").agg(F.count("*").alias("domain_docs"))
    return kept.join(F.broadcast(totals), "source").select(
        "doc_id",
        "source",
        F.col("keep_rank").cast("int").alias("keep_rank"),
        F.col("domain_docs").cast("bigint").alias("domain_docs"),
    )


@query(
    "mixture_rate_planner",
    oracle=rf"""
    WITH n AS (
        SELECT source,
               count(*) AS docs,
               sum(len(list_filter(string_split_regex(text, '\s+'), w -> w <> '')))
                   AS toks
        FROM documents GROUP BY source
    ),
    w AS (
        SELECT source, docs, toks,
               1 + ({duckdb_md5_int("'mix:' || source")} % 5) AS wraw
        FROM n
    ),
    tot AS (SELECT sum(wraw) AS wtot FROM w),
    t AS (
        SELECT min(CAST(toks AS DOUBLE) * wtot / wraw) AS tstar
        FROM w CROSS JOIN tot
    )
    SELECT w.source,
           CAST(w.docs AS BIGINT) AS docs,
           CAST(w.toks AS BIGINT) AS toks,
           round(CAST(w.wraw AS DOUBLE) / tot.wtot, 4) AS target_share,
           round(CAST(w.wraw AS DOUBLE) / tot.wtot * t.tstar / w.toks, 4)
               AS sample_rate,
           CAST(floor(CAST(w.wraw AS DOUBLE) / tot.wtot * t.tstar) AS BIGINT)
               AS sampled_toks
    FROM w CROSS JOIN tot CROSS JOIN t
    """,
)
def mixture_rate_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing planner: given target mixture shares per source (here a
    deterministic md5-derived weight so both engines agree) and the tokens
    actually available, compute the largest corpus achievable WITHOUT
    upsampling — T* = min_s(toks_s / share_s) — and each source's sampling
    rate and token budget. The binding source gets rate 1.0; everything else
    downsamples. This is the arithmetic in front of mixture_sample /
    dsir_importance_weights: plan the rates, then hash-threshold sample.

    Plan: one groupBy(source) over tokenized docs (20-key agg), then scalar
    broadcasts — the planning math is free next to the scan. The 20-row
    aggregate feeds three branches (tot, tstar, final select); the lazy
    localCheckpoint shares ONE corpus scan across them at runtime instead
    of three replicated subtrees deduped only by runtime exchange reuse
    (pre-AQE census 20 exchanges → 12)."""
    from streamds_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    n = docs.groupBy("source").agg(
        F.count("*").alias("docs"),
        F.sum(F.size(tokens(F.col("text")))).alias("toks"),
    )
    w = n.withColumn(
        "wraw", 1 + md5_int60(F.concat(F.lit("mix:"), F.col("source"))) % 5
    ).localCheckpoint(eager=False)
    tot = w.agg(F.sum("wraw").alias("wtot"))
    t = w.crossJoin(F.broadcast(tot)).agg(
        F.min(F.col("toks").cast("double") * F.col("wtot") / F.col("wraw")).alias(
            "tstar"
        )
    )
    share = F.col("wraw").cast("double") / F.col("wtot")
    return (
        w.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(t))
        .select(
            "source",
            F.col("docs").cast("bigint").alias("docs"),
            F.col("toks").cast("bigint").alias("toks"),
            F.round(share, 4).alias("target_share"),
            F.round(share * F.col("tstar") / F.col("toks"), 4).alias("sample_rate"),
            F.floor(share * F.col("tstar")).cast("bigint").alias("sampled_toks"),
        )
    )


# Train/valid/test assignment — keyed on the CONTENT hash, not doc_id, so
# byte-identical documents always co-assign (the standard leakage guard:
# an exact duplicate of a training doc must never land in the eval split).
_SPLIT_SALT = "split-v1:"
_SPLIT_TRAIN, _SPLIT_VALID = 980, 990  # per-mille cut points


@query(
    "train_valid_test_split",
    oracle=rf"""
    SELECT doc_id, source,
           CASE WHEN b < {_SPLIT_TRAIN} THEN 'train'
                WHEN b < {_SPLIT_VALID} THEN 'valid'
                ELSE 'test' END AS split
    FROM (
        SELECT doc_id, source,
               ('0x' || substr(md5('{_SPLIT_SALT}' || md5(text)), 1, 15))::BIGINT
                   % 1000 AS b
        FROM documents
    )
    """,
)
def train_valid_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 98/1/1 train/valid/test assignment, hashed on the
    CONTENT hash (salted) rather than the id: exact-duplicate texts land in
    the same split regardless of their ids — the train/eval leakage guard a
    dedup-imperfect corpus needs. Reseeding the salt re-rolls the split;
    the same salt replays identically on any engine (same md5 idiom as
    epoch_shuffle_order). Map-only — at 100 TB this is a projection fused
    into whatever scan writes the split manifests."""
    docs = load_table(spark, sf_dir, "documents")
    b = (
        md5_int60(
            F.concat(F.lit(_SPLIT_SALT), F.md5(F.col("text").cast("binary")))
        )
        % 1000
    )
    split = (
        F.when(b < _SPLIT_TRAIN, "train")
        .when(b < _SPLIT_VALID, "valid")
        .otherwise("test")
    )
    return docs.select("doc_id", "source", split.alias("split"))


# ---------------------------------------------------------------------------
# Mergeable bottom-k sampling (operators/sampling.py, round 8): the KMV-
# family uniform sample kept as per-shard/per-batch STATE and folded at
# read time — the sampling counterpart of the HLL/HDR register tables.
# ---------------------------------------------------------------------------

BOTTOMK_K = 100


@query(
    "bottomk_sample_docs",
    oracle=f"""
    SELECT doc_id, source,
           {duckdb_md5_int("CAST(doc_id AS VARCHAR)")} AS h
    FROM documents
    ORDER BY h, doc_id
    LIMIT {BOTTOMK_K}
    """,
)
def bottomk_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform corpus sample: the BOTTOMK_K docs with smallest
    md5-integer hash of doc_id (bottom-k / KMV). A pure function of the
    data — same rows on any engine, partitioning, or day — which is what
    makes a sample a CONTRACT (eyeball sets, labeling batches, regression
    corpora) instead of a lottery; df.sample() can never be oracle-checked.

    Plan: one map-only hash projection + TakeOrdered — the per-partition
    partial top-k folds before anything moves; nothing corpus-sized
    shuffles at any scale."""
    from streamds_spark.operators.sampling import bottomk_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return bottomk_sample(docs, "doc_id", BOTTOMK_K).orderBy("h", "doc_id")


@query(
    "bottomk_merge_audit_sources",
    oracle=f"""
    WITH hashed AS (
        SELECT doc_id, source,
               {duckdb_md5_int("CAST(doc_id AS VARCHAR)")} AS h
        FROM documents
    ),
    per_src AS (
        SELECT * FROM (
            SELECT doc_id, source, h,
                   row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
                       AS rn
            FROM hashed
        ) WHERE rn <= {BOTTOMK_K}
    ),
    folded AS (
        SELECT doc_id, h FROM per_src ORDER BY h, doc_id LIMIT {BOTTOMK_K}
    ),
    direct AS (
        SELECT doc_id, h FROM hashed ORDER BY h, doc_id LIMIT {BOTTOMK_K}
    ),
    joined AS (
        SELECT coalesce(f.doc_id, d.doc_id) AS doc_id,
               (f.doc_id IS NULL OR d.doc_id IS NULL) AS mismatch
        FROM folded f FULL OUTER JOIN direct d ON f.doc_id = d.doc_id
    )
    SELECT CAST((SELECT count(DISTINCT source) FROM hashed) AS BIGINT)
               AS n_sources,
           CAST((SELECT count(*) FROM folded) AS BIGINT) AS folded_rows,
           CAST((SELECT count(*) FROM direct) AS BIGINT) AS direct_rows,
           CAST((SELECT count(*) FROM joined WHERE mismatch) AS BIGINT)
               AS mismatched_rows,
           CAST((SELECT max(h) FROM direct) AS BIGINT) AS kth_min_hash
    """,
)
def bottomk_merge_audit_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability proof for the bottom-k sample as a query: per-source
    bottom-k samples folded (union -> k smallest) must equal the
    whole-corpus one-pass sample row-for-row (mismatched_rows = 0) — the
    invariant that lets every ingest batch keep its own k-row sample and
    the read side fold them without rescanning history. kth_min_hash is
    the KMV distinct-count statistic, audited along. Oracle replays BOTH
    paths, so the equality itself is hash-checked.

    Plan: one hash scan feeding a per-source window (stratum-partitioned)
    + two TakeOrdereds + a full outer join of two k-row relations."""
    from streamds_spark.operators.sampling import (
        bottomk_merge,
        bottomk_sample,
        stratified_bottomk,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    per_src = stratified_bottomk(docs, "source", "doc_id", BOTTOMK_K)
    folded = bottomk_merge(BOTTOMK_K, "doc_id", per_src.select("doc_id", "h"))
    direct = bottomk_sample(docs, "doc_id", BOTTOMK_K).select("doc_id", "h")
    joined = folded.alias("f").join(
        direct.alias("d"), F.col("f.doc_id") == F.col("d.doc_id"), "full_outer"
    ).select(
        (F.col("f.doc_id").isNull() | F.col("d.doc_id").isNull()).alias(
            "mismatch"
        )
    )
    hashed_srcs = docs.agg(
        F.countDistinct("source").cast("bigint").alias("n_sources")
    )
    return (
        hashed_srcs.crossJoin(
            folded.agg(F.count("*").cast("bigint").alias("folded_rows"))
        )
        .crossJoin(
            direct.agg(
                F.count("*").cast("bigint").alias("direct_rows"),
                F.max("h").cast("bigint").alias("kth_min_hash"),
            )
        )
        .crossJoin(
            joined.agg(
                F.sum(F.col("mismatch").cast("bigint")).alias(
                    "mismatched_rows"
                )
            )
        )
        .selectExpr(
            "n_sources",
            "folded_rows",
            "direct_rows",
            "mismatched_rows",
            "kth_min_hash",
        )
    )


@query(
    "stratified_bottomk_sources",
    oracle=f"""
    WITH hashed AS (
        SELECT doc_id, source,
               {duckdb_md5_int("CAST(doc_id AS VARCHAR)")} AS h
        FROM documents
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(h) AS BIGINT) AS min_h, CAST(max(h) AS BIGINT) AS max_h,
           CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
    FROM (
        SELECT source, doc_id, h,
               row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
                   AS rn
        FROM hashed
    ) WHERE rn <= 20
    GROUP BY source ORDER BY source
    """,
)
def stratified_bottomk_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-size uniform sample per source regardless of source skew (20
    docs each, deterministic) — the per-domain audit draw a mixture
    pipeline eyeballs — censused per stratum so the whole selection is
    hash-checked. The window partitions by source; per-stratum state is
    k rows and folds stratum-wise like the global sample."""
    from streamds_spark.operators.sampling import stratified_bottomk

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        stratified_bottomk(docs, "source", "doc_id", 20)
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("h").cast("bigint").alias("min_h"),
            F.max("h").cast("bigint").alias("max_h"),
            F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
        )
        .orderBy("source")
    )


@query(
    "weighted_sample_merge_audit_sources",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, source,
               ln(({duckdb_md5_int("CAST(doc_id AS VARCHAR)")} + 1.0)
                  / 1152921504606846976.0) / n_chars AS k
        FROM documents WHERE n_chars > 0
    ),
    per_src AS (
        SELECT doc_id, k FROM (
            SELECT doc_id, k,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY k DESC, doc_id) AS rn
            FROM keyed
        ) WHERE rn <= {WSAMPLE_K}
    ),
    folded AS (
        SELECT doc_id FROM per_src ORDER BY k DESC, doc_id LIMIT {WSAMPLE_K}
    ),
    direct AS (
        SELECT doc_id FROM keyed ORDER BY k DESC, doc_id LIMIT {WSAMPLE_K}
    ),
    joined AS (
        SELECT (f.doc_id IS NULL OR d.doc_id IS NULL) AS mismatch
        FROM folded f FULL OUTER JOIN direct d ON f.doc_id = d.doc_id
    )
    SELECT CAST((SELECT count(DISTINCT source) FROM keyed) AS BIGINT)
               AS n_sources,
           CAST((SELECT count(*) FROM folded) AS BIGINT) AS folded_rows,
           CAST((SELECT count(*) FROM direct) AS BIGINT) AS direct_rows,
           CAST((SELECT count(*) FROM joined WHERE mismatch) AS BIGINT)
               AS mismatched_rows,
           CAST((SELECT sum(doc_id) FROM direct) AS BIGINT) AS sample_id_sum
    """,
)
def weighted_sample_merge_audit_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mergeability proof for the WEIGHTED sample: Efraimidis–Spirakis keys
    (ln(u)/w, deterministic md5 uniform) make weighted sampling without
    replacement a plain top-k BY KEY — so, exactly like the uniform
    bottom-k, per-source top-k samples folded (union -> k largest keys)
    equal the whole-corpus one-pass draw row-for-row (mismatched_rows = 0).
    Per-shard weighted-sample state is k rows forever; the fold is a
    k×shards TakeOrdered. Oracle replays both paths, so the equality is
    hash-checked; the sampled id-sum travels as the content witness.

    Plan: one keyed scan feeding a source-partitioned window + two
    TakeOrdereds + a k-row outer join — the bottomk audit's shape with the
    weight-aware key."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (md5_int60(F.col("doc_id")) + F.lit(1.0)) / F.lit(float(1 << 60))
    keyed = docs.select(
        "doc_id", "source", (F.log(u) / F.col("n_chars")).alias("k")
    )
    w = Window.partitionBy("source").orderBy(F.col("k").desc(), "doc_id")
    per_src = (
        keyed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= WSAMPLE_K)
        .select("doc_id", "k")
    )
    folded = per_src.orderBy(F.col("k").desc(), "doc_id").limit(WSAMPLE_K).select("doc_id")
    direct = keyed.orderBy(F.col("k").desc(), "doc_id").limit(WSAMPLE_K).select("doc_id")
    joined = folded.alias("f").join(
        direct.alias("d"), F.col("f.doc_id") == F.col("d.doc_id"), "full_outer"
    ).select(
        (F.col("f.doc_id").isNull() | F.col("d.doc_id").isNull()).alias("mismatch")
    )
    return (
        keyed.agg(F.countDistinct("source").cast("bigint").alias("n_sources"))
        .crossJoin(folded.agg(F.count("*").cast("bigint").alias("folded_rows")))
        .crossJoin(
            direct.agg(
                F.count("*").cast("bigint").alias("direct_rows"),
                F.sum("doc_id").cast("bigint").alias("sample_id_sum"),
            )
        )
        .crossJoin(
            joined.agg(F.sum(F.col("mismatch").cast("bigint")).alias("mismatched_rows"))
        )
        .selectExpr(
            "n_sources", "folded_rows", "direct_rows",
            "mismatched_rows", "sample_id_sum",
        )
    )
