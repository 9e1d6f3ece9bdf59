"""End-to-end corpus deduplication pipeline — the user-facing composition of
the dedup primitives: candidates (LSH) → verify (exact Jaccard) → resolve
(keep one doc per duplicate group).

    kept, dropped = dedup_corpus(spark, docs)   # docs: (doc_id, text, …)

Resolution uses min-doc_id as the group representative via iterated
label propagation on the verified-pair graph (a duplicate CLUSTER can chain:
A~B, B~C without A~C). Each iteration is one join+agg; near-dup graphs have
tiny diameter (dups of the same source document), so 3 iterations is enough in
practice and the loop is bounded.

Scale: every step is joins/aggs on (doc_id, bucket) keys — no driver-side
state; the pair list is bounded by LSH bucket occupancy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamds_spark.functions.hashing import (
    MINHASH_PRIME,
    md5_int28,
    minhash_perm_constants,
)
from streamds_spark.functions.text import shingles_expr, tokens


def minhash_signatures(
    docs: DataFrame, num_perm: int = 16, shingle_n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    sh = (
        docs.select(id_col, tokens(F.col(text_col)).alias("toks"))
        .select(id_col, F.explode(shingles_expr("toks", shingle_n)).alias("shingle"))
        .select(id_col, md5_int28(F.col("shingle")).alias("h"))
    )
    mins = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"m{i}")
        for i, (a, b) in enumerate(minhash_perm_constants(num_perm))
    ]
    return sh.groupBy(id_col).agg(*mins)


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    sig_cols = [c for c in signatures.columns if c != id_col]
    rows_per_band = len(sig_cols) // bands
    # one posexplode over per-band hashes — avoids re-evaluating the signature
    # subtree once per band per join side
    band_hashes = F.array(
        *[
            F.md5(F.concat_ws(",", *[
                F.col(c).cast("string")
                for c in sig_cols[b * rows_per_band : (b + 1) * rows_per_band]
            ]))
            for b in range(bands)
        ]
    )
    buckets = signatures.select(id_col, F.posexplode(band_hashes).alias("band", "bucket"))
    a, b_ = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def verify_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    threshold: float = 0.7,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs → (id_a, id_b, jaccard)."""
    sets_ = (
        docs.select(id_col, tokens(F.col(text_col)).alias("toks"))
        .select(
            F.col(id_col).alias("_vid"),
            F.array_distinct(shingles_expr("toks", shingle_n)).alias("sset"),
        )
    )
    a = sets_.withColumnRenamed("_vid", "id_a").withColumnRenamed("sset", "sa")
    b = sets_.withColumnRenamed("_vid", "id_b").withColumnRenamed("sset", "sb")
    inter = F.size(F.array_intersect("sa", "sb")).cast("double")
    union = F.size(F.array_union("sa", "sb")).cast("double")
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", (inter / F.nullif(union, F.lit(0.0))).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def resolve_groups(verified: DataFrame, max_iter: int = 3) -> DataFrame:
    """Label propagation toward the min id: (doc_id, rep_id) for every doc that
    appears in a verified pair. max_iter bounds chain depth (dup chains are
    shallow; each iteration is one shuffle)."""
    edges = verified.select("id_a", "id_b")
    bidir = edges.unionByName(
        edges.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    )
    labels = bidir.select(F.col("id_a").alias("node")).distinct().withColumn(
        "rep", F.col("node")
    )
    for _ in range(max_iter):
        neighbor_min = (
            bidir.join(labels, bidir.id_b == labels.node)
            .groupBy(F.col("id_a").alias("n2"))
            .agg(F.min("rep").alias("nmin"))
        )
        labels = (
            labels.join(neighbor_min, labels.node == F.col("n2"), "left")
            .select(
                "node",
                F.least(F.col("rep"), F.coalesce(F.col("nmin"), F.col("rep"))).alias("rep"),
            )
        )
    return labels


def dedup_corpus(
    docs: DataFrame,
    threshold: float = 0.7,
    num_perm: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Returns (kept_docs, dropped_ids): near-dup groups keep their min-id doc."""
    sigs = minhash_signatures(docs, num_perm, id_col=id_col, text_col=text_col)
    pairs = lsh_candidate_pairs(sigs, bands, id_col=id_col)
    verified = verify_pairs(docs, pairs, threshold, id_col=id_col, text_col=text_col)
    groups = resolve_groups(verified)
    dropped = groups.filter(F.col("node") != F.col("rep")).select(
        F.col("node").alias(id_col)
    )
    kept = docs.join(dropped, id_col, "left_anti")
    return kept, dropped
