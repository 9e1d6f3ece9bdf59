"""Incremental deduplication: check a NEW ingest batch against an
already-processed corpus without re-hashing the corpus.

At 100 TB the corpus's MinHash band buckets are computed once and PERSISTED
(written bucketed by the join key); each incoming batch — typically orders of
magnitude smaller — computes its own buckets and probes the store:

    write_bucket_store(corpus_docs, "/data/dedup_buckets")        # once
    cands = incremental_candidates(new_docs, spark, "/data/dedup_buckets")
    # → (new_id, corpus_id) candidate pairs; verify with
    #   dedup_pipeline.verify_pairs against the union of texts, then drop or
    #   append + write_bucket_store(new_kept, ..., mode="append").

Scale shape: the new batch's bucket table is small → broadcast side of the
join; the stored bucket table streams through executors once with NO shuffle
(broadcast hash join over the scan). Appending a processed batch's buckets
keeps the store current without rewrites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamds_spark.operators.dedup_pipeline import lsh_band_buckets, minhash_signatures


def write_bucket_store(
    docs: DataFrame,
    path: str,
    num_perm: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "overwrite",
) -> None:
    """Persist the corpus's (id, band, bucket) table. Partitioned by band so
    a probe's per-band lookups prune; append mode ingests new batches."""
    buckets = lsh_band_buckets(
        minhash_signatures(docs, num_perm, id_col=id_col, text_col=text_col),
        bands,
        id_col,
    )
    buckets.write.mode(mode).partitionBy("band").parquet(path)


def incremental_candidates(
    new_docs: DataFrame,
    spark: SparkSession,
    store_path: str,
    num_perm: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Candidate near-dup pairs (new_id, corpus_id) between an ingest batch
    and the persisted corpus buckets.

    The new batch's buckets are explicitly broadcast — the corpus store scans
    once, shuffle-free, and only rows in probed buckets survive the hash
    lookup. Self-dups WITHIN the new batch are the batch-local
    lsh_candidate_pairs' job; this operator covers new-vs-corpus."""
    new_buckets = lsh_band_buckets(
        minhash_signatures(new_docs, num_perm, id_col=id_col, text_col=text_col),
        bands,
        id_col,
    ).select(
        F.col(id_col).alias("new_id"), "band", "bucket"
    )
    store = spark.read.parquet(store_path).select(
        F.col(id_col).alias("corpus_id"), "band", "bucket"
    )
    return (
        store.join(F.broadcast(new_buckets), ["band", "bucket"])
        .filter(F.col("corpus_id") != F.col("new_id"))
        .select("new_id", "corpus_id")
        .distinct()
    )
