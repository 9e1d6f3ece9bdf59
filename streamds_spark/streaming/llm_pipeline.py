"""Continuous LLM-corpus ingest — the streaming twin of the batch
`llm_pipeline_v2` query (queries/llmdata/corpus.py), closing the loop on the
reference's whole premise: RainStorm exists so a pipeline RUNS CONTINUOUSLY
(`core_process_stream_DS.go:454-721` — source → operators → sink with
exactly-once), and this is that posture for the pretraining-data stack:

    readStream documents
      → hygiene + quality gates   (pipeline_gate — map-only, in-plan on the
                                   unbounded DataFrame, shared VERBATIM with
                                   the batch query)
      → per-batch exact dedup     (pipeline_exact_dedup on the micro-batch)
      → cross-batch exact dedup   (anti-join against the persisted
                                   content-hash store)
      → near-dup probe            (MinHash buckets vs the persisted bucket
                                   store — operators/dedup_incremental.py's
                                   broadcast-probe shape, run per batch)
      → appendlog corpus store    (io/appendlog.append_batch — idempotent
                                   batchId chunk dirs, exactly-once)

Exactly-once across crash/replay: every per-batch write is keyed by batchId
(appendlog chunk dir, hash-store dir, bucket-store dir) in overwrite mode, so
a replayed micro-batch rewrites its own dirs instead of duplicating; and both
probes read ONLY store dirs with id < the current batchId, so a replayed
batch never collides with its own half-written state.

Streaming dedup semantics vs batch: the batch rule keeps the min-doc_id
occurrence per content hash over the WHOLE corpus; the stream keeps the
FIRST-ARRIVING batch's occurrence (min doc_id within that batch). The two
agree whenever ingest order is doc_id order — the equality test's setup —
and first-arrival is the natural production policy (an already-published doc
is never retracted because a lower-id duplicate arrives later).

The domain-cap + chunk-accounting report (pipeline_cap_report) is a
global-rank computation and therefore runs on the CORPUS STORE contents
(finalize-time), not inside the stream — same rule, same code, applied where
a global view exists.

Scale shape: gates are map-only per split; the per-batch dedup window
partitions by content hash (batch-sized state); both store probes broadcast
the SMALL batch side and scan the store shuffle-free; corpus/bucket/hash
stores grow by one batch-keyed parquet dir per trigger (no read-modify-write
anywhere). At 100 TB steady state each trigger's cost tracks the batch, not
the corpus — the same measured posture as dedup_incremental (BASELINE.md).
"""

from __future__ import annotations

import glob as _glob
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from streamds_spark.io import appendlog
from streamds_spark.operators.dedup_pipeline import lsh_band_buckets, minhash_signatures

SAMPLE_K = 100  # rows kept in the mergeable bottom-k corpus sample


@dataclass(frozen=True)
class CorpusStreamPaths:
    """Directory layout under one work dir: everything batch-keyed."""

    work_dir: str

    @property
    def checkpoint(self) -> str:
        return os.path.join(self.work_dir, "checkpoint")

    @property
    def corpus(self) -> str:  # appendlog table of kept documents
        return os.path.join(self.work_dir, "corpus")

    @property
    def hash_store(self) -> str:  # seen content hashes, batch=N dirs
        return os.path.join(self.work_dir, "hash_store")

    @property
    def bucket_store(self) -> str:  # MinHash band buckets, batch=N dirs
        return os.path.join(self.work_dir, "bucket_store")

    @property
    def chunk_store(self) -> str:  # gear-CDC chunk hashes, batch=N dirs
        return os.path.join(self.work_dir, "chunk_store")

    @property
    def hll_store(self) -> str:  # per-batch HLL register tables, batch=N dirs
        return os.path.join(self.work_dir, "hll_store")

    @property
    def hdr_store(self) -> str:  # per-batch doc-length HDR registers, batch=N
        return os.path.join(self.work_dir, "hdr_store")

    @property
    def sample_store(self) -> str:  # per-batch bottom-k doc samples, batch=N
        return os.path.join(self.work_dir, "sample_store")


def _committed_segment_hi(root: str, before_batch: int) -> int:
    """Highest committed compaction segment usable by a probe running batch
    `before_batch` (segments cover the batch-id prefix 0..hi inclusive).
    Compaction only folds batches at or below the checkpoint's durable
    frontier, and replays only re-run batches ABOVE that frontier, so a
    segment with hi >= before_batch cannot occur in a live stream — the
    filter is defensive for out-of-band callers."""
    best = -1
    for d in _glob.glob(os.path.join(root, "segment=*")):
        try:
            hi = int(os.path.basename(d).split("=", 1)[1])
        except ValueError:
            continue
        if hi < before_batch and os.path.exists(os.path.join(d, "_SUCCESS")):
            best = max(best, hi)
    return best


def _committed_store_dirs(root: str, before_batch: int) -> list[str]:
    """Store dirs from batches strictly BEFORE the given one (committed only).
    Replay safety: a re-run batch must not probe its own prior half-write.

    Compaction-aware: if a committed `segment=<hi>` exists (the prefix
    0..hi bin-packed into one dir by compact_stores), it replaces every
    batch dir with id <= hi — including any dir a post-compaction replay
    rewrote, which is what makes replayed batches no-ops after compaction."""
    seg_hi = _committed_segment_hi(root, before_batch)
    out = []
    if seg_hi >= 0:
        out.append(os.path.join(root, f"segment={seg_hi}"))
    for d in _glob.glob(os.path.join(root, "batch=*")):
        try:
            bid = int(os.path.basename(d).split("=", 1)[1])
        except ValueError:
            continue
        if seg_hi < bid < before_batch and os.path.exists(
            os.path.join(d, "_SUCCESS")
        ):
            out.append(d)
    return sorted(out)


def _seen_hashes(spark: SparkSession, paths: CorpusStreamPaths, batch_id: int) -> DataFrame | None:
    dirs = _committed_store_dirs(paths.hash_store, batch_id)
    return spark.read.parquet(*dirs) if dirs else None


def _corpus_buckets(spark: SparkSession, paths: CorpusStreamPaths, batch_id: int) -> DataFrame | None:
    dirs = _committed_store_dirs(paths.bucket_store, batch_id)
    return spark.read.parquet(*dirs) if dirs else None


def _durable_frontier(paths: CorpusStreamPaths) -> int:
    """Highest batch id the stream's checkpoint has COMMITTED (the
    `checkpoint/commits/<id>` marker is written after foreachBatch returns).
    Batches at or below this id can never be replayed, so they are safe to
    fold into a compaction segment; -1 means nothing committed yet."""
    commits = os.path.join(paths.checkpoint, "commits")
    best = -1
    if os.path.isdir(commits):
        for name in os.listdir(commits):
            if name.isdigit():
                best = max(best, int(name))
    return best


def _compact_one_store(
    spark: SparkSession, root: str, upto_batch: int, num_files: int | None
) -> int:
    """Fold committed `batch=N` dirs (N <= upto_batch) plus the previous
    segment into one new `segment=<hi>` dir. Crash-safe by construction:
    the new segment is invisible until its _SUCCESS lands (readers keep
    using the old segment + batch dirs), and GC of subsumed dirs is
    best-effort afterwards — a crash anywhere leaves a consistent view.
    Returns the number of batch dirs folded (0 = nothing to do)."""
    old_hi = _committed_segment_hi(root, upto_batch + 1)
    to_fold = []
    for d in _glob.glob(os.path.join(root, "batch=*")):
        try:
            bid = int(os.path.basename(d).split("=", 1)[1])
        except ValueError:
            continue
        if old_hi < bid <= upto_batch and os.path.exists(
            os.path.join(d, "_SUCCESS")
        ):
            to_fold.append((bid, d))
        elif bid <= old_hi:
            # garbage from a batch replayed after a previous compaction —
            # readers already skip it (bid <= segment hi); reclaim it
            shutil.rmtree(d, ignore_errors=True)
    if not to_fold:
        return 0
    new_hi = max(bid for bid, _ in to_fold)
    parts = [d for _, d in to_fold]
    if old_hi >= 0:
        parts.append(os.path.join(root, f"segment={old_hi}"))
    df = spark.read.parquet(*parts)
    if num_files is not None:
        df = df.coalesce(max(1, num_files))
    df.write.mode("overwrite").parquet(os.path.join(root, f"segment={new_hi}"))
    # _SUCCESS is the commit point; everything below is reclaim
    for _, d in to_fold:
        shutil.rmtree(d, ignore_errors=True)
    if old_hi >= 0:
        shutil.rmtree(os.path.join(root, f"segment={old_hi}"), ignore_errors=True)
    return len(to_fold)


def compact_stores(
    spark: SparkSession,
    work_dir: str,
    upto_batch: int | None = None,
    num_files: int | None = None,
    merge_corpus: bool = True,
) -> dict:
    """Maintenance compaction for the continuous pipeline's state (run it
    between triggers, same single-writer discipline as appendlog.merge).

    The hash/bucket stores and the corpus appendlog each grow by one parquet
    dir per trigger; after ~10^4 triggers the per-batch probe's file listing
    becomes the bottleneck (the small-files wall — the reference hits the
    same wall and answers with HyDFS merge, core_process_utils.go:2040-2146).
    This folds every batch dir at or below the checkpoint's durable frontier
    (or an explicit `upto_batch`) into one `segment=<hi>` dir per store and
    runs appendlog.merge on the corpus. Probe results are identical before
    and after, and a batch replayed AFTER compaction is a no-op: its
    rewritten dirs fall at or below the segment's hi / inside the merge
    manifest's dir entries, so no reader ever sees them
    (tests/test_llm_pipeline_stream.py pins both properties)."""
    paths = CorpusStreamPaths(work_dir)
    if upto_batch is None:
        upto_batch = _durable_frontier(paths)
    stats = {
        "upto_batch": upto_batch,
        "hash_store": 0,
        "bucket_store": 0,
        "chunk_store": 0,
        "hll_store": 0,
        "hdr_store": 0,
        "sample_store": 0,
    }
    if upto_batch < 0:
        return stats
    stats["hash_store"] = _compact_one_store(
        spark, paths.hash_store, upto_batch, num_files
    )
    stats["bucket_store"] = _compact_one_store(
        spark, paths.bucket_store, upto_batch, num_files
    )
    if os.path.isdir(paths.chunk_store):
        stats["chunk_store"] = _compact_one_store(
            spark, paths.chunk_store, upto_batch, num_files
        )
    if os.path.isdir(paths.hll_store):
        # register tables union-fold like any store: duplicate (bucket, rho)
        # rows are a valid un-merged sketch, and every reader re-aggregates
        # by max(bucket) — so the generic fold preserves the estimate
        stats["hll_store"] = _compact_one_store(
            spark, paths.hll_store, upto_batch, num_files
        )
    if os.path.isdir(paths.hdr_store):
        # HDR registers fold the same way: duplicate (bucket, cnt) rows are a
        # valid un-merged sketch because readers re-aggregate by SUM, and the
        # fold preserves rows — only dir/file count changes, never counts
        stats["hdr_store"] = _compact_one_store(
            spark, paths.hdr_store, upto_batch, num_files
        )
    if os.path.isdir(paths.sample_store):
        # bottom-k samples fold the same way: the union of per-batch k-row
        # samples is a valid un-folded sample state (readers re-take the k
        # smallest), so the generic fold preserves the sample exactly
        stats["sample_store"] = _compact_one_store(
            spark, paths.sample_store, upto_batch, num_files
        )
    if merge_corpus:
        appendlog.merge(spark, paths.corpus)
    return stats


def process_corpus_batch(
    batch_df: DataFrame,
    batch_id: int,
    paths: CorpusStreamPaths,
    num_perm: int = 16,
    bands: int = 4,
) -> None:
    """One micro-batch of the ingest pipeline (gates already applied in-plan).

    Writes three batch-keyed artifacts (all overwrite-idempotent):
      corpus/chunks/batch-…      kept documents (+ n_neardup_cands flag)
      hash_store/batch=N         this batch's new content hashes
      bucket_store/batch=N       this batch's kept docs' MinHash buckets
    """
    from streamds_spark.queries.llmdata.corpus import pipeline_exact_dedup

    spark = batch_df.sparkSession
    hashed = batch_df.withColumn("_h", F.md5(F.col("text").cast("binary")))

    # within-batch exact dedup (the batch rule verbatim), then cross-batch:
    # drop docs whose content hash is already in the store. Broadcast shape
    # matters at 100 TB: the STORE grows with the corpus and must never be
    # the broadcast side — semi-join it against the broadcast batch hashes
    # (store scans once, shuffle-free; the hit set is <= batch-sized), then
    # anti-join the small hit set back. Same posture as the bucket probe.
    # cache the gate+dedup batch subtree BEFORE the store probe: batch_h's
    # broadcast and the anti-join's probe side both read it, and it is the
    # expensive part of the per-batch plan
    pre = pipeline_exact_dedup(hashed).cache()
    local = pre
    seen = _seen_hashes(spark, paths, batch_id)
    if seen is not None:
        batch_h = pre.select("_h").distinct()
        hits = (
            seen.select(F.col("h").alias("_h"))
            .join(F.broadcast(batch_h), "_h", "left_semi")
            .distinct()
        )
        # cache the post-probe result too: three consumers follow (buckets,
        # sink write, hash write), and without this each would re-run the
        # store scan behind `hits`
        local = pre.join(F.broadcast(hits), "_h", "left_anti").cache()
    new_buckets = None
    try:
        # near-dup probe against the persisted corpus buckets (flag, don't
        # drop: near-dup POLICY is a downstream choice; the batch twin has no
        # near-dup stage, so flagging keeps stream==batch equality testable).
        # The batch's MinHash is the dominant per-batch compute and feeds
        # BOTH the candidate join and the store write — cache it.
        new_buckets = lsh_band_buckets(
            minhash_signatures(local, num_perm), bands
        ).cache()
        corpus_b = _corpus_buckets(spark, paths, batch_id)
        if corpus_b is not None:
            cands = (
                corpus_b.join(
                    F.broadcast(
                        new_buckets.select(F.col("doc_id").alias("new_id"), "band", "bucket")
                    ),
                    ["band", "bucket"],
                )
                .select("new_id", F.col("doc_id").alias("corpus_id"))
                .distinct()
                .groupBy("new_id")
                .agg(F.count("*").alias("n_neardup_cands"))
            )
            kept = local.join(
                cands.withColumnRenamed("new_id", "doc_id"), "doc_id", "left"
            ).withColumn(
                "n_neardup_cands", F.coalesce("n_neardup_cands", F.lit(0))
            )
        else:
            kept = local.withColumn("n_neardup_cands", F.lit(0).cast("bigint"))

        appendlog.append_batch(
            kept.drop("_h"), paths.corpus, "llm-stream", batch_id
        )
        local.select(F.col("_h").alias("h")).distinct().write.mode("overwrite").parquet(
            os.path.join(paths.hash_store, f"batch={int(batch_id)}")
        )
        new_buckets.write.mode("overwrite").parquet(
            os.path.join(paths.bucket_store, f"batch={int(batch_id)}")
        )
        # sub-document granularity: gear-CDC chunk hashes of this batch's
        # kept docs (map-only, zero shuffle) land in their own batch-keyed
        # store — cross-document boilerplate sharing is a finalize-time
        # grouping over the store (chunk_sharing_report), the same
        # global-view split as the cap report. Written LAST of the three
        # stores; idempotence is the same overwrite-by-batchId contract.
        from streamds_spark.operators.cdc import cdc_chunks_gear

        cdc_chunks_gear(local.select("doc_id", "text")).write.mode(
            "overwrite"
        ).parquet(os.path.join(paths.chunk_store, f"batch={int(batch_id)}"))
        # distinct-ingest sketch: this batch's content hashes as an HLL
        # register table (operators/hll.py — a <=256-row relation at ANY
        # batch size). Registers merge by max, so the finalize-time merge
        # across all triggers equals the batch-computed sketch bit-for-bit,
        # replayed batches are absorbed idempotently, and the streaming
        # distinct-documents state stays m-row forever — the 100 TB
        # streaming-distinct shape. `pre` is the within-batch-deduped kept
        # set, whose DISTINCT hash set equals the gated batch's (dedup only
        # drops repeats), so the sketch is over ingested content.
        from streamds_spark.operators.hll import hll_registers

        hll_registers(pre.select("_h"), "_h").write.mode("overwrite").parquet(
            os.path.join(paths.hll_store, f"batch={int(batch_id)}")
        )
        # doc-length quantile sketch: this batch's KEPT docs as an HDR
        # register table (operators/hdr.py — <=1888 rows at ANY batch size).
        # Counts merge by SUM, so cross-trigger replay safety comes from the
        # overwrite-by-batchId discipline (not idempotent merge like HLL);
        # compaction only folds batches at/below the durable frontier, which
        # replays never re-run, so the fold cannot double-count. The kept set
        # is exactly what lands in the corpus store, so the finalize-time
        # merged sketch equals a one-pass batch sketch over the final corpus
        # BIT-FOR-BIT (pinned by tests/test_llm_pipeline_stream.py).
        from streamds_spark.operators.hdr import hdr_registers

        hdr_registers(
            local.select(F.length("text").alias("_len")), "_len"
        ).write.mode("overwrite").parquet(
            os.path.join(paths.hdr_store, f"batch={int(batch_id)}")
        )
        # mergeable corpus sample: this batch's kept docs' bottom-k by the
        # shared md5 integer (operators/sampling.py — k rows at ANY batch
        # size). Samples fold by union -> k smallest, so the finalize-time
        # fold equals a one-pass bottom-k over the whole kept corpus
        # row-for-row; replays rewrite the identical rows (pure function of
        # the data) under the overwrite-by-batchId contract.
        from streamds_spark.operators.sampling import bottomk_sample

        bottomk_sample(local.select("doc_id"), "doc_id", SAMPLE_K).write.mode(
            "overwrite"
        ).parquet(os.path.join(paths.sample_store, f"batch={int(batch_id)}"))
    finally:
        pre.unpersist()
        if local is not pre:
            local.unpersist()
        if new_buckets is not None:
            new_buckets.unpersist()


def run_llm_corpus_stream(
    spark: SparkSession,
    src_dir: str,
    work_dir: str,
    max_files_per_trigger: int | None = 1,
    available_now: bool = True,
) -> StreamingQuery:
    """Launch the continuous corpus-ingest pipeline over a parquet documents
    dir (schema inferred from the existing files; new files stream in).
    available_now=True drains current input and stops (the test/drain mode);
    False tails the directory forever (the production posture)."""
    from streamds_spark.queries.llmdata.corpus import pipeline_gate

    paths = CorpusStreamPaths(work_dir)
    appendlog.create(spark, paths.corpus)
    schema = spark.read.parquet(src_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    gated = pipeline_gate(reader.parquet(src_dir))

    writer = gated.writeStream.option("checkpointLocation", paths.checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.foreachBatch(
        lambda df, bid: process_corpus_batch(df, bid, paths)
    ).start()


def chunk_sharing_report(spark: SparkSession, work_dir: str) -> DataFrame:
    """Finalize-time sub-document dedup profile over the STREAMED chunk
    store: per kept document, how many of its gear-CDC chunks recur in other
    kept documents — cdc_chunk_sharing's grouping (doc_id, n_chunks,
    n_shared, shared_ratio), computed over the store the stream built one
    batch at a time. After draining the same input this equals the batch
    computation (gear-chunk the batch pipeline's kept set, same grouping)
    row-for-row — pinned by tests/test_llm_pipeline_stream.py, including
    across store compaction."""
    paths = CorpusStreamPaths(work_dir)
    dirs = _committed_store_dirs(paths.chunk_store, 2**62)
    if not dirs:
        # pre-chunk_store work dir or nothing committed yet: an empty report,
        # not a read error (same guard shape as _corpus_buckets)
        return spark.createDataFrame(
            [],
            "doc_id bigint, n_chunks bigint, n_shared bigint, shared_ratio double",
        )
    chunks = spark.read.parquet(*dirs).localCheckpoint(eager=False)
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
                F.round(F.sum(shared_flag).cast("double") / F.count("*"), 4)
                + F.lit(0.0)
            ).alias("shared_ratio"),
        )
    )


def distinct_docs_estimate(spark: SparkSession, work_dir: str) -> DataFrame:
    """Finalize-time distinct-ingested-documents estimate from the streamed
    per-batch HLL register tables: union every committed batch's registers,
    re-aggregate max per bucket (the sketch merge — associative, commutative,
    idempotent), and run the standard bias-corrected estimate. 1 row
    (n_registers, est).

    Because register-merge is exact (not approximate-on-top-of-approximate),
    this equals the sketch a single batch pass over the same corpus would
    build BIT-FOR-BIT — pinned by tests/test_llm_pipeline_stream.py — and
    the est is within HLL's m=256 error (~6.5%) of the true distinct count.
    State cost: <=256 rows per trigger, merged to <=256 rows, at any scale."""
    from streamds_spark.operators.hll import hll_estimate

    paths = CorpusStreamPaths(work_dir)
    dirs = _committed_store_dirs(paths.hll_store, 2**62)
    if not dirs:
        regs = spark.createDataFrame([], "bucket int, max_rho int")
    else:
        regs = (
            spark.read.parquet(*dirs)
            .groupBy("bucket")
            .agg(F.max("max_rho").alias("max_rho"))
        )
    return hll_estimate(regs)


def doclen_quantiles_estimate(
    spark: SparkSession, work_dir: str, qs: "dict[str, float] | None" = None
) -> DataFrame:
    """Finalize-time kept-document length quantiles from the streamed
    per-batch HDR register tables (operators/hdr.py): union every committed
    batch's registers, re-aggregate sum per bucket (the counting-sketch
    merge), extract p50/p90/p99 (or caller-supplied qs). Because the kept
    set IS the corpus store's content and register-merge is exact, the
    merged sketch equals a one-pass batch sketch over the final corpus
    bit-for-bit, and every extracted quantile's bucket carries its exact
    [lo, hi] value bounds (rel. error < 1/32). Empty store -> 0 rows.

    State cost: <=1888 rows per trigger, merged to <=1888 rows, at any
    scale — the streaming-quantile twin of distinct_docs_estimate."""
    from streamds_spark.operators.hdr import hdr_quantiles

    qs = qs or {"p50": 0.5, "p90": 0.9, "p99": 0.99}
    paths = CorpusStreamPaths(work_dir)
    dirs = _committed_store_dirs(paths.hdr_store, 2**62)
    if not dirs:
        regs = spark.createDataFrame([], "bucket int, cnt bigint")
    else:
        regs = (
            spark.read.parquet(*dirs)
            .groupBy("bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
    return hdr_quantiles(regs, qs)


def corpus_sample(
    spark: SparkSession, work_dir: str, k: int = SAMPLE_K
) -> DataFrame:
    """Finalize-time uniform corpus sample from the streamed per-batch
    bottom-k stores: union every committed batch's k-row sample, keep the k
    smallest hashes — row-identical to a one-pass bottom-k over the whole
    kept corpus (the KMV merge property), at a read cost of k rows per
    committed dir regardless of corpus size. Empty store -> 0 rows.

    k must be <= SAMPLE_K (the per-batch store size): each store holds only
    its batch's bottom SAMPLE_K rows, so a larger k would fold to something
    that is NOT the true global bottom-k — refused loudly rather than
    returned silently non-uniform."""
    from streamds_spark.operators.sampling import bottomk_merge

    if k > SAMPLE_K:
        raise ValueError(
            f"k={k} exceeds the per-batch store size SAMPLE_K={SAMPLE_K}: "
            "the merged sample is only the true global bottom-k for "
            "k <= SAMPLE_K (re-run the stream with a larger SAMPLE_K "
            "to draw more)"
        )

    paths = CorpusStreamPaths(work_dir)
    dirs = _committed_store_dirs(paths.sample_store, 2**62)
    if not dirs:
        return spark.createDataFrame([], "doc_id bigint, h bigint")
    return bottomk_merge(k, "doc_id", spark.read.parquet(*dirs))


def corpus_report(spark: SparkSession, work_dir: str) -> DataFrame:
    """Finalize-time report over the streamed corpus store: the SAME
    pipeline_cap_report the batch query ends with, applied to the appendlog
    contents — so after draining the same input, this equals
    llm_pipeline_v2's output row-for-row (pinned by
    tests/test_llm_pipeline_stream.py)."""
    from streamds_spark.queries.llmdata.corpus import pipeline_cap_report

    docs = appendlog.get(spark, CorpusStreamPaths(work_dir).corpus)
    return pipeline_cap_report(docs.select("doc_id", "source", "n_toks"))
