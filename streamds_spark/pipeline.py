"""End-to-end training-data preparation: ONE entry point from raw documents
to packed, sharded training blocks — the composition every stage of this
repo exists for, runnable as `streamds prepare`.

    raw docs
      → hygiene + quality gates     (pipeline_gate — map-only, one scan)
      → exact + near-dup dedup      (dedup_corpus: MinHash-LSH, keep-best)
      → benchmark decontamination   (bloom probe, optional)
      → tokenizer train + apply     (BPE merges or unigram-LM)
      → fixed-token-budget packing  (per-shard exclusive cumsum — no global
                                     window; a pack overshoots by at most
                                     one document, loader-side behavior)
      → hash-sharded parquet        (partitionBy(shard): each trainer rank
                                     reads its own directory)

Every stage writes its own parquet dir under `out_dir` (the audit trail a
100 TB run needs to resume/debug a stage without recomputing upstream) and
the returned manifest counts docs/tokens through every gate, so corpus
shrinkage is attributable stage by stage.

Reference parity: this is the batch twin of the reference's end-to-end
RainStorm premise (source → op1 → op2 → sink as one job,
`core_process_stream_DS.go` pipeline wiring) applied to the LLM-corpus
domain; the continuous twin is streaming/llm_pipeline.py.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streamds_spark.functions.hashing import md5_int28
from streamds_spark.functions.text import shingles_expr, tokens


def _decontaminate(
    docs: DataFrame, bench: DataFrame, id_col: str, text_col: str, shingle_n: int = 5
) -> DataFrame:
    from streamds_spark.operators.bloom import bloom_decontaminate

    def _shingles(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks")
        ).select("doc_id", F.explode(shingles_expr("toks", shingle_n)).alias("shingle"))

    contaminated = bloom_decontaminate(
        _shingles(docs), _shingles(bench).select("shingle").distinct()
    ).select("doc_id")
    return docs.join(
        contaminated.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
    )


def pack_tokenized(
    tokenized: DataFrame,
    block_tokens: int,
    n_shards: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """(shard, pack_id, doc_id, pieces, n_tokens): deterministic hash shard +
    per-shard exclusive-cumsum packing (same construction as the
    token_budget_packing oracle query — parallel across shards, no global
    ordering)."""
    toks = tokenized.withColumn("n_tokens", F.size("pieces").cast("bigint")).withColumn(
        "shard", (md5_int28(F.col(id_col)) % n_shards).cast("int")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return toks.withColumn(
        "pack_id",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("double")
            / block_tokens
        ).cast("bigint"),
    )


def prepare_corpus(
    spark: SparkSession,
    src: str,
    out_dir: str,
    benchmark: str | None = None,
    tokenizer: str = "bpe",
    merges: int = 200,
    vocab_size: int = 200,
    iters: int = 2,
    threshold: float = 0.7,
    block_tokens: int = 1024,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    resume: bool = False,
) -> dict:
    """Run the full preparation; returns (and writes) the stage manifest.

    With resume=True, any stage whose output parquet already exists (with a
    _SUCCESS marker — torn outputs are recomputed) is READ instead of
    recomputed: restart a failed 100 TB run at the stage that died without
    paying for upstream again. The tokenizer/pack stages always rerun —
    they are downstream of whatever changed, and the tokenizer artifact is
    cheap relative to the corpus stages."""
    from streamds_spark.operators.dedup_pipeline import dedup_corpus
    from streamds_spark.queries.llmdata.corpus import pipeline_gate

    def _done(stage_path: str) -> bool:
        return resume and os.path.exists(os.path.join(stage_path, "_SUCCESS"))

    def _stage(stage_path: str, compute) -> DataFrame:
        if not _done(stage_path):
            compute().write.mode("overwrite").parquet(stage_path)
        return spark.read.parquet(stage_path)

    docs = spark.read.parquet(src)
    if "n_chars" not in docs.columns:
        docs = docs.withColumn("n_chars", F.length(text_col).cast("bigint"))
    manifest: dict = {"input_docs": docs.count()}

    gated = _stage(f"{out_dir}/01_gated.parquet", lambda: pipeline_gate(docs))
    manifest["gated_docs"] = gated.count()

    kept = _stage(
        f"{out_dir}/02_deduped.parquet",
        lambda: dedup_corpus(
            gated, threshold=threshold, id_col=id_col, text_col=text_col
        )[0],
    )
    manifest["deduped_docs"] = kept.count()

    if benchmark is not None:
        clean = _stage(
            f"{out_dir}/03_clean.parquet",
            lambda: _decontaminate(
                kept, spark.read.parquet(benchmark), id_col, text_col
            ),
        )
        manifest["clean_docs"] = clean.count()
    else:
        clean = kept
        manifest["clean_docs"] = manifest["deduped_docs"]

    if tokenizer == "bpe":
        from streamds_spark.operators.bpe import apply_bpe, train_bpe

        bpe_merges, _ = train_bpe(clean, n_merges=merges)
        model = {"algo": "bpe", "merges": [[a, b] for a, b, _ in bpe_merges]}
        tokenized = apply_bpe(clean, model["merges"]).select(id_col, "pieces")
    elif tokenizer == "unigram":
        from streamds_spark.operators.unigram_lm import (
            tokenize_with_vocab,
            train_unigram_lm,
        )

        logp, _losses = train_unigram_lm(clean, vocab_size=vocab_size, iters=iters)
        model = {"algo": "unigram", "pieces": logp}
        tokenized = tokenize_with_vocab(clean, logp).select(id_col, "pieces")
    else:
        raise ValueError(f"unknown tokenizer {tokenizer!r}")
    os.makedirs(out_dir, exist_ok=True)
    with open(f"{out_dir}/tokenizer.json", "w") as f:
        json.dump(model, f)

    packed = pack_tokenized(tokenized, block_tokens, n_shards, id_col=id_col)
    packed.write.mode("overwrite").partitionBy("shard").parquet(
        f"{out_dir}/shards"
    )
    stats = spark.read.parquet(f"{out_dir}/shards").agg(
        F.count("*").alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.countDistinct("shard", "pack_id").alias("packs"),
    ).first()
    manifest.update(
        packed_docs=stats["docs"],
        total_tokens=int(stats["tokens"] or 0),
        n_packs=stats["packs"],
        block_tokens=block_tokens,
        n_shards=n_shards,
        tokenizer=tokenizer,
    )
    with open(f"{out_dir}/manifest.json", "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest
