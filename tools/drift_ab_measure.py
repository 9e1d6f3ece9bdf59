"""One A/B measurement pass for the three drifted bench extras.

Runs against an arbitrary repo checkout (passed as argv[1]) so the same
script can time the pinned round-4 worktree and HEAD interleaved —
`tools/drift_ab.py` is the driver. Measures exactly the three extras the
round-5 verdict flagged (`dedup_incremental_docs10x`, `bloom_decontaminate`,
`substring_dedup_hashed_docs10x`) min-of-3 inside one warm session, and
prints ONE JSON line {"extra": min_sec, ..., "_runs": {extra: [s,s,s]}}.

Usage: python tools/drift_ab_measure.py <repo_path> [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    repo = os.path.abspath(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    sys.path.insert(0, repo)

    from pyspark.sql import functions as F

    from streamds_spark.catalog import load_table
    from streamds_spark.functions.text import shingles_expr, tokens
    from streamds_spark.operators.bloom import bloom_decontaminate
    from streamds_spark.operators.dedup_incremental import (
        incremental_candidates,
        write_bucket_store,
    )
    from streamds_spark.operators.substring_dedup import substring_dedup
    from streamds_spark.session import get_spark

    spark = get_spark("drift-ab")
    spark.range(1).count()
    # Same page-cache warm-up discipline as bench.py: the parquet bytes are
    # read once up front so neither side pays cold-IO for running first.
    import glob

    for path in glob.glob(os.path.join(sf_dir, "*.parquet")):
        with open(path, "rb") as f:
            while f.read(1 << 24):
                pass

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_ids = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    scaled = docs
    for i in range(1, 10):
        scaled = scaled.unionByName(
            docs.select((F.col("doc_id") + i * n_ids).alias("doc_id"), "text")
        )

    runs: dict[str, list[float]] = {
        "dedup_incremental_docs10x": [],
        "substring_dedup_hashed_docs10x": [],
        "bloom_decontaminate": [],
    }

    store_dir = tempfile.mkdtemp(prefix="drift_ab_store_")
    try:
        write_bucket_store(scaled, store_dir)
        for _ in range(3):
            t0 = time.time()
            incremental_candidates(docs, spark, store_dir).count()
            runs["dedup_incremental_docs10x"].append(time.time() - t0)
    finally:
        shutil.rmtree(store_dir, ignore_errors=True)

    for _ in range(3):
        t0 = time.time()
        substring_dedup(scaled, 8, hash_shingles=True).agg(
            F.sum("n_tokens_removed"), F.sum("n_spans")
        ).collect()
        runs["substring_dedup_hashed_docs10x"].append(time.time() - t0)

    sh = docs.select("doc_id", tokens(F.col("text")).alias("toks")).select(
        "doc_id", F.explode(shingles_expr("toks", 3)).alias("shingle")
    )
    cut = int(n_ids * 0.05)
    bench_sh = sh.filter(F.col("doc_id") < cut).select("shingle").distinct()
    corpus_sh = sh.filter(F.col("doc_id") >= cut)
    for _ in range(3):
        t0 = time.time()
        bloom_decontaminate(corpus_sh, bench_sh).count()
        runs["bloom_decontaminate"].append(time.time() - t0)

    out = {k: round(min(v), 3) for k, v in runs.items()}
    out["_runs"] = {k: [round(x, 3) for x in v] for k, v in runs.items()}
    print("DRIFT_AB_RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
