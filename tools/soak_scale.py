"""Docs ×100 scaling soak — one decade past the per-round ×10 watches.

Runs the three heaviest corpus paths (capped LSH dedup end-to-end, hashed
substring dedup, bloom decontamination) on the sf dir's documents table
unioned ×1, ×10, ×100 (at sf0.1 that is 5k → 50k → 500k docs) and reports
wall-clock plus the observed per-decade scaling exponent
log10(t_100x / t_10x): ~1.0 = linear, >1.3 = a hidden super-linear step or
memory cliff that local ×10 runs can't see.

Usage: python tools/soak_scale.py [sf_dir] [--skip lsh,substr,bloom]
                                  [--factors 1,10,100]
Prints one JSON line; findings go into BASELINE.md's round table. The
exponent is reported between the top two factors given.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.session import get_spark


def scaled_docs(docs, factor: int, n_ids: int):
    out = docs
    for i in range(1, factor):
        out = out.unionByName(
            docs.select((F.col("doc_id") + i * n_ids).alias("doc_id"), "text")
        )
    return out


def run_lsh(docs) -> None:
    from streamds_spark.operators.dedup_pipeline import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    lsh_candidate_pairs(minhash_signatures(docs)).count()


def run_substr(docs) -> None:
    from streamds_spark.operators.substring_dedup import substring_dedup

    substring_dedup(docs, 8, hash_shingles=True).agg(
        F.sum("n_tokens_removed"), F.sum("n_spans")
    ).collect()


def run_dedup_e2e(docs) -> None:
    """Full dedup_corpus: capped LSH candidates -> exact-Jaccard verify ->
    fixpoint connected components -> keep-best resolution."""
    from streamds_spark.operators.dedup_pipeline import dedup_corpus

    kept, _ = dedup_corpus(docs)
    kept.count()


def run_bloom(docs) -> None:
    from streamds_spark.functions.text import shingles_expr, tokens
    from streamds_spark.operators.bloom import bloom_decontaminate

    sh = docs.select("doc_id", tokens(F.col("text")).alias("toks")).select(
        "doc_id", F.explode(shingles_expr("toks", 3)).alias("shingle")
    )
    n_ids = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    cut = int(n_ids * 0.05)
    bench_sh = sh.filter(F.col("doc_id") < cut).select("shingle").distinct()
    bloom_decontaminate(sh.filter(F.col("doc_id") >= cut), bench_sh).count()


PATHS = {
    "lsh": run_lsh,
    "substr": run_substr,
    "bloom": run_bloom,
    "dedup_e2e": run_dedup_e2e,
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    skip = set()
    if "--skip" in sys.argv:
        skip = set(sys.argv[sys.argv.index("--skip") + 1].split(","))
    factors = (1, 10, 100)
    if "--factors" in sys.argv:
        factors = tuple(
            int(x) for x in sys.argv[sys.argv.index("--factors") + 1].split(",")
        )
    if len(factors) < 2 or sorted(set(factors)) != list(factors):
        raise SystemExit(
            f"--factors needs >= 2 strictly-increasing values (got {factors}): "
            "the exponent is computed between the top two"
        )
    spark = get_spark("soak")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_ids = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    base_n = docs.count()

    out: dict = {"sf_dir": sf_dir, "base_docs": base_n, "paths": {}}
    for name, fn in PATHS.items():
        if name in skip:
            continue
        row: dict = {}
        for factor in factors:
            scaled = scaled_docs(docs, factor, n_ids)
            t0 = time.time()
            fn(scaled)
            row[f"x{factor}"] = round(time.time() - t0, 2)
        # exponent between the top two factors (the decade that matters)
        hi, lo = factors[-1], factors[-2]
        row[f"exp_{lo}_to_{hi}"] = round(
            math.log(row[f"x{hi}"] / row[f"x{lo}"]) / math.log(hi / lo), 3
        )
        out["paths"][name] = row
        print(f"# {name}: {row}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
