"""Mergeable bottom-k sampling (the KMV / min-wise family — Broder's
min-wise permutations; Bar-Yossef et al.'s k-minimum-values sketch) as
plain DataFrame ops.

The curation samplers in queries/llmdata/sampling.py answer one-shot
draws (systematic, mixture, weighted, capped). What they lack is the
STATE story: a corpus-wide uniform sample you can keep per ingest
batch/shard and fold at read time without ever rescanning history. The
bottom-k sample is that state: keep the k rows whose hash of a stable key
is smallest —

  * deterministic: a pure function of the data — same sample on any
    engine, any partitioning, any day (the repo's hash-exactness playbook
    applied to sampling; `df.sample()`/TABLESAMPLE can never be
    oracle-checked);
  * uniform over distinct keys: a good hash orders rows uniformly with
    respect to any data property;
  * MERGEABLE: bottom_k(A ∪ B) = bottom_k(bottom_k(A) ∪ bottom_k(B)) —
    a row in the union's bottom k is in its own shard's bottom k
    a fortiori, so per-shard k-row samples fold exactly. Same state
    discipline as the HLL/HDR register tables, and the k-th smallest
    hash doubles as a distinct-count estimator (KMV) if ever needed.

Hash: the repo's shared 60-bit md5 integer (functions/hashing.md5_int60 ==
DuckDB's ('0x' || substr(md5(s),1,15))::BIGINT), so sample MEMBERSHIP is
cross-engine hash-exact. Ties broken by the key (md5 collisions aside,
none occur). A production-only deployment can swap xxhash64 in — the plan
shape is identical; md5 is the price of the shared-oracle contract.

Plan shape: one map-only hash projection + TakeOrdered(k) — no global
sort, no full shuffle, per-partition partial top-k folds before anything
moves; the stratified variant's window partitions by the stratum (never
global).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamds_spark.functions.hashing import md5_int60


def _reject_reserved(df: DataFrame, cols: "tuple[str, ...]") -> None:
    """The samplers ADD output columns (`h`, transiently `rn`); an input
    that already carries one would be silently clobbered by withColumn —
    wrong sample, wrong output — so refuse loudly (callers pass arbitrary
    catalog tables via the CLI sample verb)."""
    clash = [c for c in cols if c in df.columns]
    if clash:
        raise ValueError(
            f"input already has column(s) {clash} — the sampler reserves "
            "them for its hash/rank output; rename or drop them first"
        )


def bottomk_sample(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """The k rows with smallest md5_int60(key): (…df columns, h bigint).
    Deterministic, engine-independent, uniform over distinct keys."""
    _reject_reserved(df, ("h",))
    return (
        df.withColumn("h", md5_int60(F.col(key_col)))
        .orderBy("h", key_col)
        .limit(k)
    )


def bottomk_merge(k: int, key_col: str, *samples: DataFrame) -> DataFrame:
    """Fold per-shard/per-batch bottom-k samples: union, keep the k
    smallest — exactly the whole-data sample."""
    out = samples[0]
    for s in samples[1:]:
        out = out.unionByName(s)
    return out.orderBy("h", key_col).limit(k)


def stratified_bottomk(
    df: DataFrame, strata_col: str, key_col: str, k_per_stratum: int
) -> DataFrame:
    """Bottom-k WITHIN each stratum — equal-size uniform samples per group
    regardless of group skew (the per-domain audit draw). Per-stratum
    window; per-stratum state is k rows, also mergeable stratum-wise."""
    from pyspark.sql import Window

    _reject_reserved(df, ("h", "rn"))
    w = Window.partitionBy(strata_col).orderBy("h", key_col)
    return (
        df.withColumn("h", md5_int60(F.col(key_col)))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k_per_stratum)
        .drop("rn")
    )
