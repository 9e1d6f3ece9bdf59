"""Salted join: the manual skew-buster for fact⋈dim equi-joins whose key
distribution is too skewed for a plain hash shuffle and whose dim side is too
big to broadcast.

Mechanism: the fact side gets a deterministic salt in [0, n_salts) (hash of
the whole row's join key + a disambiguating column, so clones of one hot key
spread across salts); the dim side is replicated once per salt value with
`explode(sequence(...))`. Joining on (key, salt) splits each hot key's rows
across n_salts reducers at the cost of shuffling the dim side n_salts times —
the right trade when |dim| ≪ |fact hot keys|.

When to prefer what (the engine's skew toolbox):
  1. AQE skew-join splitting (on by default, queries/analytics.py
     skewproof_user_counts) — handles skew AFTER the shuffle files exist;
     zero code. Use first.
  2. Broadcast (dim < ~8 GB working memory) — no shuffle at all.
  3. salted_join — when AQE can't help (e.g. the skewed aggregate feeds a
     window) and the dim is too big to broadcast but cheap to replicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    salt_by: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join fact⋈dim on `key` with the fact side salted `n_salts` ways.

    salt_by: optional fact column whose hash spreads a hot key's rows across
    salts (defaults to a per-partition-stable spread via xxhash64 of all fact
    columns — deterministic for a given row content).
    Supports how = inner | left (dim-side preserving joins would need salting
    the other way around).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    spread = (
        F.xxhash64(F.col(salt_by))
        if salt_by is not None
        else F.xxhash64(*[F.col(c) for c in fact.columns])
    )
    salted_fact = fact.withColumn("_salt", F.pmod(spread, F.lit(n_salts)).cast("int"))
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    return salted_fact.join(salted_dim, [key, "_salt"], how).drop("_salt")


def skew_report(
    df: DataFrame, key: str, n_partitions: int = 32, top_k: int = 20
) -> DataFrame:
    """One-scan skew diagnostic feeding the toolbox decision above: for the
    `top_k` heaviest values of `key`, report mass, share, and the ratio of
    that mass to one reducer's fair budget (n_rows / n_partitions — use the
    job's spark.sql.shuffle.partitions, or the cluster's target partition
    count at 100 TB).

    Decision rule (encoded in the `recommendation` column):
      budget_ratio <= 1   → 'hash-shuffle'  — no key outweighs a reducer;
                            the plain exchange is already balanced.
      budget_ratio > 1    → 'salt:<n>' with n = ceil(budget_ratio) — a single
                            reducer would carry ratio× its fair share; salt
                            the fact side at least n ways (salted_join), or
                            broadcast the dim if it fits, or rely on AQE
                            skew splitting when the consumer is a plain join.

    Cost: ONE shuffle of count partials on `key` (map-side combined), then
    key-count-table-sized arithmetic + a driver-sized top-k. Run it on a
    sample or the full input — the shape is the same."""
    if n_partitions < 1 or top_k < 1:
        raise ValueError(f"need n_partitions/top_k >= 1, got {n_partitions}/{top_k}")
    counts = df.groupBy(F.col(key).alias("key_value")).agg(
        F.count("*").alias("n_rows")
    )
    total = counts.agg(F.sum("n_rows").cast("double").alias("_total"))
    budget = F.col("_total") / F.lit(float(n_partitions))
    ratio = F.col("n_rows").cast("double") / budget
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "key_value",
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.round(F.col("n_rows") / F.col("_total"), 4).alias("share"),
            F.round(ratio, 4).alias("budget_ratio"),
            F.when(ratio <= 1.0, F.lit("hash-shuffle"))
            .otherwise(
                F.concat(F.lit("salt:"), F.ceil(ratio).cast("bigint").cast("string"))
            )
            .alias("recommendation"),
        )
        .orderBy(F.desc("n_rows"), "key_value")
        .limit(top_k)
    )
