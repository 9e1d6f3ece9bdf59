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

from dataclasses import dataclass

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


@dataclass(frozen=True)
class SkewJoinChoice:
    """The decision record skew_aware_join returns next to its result:
    which strategy fired and the numbers that chose it."""

    df: DataFrame
    strategy: str  # 'broadcast' | 'plain' | 'salted'
    dim_rows: int
    budget_ratio: float | None  # None when broadcast short-circuited
    n_salts: int | None  # set only for 'salted'


def skew_aware_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "inner",
    n_partitions: int | None = None,
    broadcast_threshold_rows: int = 1_000_000,
    max_salts: int = 64,
    salt_by: str | None = None,
) -> SkewJoinChoice:
    """Equi-join fact⋈dim on `key`, auto-applying skew_report's documented
    decision rule instead of leaving it as advice:

      1. |dim| <= broadcast_threshold_rows      -> broadcast join (no shuffle
         at all — skew is irrelevant when the dim rides along with every
         fact partition). The row threshold is the caller's proxy for the
         ~8 GB broadcast working-memory budget.
      2. else max budget_ratio over fact.key <= 1 -> plain hash-shuffle join
         (no key outweighs one reducer's fair share; AQE still splits any
         residual runtime skew).
      3. else                                    -> salted_join with
         n_salts = clamp(ceil(max budget_ratio), 2..max_salts) — exactly the
         'salt:<n>' recommendation skew_report prints.

    Cost of deciding: one count on dim + (when dim is too big to broadcast)
    skew_report's single count-partials shuffle over fact — both tiny next
    to the join they are sizing at 100 TB, and both one-time per pipeline
    when the caller caches the choice. Returns the joined DataFrame plus
    the decision record so callers (and tests) can pin which plan fired.

    n_partitions defaults to the session's spark.sql.shuffle.partitions —
    pass the cluster's real target partition count when sizing for scale.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"skew_aware_join supports inner/left, got {how!r}")
    spark = fact.sparkSession
    if n_partitions is None:
        n_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    dim_rows = dim.count()
    if dim_rows <= broadcast_threshold_rows:
        return SkewJoinChoice(
            df=fact.join(F.broadcast(dim), key, how),
            strategy="broadcast",
            dim_rows=dim_rows,
            budget_ratio=None,
            n_salts=None,
        )
    top = skew_report(fact, key, n_partitions=n_partitions, top_k=1).collect()
    ratio = float(top[0]["budget_ratio"]) if top else 0.0
    if ratio <= 1.0:
        return SkewJoinChoice(
            df=fact.join(dim, key, how),
            strategy="plain",
            dim_rows=dim_rows,
            budget_ratio=ratio,
            n_salts=None,
        )
    import math

    n_salts = max(2, min(max_salts, math.ceil(ratio)))
    return SkewJoinChoice(
        df=salted_join(fact, dim, key, n_salts=n_salts, salt_by=salt_by, how=how),
        strategy="salted",
        dim_rows=dim_rows,
        budget_ratio=ratio,
        n_salts=n_salts,
    )
