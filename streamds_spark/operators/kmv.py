"""KMV (k-minimum-values) distinct-value sketches with SET-INTERSECTION
estimation — the sketch the HLL register tables cannot be: HLL unions
perfectly but cannot intersect; the KMV synopsis supports union AND
intersection/Jaccard under one fixed-size state (Bar-Yossef et al. RANDOM'02
for the k-minimum-values estimator; Beyer et al. SIGMOD'07 "On Synopses for
Distinct-Value Estimation Under Multiset Operations" for the multiset
algebra this implements).

State: per group, the k smallest md5_int60 hashes of the distinct keys —
exactly the bottom-k sample's state (operators/sampling.py), so every
property already proven there carries over: deterministic (a pure function
of the data — same sketch on any engine, partitioning, or ingest order),
MERGEABLE (bottom-k of a union == bottom-k of the per-shard bottom-ks
folded), and k·groups rows forever.

Pairwise estimation (Beyer et al. §5): for groups A and B, let L be the k
smallest hashes of S_A ∪ S_B (set union of the two sketches — equal keys
hash equally, so the union dedupes by hash). Then

    jaccard_est = |{h ∈ L : h ∈ S_A and h ∈ S_B}| / |L|

is the minwise estimate of |A∩B|/|A∪B| (L is a uniform size-|L| sample of
the union's distinct keys; membership in both sketches marks a key of the
intersection), and |L| < k only when the union itself has fewer than k
distinct keys — in which case the estimate is EXACT. The match count and
|L| are integers, so everything up to the final ratio is hash-exact
cross-engine; the ratio is one fixed IEEE division, the same discipline as
the assortativity/clustering censuses.

Scale shape: one distinct + one groupBy-window per group for the sketches
(bounded by k per group, never vocabulary size); pair estimation joins
sketch rows against a pairs dim — cost is pairs × 2k rows, independent of
the data the sketches summarize. That's the 100 TB story: the corpus scan
happens once to build k-row states; every later overlap question touches
only sketches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from streamds_spark.functions.hashing import md5_int60


def kmv_sketch(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
    pre_distinct: bool = False,
) -> DataFrame:
    """DataFrame[group, h] — per group, the k smallest md5_int60 hashes of
    the DISTINCT key values. The group's mergeable DV/intersection state.

    pre_distinct=True skips the internal dedup for inputs the caller
    already distincted on (group, key) — a second distinct over a distinct
    is a pure wasted exchange+aggregate, the most expensive shuffle in a
    vocabulary-sized input."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    distinct = df.select(
        F.col(group_col).alias("group"), F.col(key_col).alias("key")
    )
    if not pre_distinct:
        distinct = distinct.distinct()
    w = Window.partitionBy("group").orderBy("h")
    return (
        distinct.withColumn("h", md5_int60(F.col("key")))
        .select("group", "h")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def kmv_merge(k: int, *sketches: DataFrame) -> DataFrame:
    """Fold per-shard sketches of the same grouping: union, dedupe by
    (group, h), keep the k smallest per group — exactly the whole-data
    sketch (a hash in the union's bottom k is in its shard's bottom k
    a fortiori; dedupe first because the same key appears in many shards)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    w = Window.partitionBy("group").orderBy("h")
    return (
        out.distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def kmv_pair_jaccard(sketch: DataFrame, pairs: DataFrame, k: int) -> DataFrame:
    """DataFrame[group_a, group_b, k_union, kmv_matches, jaccard_est] for
    every row of `pairs(group_a, group_b)`: the union-bottom-k minwise
    Jaccard estimate between the two groups' sketches.

    k_union = |L| (== k unless the union is smaller — then exact),
    kmv_matches = intersection markers in L, jaccard_est their one-division
    ratio rounded to 4dp. All inputs to the division are exact integers."""
    side_a = sketch.join(pairs, sketch.group == pairs.group_a).select(
        "group_a", "group_b", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    )
    side_b = sketch.join(pairs, sketch.group == pairs.group_b).select(
        "group_a", "group_b", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
    )
    member = (
        side_a.unionByName(side_b)
        .groupBy("group_a", "group_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("group_a", "group_b").orderBy("h")
    union_k = member.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    agg = union_k.groupBy("group_a", "group_b").agg(
        F.count("*").cast("bigint").alias("k_union"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("kmv_matches"),
        F.round(
            F.sum(F.col("in_a") * F.col("in_b"))
            / F.count("*").cast("double"),
            4,
        ).alias("jaccard_est"),
    )
    # "for every row of pairs" means EVERY row: a pair whose groups have no
    # sketch rows at all (empty group, absent name) must yield an explicit
    # zero row, not vanish — a caller cannot otherwise tell "not computed"
    # from "no overlap". jaccard_est is 0.0 by convention (0 evidence).
    return (
        pairs.select("group_a", "group_b")
        .join(agg, ["group_a", "group_b"], "left")
        .select(
            "group_a",
            "group_b",
            F.coalesce("k_union", F.lit(0)).cast("bigint").alias("k_union"),
            F.coalesce("kmv_matches", F.lit(0)).cast("bigint").alias("kmv_matches"),
            F.coalesce("jaccard_est", F.lit(0.0)).alias("jaccard_est"),
        )
    )
