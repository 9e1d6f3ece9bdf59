"""Exact set-similarity self-join via prefix filtering (AllPairs / PPJoin
family): every pair of records whose token-set Jaccard meets a threshold,
WITHOUT the quadratic all-pairs comparison and WITHOUT the approximation of
MinHash-LSH (operators/dedup_pipeline.py) — the exact complement in the
dedup toolbox. Bayardo et al. "Scaling Up All Pairs Similarity Search"
(WWW'07) for the prefix filter; Vernica et al. "Efficient Parallel
Set-Similarity Joins Using MapReduce" (SIGMOD'10) for the distributed shape
this follows.

The prefix-filter theorem: order every record's tokens by one GLOBAL
canonical order (ascending document frequency, rarest first — ties on the
token itself) and keep only the first p = s - ceil(tau*s) + 1 tokens of a
size-s record. Any two records with Jaccard >= tau MUST share at least one
prefix token — a pair that first agrees after both prefixes have passed has
too few tokens left to reach the threshold. So the candidate set is the
self-join of the PREFIX inverted lists only, and rare-first ordering makes
those lists the shortest ones available.

Threshold math is INTEGER end to end: tau = tau_num/tau_den, the length
filter is tau_den*min_size >= tau_num*max_size (Jaccard >= tau implies
min >= tau*max), the verify is tau_den*inter >= tau_num*union — no float
ever decides membership, so the result is hash-exact against a DuckDB
inverted-index replay that applies the same integer predicate to ALL
token-sharing pairs (the oracle proves the prefix filter loses nothing).

Scale shape: document frequencies are one groupBy over the exploded tokens
(partial-agg collapses map-side); the canonical per-record sort is a
bounded array sort (record size, never corpus size); candidate generation
shuffles on the prefix token — cost is sum over prefix tokens of df², which
rare-first ordering minimizes, and a df cap (like the LSH star cap) composes
for stopword-grade hubs; the verify join touches candidates only. Nothing
is broadcast by hint; nothing is quadratic in the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _check_tau(tau_num: int, tau_den: int) -> None:
    if not (0 < tau_num <= tau_den):
        raise ValueError(f"need 0 < tau_num <= tau_den, got {tau_num}/{tau_den}")


def _canonical_sets(sets: DataFrame, id_col: str, set_col: str) -> DataFrame:
    """(_sid, _sset) with the token array deduplicated."""
    return sets.select(
        F.col(id_col).alias("_sid"), F.array_distinct(F.col(set_col)).alias("_sset")
    )


def setsim_candidates(
    sets: DataFrame,
    tau_num: int,
    tau_den: int,
    id_col: str = "id",
    set_col: str = "tokens",
    _base: "DataFrame | None" = None,
) -> DataFrame:
    """DataFrame[id_a, id_b] (id_a < id_b) — the prefix-filter candidate
    pairs with the length filter applied, BEFORE exact verification.
    Exposed separately so tests can pin that the filter prunes (the
    candidate count sits far below the full inverted-index pair count)
    while setsim_join stays exactly complete. `_base`: a prebuilt
    canonical-sets relation (setsim_join passes its checkpointed one so
    the upstream tokenize pipeline runs once, not per subtree)."""
    _check_tau(tau_num, tau_den)
    base = _canonical_sets(sets, id_col, set_col) if _base is None else _base
    inv = base.select("_sid", F.explode("_sset").alias("_tok"))
    df = inv.groupBy("_tok").agg(F.count("*").alias("_df"))
    # canonical order: ascending (df, token); the prefix keeps the rarest
    ordered = (
        inv.join(df, "_tok")
        .groupBy("_sid")
        .agg(F.sort_array(F.collect_list(F.struct("_df", "_tok"))).alias("_ord"))
        .select("_sid", F.col("_ord._tok").alias("_toks"), F.size("_ord").alias("_s"))
    )
    # p = s - ceil(tau*s) + 1, all-integer ceil
    p_len = F.col("_s") - F.floor(
        (F.col("_s") * tau_num + tau_den - 1) / tau_den
    ).cast("int") + F.lit(1)
    prefix = ordered.select(
        "_sid",
        "_s",
        F.explode(F.slice("_toks", F.lit(1), F.greatest(p_len, F.lit(0)))).alias("_tok"),
    )
    a = prefix.toDF("id_a", "sa", "_tok")
    b = prefix.toDF("id_b", "sb", "_tok")
    return (
        a.join(b, "_tok")
        .where(F.col("id_a") < F.col("id_b"))
        # length filter: tau*max <= min, in integers
        .where(F.least("sa", "sb") * tau_den >= F.greatest("sa", "sb") * tau_num)
        .select("id_a", "id_b")
        .distinct()
    )


def setsim_join(
    sets: DataFrame,
    tau_num: int,
    tau_den: int,
    id_col: str = "id",
    set_col: str = "tokens",
) -> DataFrame:
    """DataFrame[id_a, id_b, n_inter, n_union, jaccard] — all pairs (id_a < id_b)
    from `sets(id_col, set_col: array<string>)` with exact Jaccard
    >= tau_num/tau_den (0 < tau <= 1). Token arrays are deduplicated
    internally; empty sets never pair (Jaccard with an empty set is 0).

    The canonical-sets relation is lazily checkpointed and shared by every
    subtree (round 11, guide §1.3): without it, the candidate branch and
    both verify-join sides each recompute the whole upstream
    tokenize/shingle pipeline — at sf0.1 that was two extra ~27 s
    single-task map stages per run."""
    base = _canonical_sets(sets, id_col, set_col).localCheckpoint(eager=False)
    cand = setsim_candidates(sets, tau_num, tau_den, id_col, set_col, _base=base)
    inter = F.size(F.array_intersect("set_a", "set_b"))
    union = F.size("set_a") + F.size("set_b") - inter
    return (
        cand.join(base.toDF("id_a", "set_a"), "id_a")
        .join(base.toDF("id_b", "set_b"), "id_b")
        .withColumn("n_inter", inter.cast("bigint"))
        .withColumn("n_union", union.cast("bigint"))
        # verify: tau_den*inter >= tau_num*union — integer-exact membership
        .where(F.col("n_inter") * tau_den >= F.col("n_union") * tau_num)
        .where(F.col("n_union") > 0)
        .select(
            "id_a",
            "id_b",
            "n_inter",
            "n_union",
            F.round(F.col("n_inter") / F.col("n_union"), 4).alias("jaccard"),
        )
    )
