"""End-to-end corpus deduplication pipeline — the user-facing composition of
the dedup primitives: candidates (LSH) → verify (exact Jaccard) → resolve
(keep one doc per duplicate group).

    kept, dropped = dedup_corpus(spark, docs)   # docs: (doc_id, text, …)

Resolution uses min-doc_id as the group representative via min-label
propagation with pointer jumping on the verified-pair graph (a duplicate
CLUSTER can chain: A~B, B~C without A~C) — iterated to a detected fixpoint,
O(log diameter) rounds.

Scale: every step is joins/aggs on (doc_id, bucket) keys — no driver-side
state; the pair list is bounded by LSH bucket occupancy, and buckets above
max_bucket_size are star-connected so a boilerplate mega-bucket costs O(n)
pairs, not O(n²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamds_spark.functions.hashing import (
    MINHASH_PRIME,
    md5_int28,
    minhash_perm_constants,
)
from streamds_spark.functions.text import shingles_expr, tokens


def minhash_signatures(
    docs: DataFrame, num_perm: int = 16, shingle_n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    sh = (
        docs.select(id_col, tokens(F.col(text_col)).alias("toks"))
        .select(id_col, F.explode(shingles_expr("toks", shingle_n)).alias("shingle"))
        .select(id_col, md5_int28(F.col("shingle")).alias("h"))
    )
    mins = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"m{i}")
        for i, (a, b) in enumerate(minhash_perm_constants(num_perm))
    ]
    return sh.groupBy(id_col).agg(*mins)


def lsh_band_buckets(
    signatures: DataFrame, bands: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """(id, band, bucket) via ONE posexplode over per-band hashes — avoids
    re-evaluating the signature subtree once per band per join side."""
    sig_cols = [c for c in signatures.columns if c != id_col]
    rows_per_band = len(sig_cols) // bands
    band_hashes = F.array(
        *[
            F.md5(F.concat_ws(",", *[
                F.col(c).cast("string")
                for c in sig_cols[b * rows_per_band : (b + 1) * rows_per_band]
            ]))
            for b in range(bands)
        ]
    )
    return signatures.select(id_col, F.posexplode(band_hashes).alias("band", "bucket"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 4,
    id_col: str = "doc_id",
    max_bucket_size: int | None = 64,
) -> DataFrame:
    """Candidate pairs from band buckets.

    Mega-bucket guard: an all-pairs self-join is quadratic WITHIN a bucket —
    10k identical docs share every bucket and would emit ~50M pairs (and at
    100 TB, boilerplate/license pages make such buckets common). Buckets
    larger than `max_bucket_size` are therefore STAR-CONNECTED instead: every
    member pairs only with the bucket's min id. That emits O(n) pairs yet
    keeps the duplicate group fully connected, so resolve_groups() collapses
    it to the same single representative — recall of whole-group dedup is
    unchanged; only the explicit pair list is thinned. max_bucket_size=None
    restores exact all-pairs semantics (used by the oracle-checked registry
    query, where sf buckets are tiny).
    """
    # Round-11 measurement notes (interleaved within-session min-of-N at
    # sf0.1): for the UNCAPPED branch (2 bucket uses, the self-join sides) a
    # lazy localCheckpoint of the bucket table measured neutral-to-slightly
    # slower (1.212 s plain vs 1.233 s) — AQE exchange reuse already dedupes
    # the identical sides at runtime (verified in the executed plan: one
    # shingle Generate, one wide aggregate). For the CAPPED branch the bucket
    # table has THREE consumers (stats, the sized join, and through it both
    # join sides), reuse has more shapes to miss, and the checkpoint measured
    # a real win on the 10x-corpus watch (3.032 s -> 2.600 s), so it applies
    # there only. Checkpoint payload is (id, band, bucket) — a few dozen
    # bytes per doc at any corpus size, tiny next to recomputing signatures;
    # fresh per DataFrame instance, nothing persists across invocations.
    # Callers that reuse SIGNATURES beyond the pair join
    # (dedup_minhash_estimate_error: 4 uses) checkpoint the signature df
    # themselves, where it also measurably wins (0.79x).
    buckets = lsh_band_buckets(signatures, bands, id_col)
    if max_bucket_size is None:
        sized = buckets
        small, big = buckets, None
    else:
        buckets = buckets.localCheckpoint(eager=False)
        stats = buckets.groupBy("band", "bucket").agg(
            F.count("*").alias("_bn"), F.min(id_col).alias("_bmin")
        )
        sized = buckets.join(stats, ["band", "bucket"])
        small = sized.filter(F.col("_bn") <= max_bucket_size).select(id_col, "band", "bucket")
        big = (
            sized.filter((F.col("_bn") > max_bucket_size) & (F.col(id_col) != F.col("_bmin")))
            .select(F.col("_bmin").alias("id_a"), F.col(id_col).alias("id_b"))
        )
    a, b_ = small.alias("a"), small.alias("b")
    pairs = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
    )
    if big is not None:
        pairs = pairs.unionByName(big)
    return pairs.distinct()


def lsh_bucket_report(
    signatures: DataFrame, bands: int = 4, id_col: str = "doc_id", max_bucket_size: int = 64
) -> dict:
    """Diagnostics for the mega-bucket guard: how many buckets were capped and
    the worst occupancy. Cheap (aggregates bucket ids only); call it when a
    dedup run needs an audit trail of what the cap thinned."""
    stats = (
        lsh_band_buckets(signatures, bands, id_col)
        .groupBy("band", "bucket")
        .agg(F.count("*").alias("n"))
        .agg(
            F.count("*").alias("n_buckets"),
            F.sum(F.when(F.col("n") > max_bucket_size, 1).otherwise(0)).alias("n_capped"),
            F.max("n").alias("max_occupancy"),
        )
        .collect()[0]
    )
    return {
        "n_buckets": stats["n_buckets"],
        "n_capped": int(stats["n_capped"] or 0),
        "max_occupancy": stats["max_occupancy"],
        "cap": max_bucket_size,
    }


def verify_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    threshold: float = 0.7,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs → (id_a, id_b, jaccard)."""
    sets_ = (
        docs.select(id_col, tokens(F.col(text_col)).alias("toks"))
        .select(
            F.col(id_col).alias("_vid"),
            F.array_distinct(shingles_expr("toks", shingle_n)).alias("sset"),
        )
    )
    a = sets_.withColumnRenamed("_vid", "id_a").withColumnRenamed("sset", "sa")
    b = sets_.withColumnRenamed("_vid", "id_b").withColumnRenamed("sset", "sb")
    inter = F.size(F.array_intersect("sa", "sb")).cast("double")
    union = F.size(F.array_union("sa", "sb")).cast("double")
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", (inter / F.nullif(union, F.lit(0.0))).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def resolve_groups(verified: DataFrame, max_iter: int = 25) -> DataFrame:
    """Connected components toward the min id: (node, rep) for every doc that
    appears in a verified pair — dup CLUSTERS can chain (A~B, B~C without A~C),
    so this must converge for arbitrary chain diameters, not a fixed hop count.

    The algorithm (neighbor-min propagation + pointer jump, O(log diameter)
    rounds, label-sum fixpoint detection, stats-pinned per-round checkpoints —
    see operators/iterate.py for why) lived here since round 2 and is now the
    first-class graph operator operators/concomp.py connected_components;
    this delegates — same rounds, same fixpoint, same non-convergence
    warning contract (warn, don't raise).
    """
    from streamds_spark.operators.concomp import connected_components

    edges = verified.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    )
    return connected_components(edges, max_iter=max_iter).select(
        "node", F.col("component").alias("rep")
    )


def dedup_corpus(
    docs: DataFrame,
    threshold: float = 0.7,
    num_perm: int = 16,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Returns (kept_docs, dropped_ids): near-dup groups keep their min-id doc."""
    sigs = minhash_signatures(docs, num_perm, id_col=id_col, text_col=text_col)
    pairs = lsh_candidate_pairs(sigs, bands, id_col=id_col)
    verified = verify_pairs(docs, pairs, threshold, id_col=id_col, text_col=text_col)
    groups = resolve_groups(verified)
    dropped = groups.filter(F.col("node") != F.col("rep")).select(
        F.col("node").alias(id_col)
    )
    kept = docs.join(dropped, id_col, "left_anti")
    return kept, dropped


def evaluate_pairs(predicted: DataFrame, truth: DataFrame) -> dict:
    """Precision/recall of a candidate- or verified-pair set against labeled
    truth pairs. Pairs are order-normalized before the joins, so (a,b) and
    (b,a) count as the same pair. All set arithmetic is two semi-join counts —
    no collect of the pair lists.

        evaluate_pairs(lsh_candidate_pairs(sigs), truth_df)
        -> {"precision": ..., "recall": ..., "n_predicted": ..., "n_truth": ...}
    """

    def norm(df: DataFrame) -> DataFrame:
        return df.select(
            F.least("id_a", "id_b").alias("id_a"), F.greatest("id_a", "id_b").alias("id_b")
        ).distinct()

    p, t = norm(predicted), norm(truth)
    n_pred = p.count()
    n_truth = t.count()
    n_hit = p.join(t, ["id_a", "id_b"], "left_semi").count()
    return {
        "precision": n_hit / n_pred if n_pred else None,
        "recall": n_hit / n_truth if n_truth else None,
        "n_predicted": n_pred,
        "n_truth": n_truth,
        "n_hit": n_hit,
    }
