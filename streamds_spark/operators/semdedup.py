"""SemDeDup — semantic deduplication over an embedding column (Abbas et al.
2023: cluster the embeddings, then drop all but one of any within-cluster
pair whose cosine similarity exceeds a threshold; near-duplicate MEANING
survives paraphrase, so this catches what MinHash/SimHash text shingles
cannot).

Reference-capability note: the reference stack (StreamDS) has no embedding
operators; this extends the LLM-data layer like the other dedup families
(cited for parity bookkeeping only).

Spark shape:
  1. cluster assignment — either k-means centroids (broadcast literal
     matrix, one map-side argmin; the production path, plug in
     operators/kmeans output) or deterministic hyperplane SIGN buckets over
     the first `n_sign_bits` dimensions (zero training, SQL-twin-able —
     the oracle-checked path). Either way: one new column, no shuffle yet.
  2. within-cluster candidate pairs — a self equi-join ON the cluster id
     (id_a < id_b), cosine >= threshold. The join shuffles on cluster id
     ONCE; no all-pairs anything.
  3. keep rule — a row is dropped iff it has an above-threshold neighbor
     with a LOWER id (keep-min-id: deterministic, one distinct + one
     left-anti/flag join). SemDeDup's paper rule (keep the point farthest
     from the centroid) needs centroids; keep-min-id is the
     centroid-free equivalent the oracle can replicate exactly.

Scale: the within-cluster join is quadratic IN THE CLUSTER SIZE — that is
inherent to SemDeDup, and the control knob is cluster granularity (the
paper uses k ≈ n/⟨cluster⟩ with ⟨cluster⟩ a few hundred; here n_sign_bits
doubles the cluster count per bit). Skewed mega-clusters are the same
failure mode as LSH mega-buckets — cap or re-cluster them (the star-cap
pattern in dedup_pipeline.py applies verbatim if needed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from streamds_spark.functions.vectors import cosine


def sign_bucket_expr(vec_col: str, n_bits: int) -> Column:
    """Deterministic cluster id from the signs of the first n_bits vector
    dimensions (axis-aligned hyperplane LSH): bit k set iff v[k] >= 0.
    Cheap, training-free, and expressible identically in ANSI SQL — the
    cross-engine-checkable clustering."""
    if not 1 <= n_bits <= 30:
        raise ValueError(f"n_bits must be in [1, 30], got {n_bits}")
    bits = [
        F.when(F.element_at(F.col(vec_col), k + 1) >= 0, F.lit(1 << (n_bits - 1 - k)))
        .otherwise(F.lit(0))
        for k in range(n_bits)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def semdedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    threshold: float = 0.8,
    n_sign_bits: int = 8,
    cluster_col: str | None = None,
) -> DataFrame:
    """(id_col, cluster_id, is_kept): keep-min-id semantic dedup within
    clusters. Pass `cluster_col` to use your own assignment (e.g. k-means
    list ids); otherwise sign buckets over the first n_sign_bits dims.
    Cosines are rounded to 4 decimals before the threshold compare so both
    engines resolve boundary pairs identically (the repo's float rule)."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    reserved = {"cluster_id", "_ib"}
    clash = reserved & set(emb.columns)
    if clash:
        raise ValueError(f"input carries reserved column(s) {sorted(clash)}")
    if cluster_col is None:
        clustered = emb.withColumn(
            "cluster_id", sign_bucket_expr(vec_col, n_sign_bits)
        )
    else:
        clustered = emb.withColumn("cluster_id", F.col(cluster_col).cast("int"))
    # the clustered relation feeds both join sides and the final output —
    # one lazy materialization instead of three assignment passes
    clustered = clustered.select(id_col, vec_col, "cluster_id").localCheckpoint(
        eager=False
    )
    a = clustered.alias("a")
    b = clustered.alias("b")
    dropped = (
        a.join(
            b,
            (F.col("a.cluster_id") == F.col("b.cluster_id"))
            & (F.col(f"b.{id_col}") > F.col(f"a.{id_col}")),
        )
        .filter(
            F.round(cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 4)
            >= F.lit(float(threshold))
        )
        .select(F.col(f"b.{id_col}").alias("_ib"))
        .distinct()
    )
    return (
        clustered.join(dropped, clustered[id_col] == dropped._ib, "left")
        .select(
            id_col,
            "cluster_id",
            F.col("_ib").isNull().alias("is_kept"),
        )
    )
