"""Embedding-column statistics: per-dimension moments and inter-dimension
correlation — the whitening / PCA-prep and drift-detection passes an embedding
pipeline runs before indexing.

Scale posture: posexplode keeps each row's 64 floats in one codegen'd pass and
the aggregate has exactly `dim` (or `dim²/2`) groups — partial aggregation
map-side means the shuffle moves O(partitions × dim) rows regardless of table
size. The correlation query restricts to the first CORR_DIMS dimensions so the
self-join blowup is bounded and explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.registry import query


@query(
    "embedding_dim_stats",
    oracle=r"""
    WITH e AS (
        SELECT i AS dim, CAST(embedding[i] AS DOUBLE) AS v
        FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
    )
    SELECT dim,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(v), 4) + 0.0 AS mean,
           round(stddev_pop(v), 4) AS std,
           round(min(v), 4) + 0.0 AS min_v,
           round(max(v), 4) + 0.0 AS max_v
    FROM e GROUP BY dim
    """,
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/std/min/max over the embedding column — the input to
    mean-centering and variance whitening. posexplode → one shuffle with 64
    groups (partial-agg'd map-side)."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(F.posexplode("embedding").alias("pos", "v")).select(
        (F.col("pos") + 1).alias("dim"), F.col("v").cast("double").alias("v")
    )
    # "+ 0.0" normalizes IEEE negative zero: round() of a tiny negative mean
    # yields -0.0, which one engine prints as "-0" and the other as "0"
    # (observed at sf0.1); -0.0 + 0.0 = +0.0 in both.
    return e.groupBy("dim").agg(
        F.count("*").alias("n"),
        (F.round(F.avg("v"), 4) + F.lit(0.0)).alias("mean"),
        F.round(F.stddev_pop("v"), 4).alias("std"),
        (F.round(F.min("v"), 4) + F.lit(0.0)).alias("min_v"),
        (F.round(F.max("v"), 4) + F.lit(0.0)).alias("max_v"),
    )


CORR_DIMS = 8  # leading dimensions included in the pairwise-correlation sweep


@query(
    "embedding_dim_corr",
    oracle=rf"""
    WITH e AS (
        SELECT vec_id, i AS dim, CAST(embedding[i] AS DOUBLE) AS v
        FROM embeddings, unnest(generate_series(1, {CORR_DIMS})) AS t(i)
    )
    SELECT a.dim AS dim_i, b.dim AS dim_j,
           round(corr(a.v, b.v), 4) + 0.0 AS pearson
    FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.dim < b.dim
    GROUP BY a.dim, b.dim
    """,
)
def embedding_dim_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation between the first {CORR_DIMS} embedding
    dimensions (collinearity / dead-dimension detector; full-matrix PCA would
    run the same plan over all dim² pairs).

    NO self-join: each row explodes directly into its C({CORR_DIMS},2) (x, y)
    pairs — the oracle's `e a JOIN e b ON vec_id` produces the same pair rows
    but pays two shuffles to co-partition; here the pairs are born co-located,
    so the only shuffle is the 28-group partial-aggregated sufficient-stats
    agg (n, Σx, Σy, Σx², Σy², Σxy), from which Pearson is a scalar expression."""
    emb = load_table(spark, sf_dir, "embeddings")
    pair_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("dim_i"),
                F.lit(j).alias("dim_j"),
                F.element_at("embedding", i).cast("double").alias("x"),
                F.element_at("embedding", j).cast("double").alias("y"),
            )
            for i in range(1, CORR_DIMS + 1)
            for j in range(i + 1, CORR_DIMS + 1)
        ]
    )
    pairs = emb.select(F.explode(pair_structs).alias("p")).select("p.*")
    stats = pairs.groupBy("dim_i", "dim_j").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / n
    vx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    vy = F.col("syy") - F.col("sy") * F.col("sy") / n
    return stats.select(
        "dim_i",
        "dim_j",
        # + 0.0: negative-zero normalization (see embedding_dim_stats)
        (F.round(cov / F.sqrt(vx * vy), 4) + F.lit(0.0)).alias("pearson"),
    )
