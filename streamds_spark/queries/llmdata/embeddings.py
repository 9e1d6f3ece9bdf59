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


# Matryoshka truncation check: pair selection is deterministic (vec_id with
# vec_id + _MRL_STEP) so both engines score the same pairs.
_MRL_STEP = 37
_MRL_DIMS = (64, 32, 16)  # full, half, quarter of the 64-dim embeddings


def _duckdb_cos_prefix(a: str, b: str, d: int) -> str:
    dot = f"list_sum(list_transform(range(1, {d} + 1), i -> {a}[i] * {b}[i]))"
    na = f"sqrt(list_sum(list_transform(range(1, {d} + 1), i -> {a}[i] * {a}[i])))"
    nb = f"sqrt(list_sum(list_transform(range(1, {d} + 1), i -> {b}[i] * {b}[i])))"
    return f"({dot} / ({na} * {nb}))"


@query(
    "matryoshka_truncation_quality",
    oracle=rf"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.v AS va, b.v AS vb
        FROM e a JOIN e b ON b.vec_id = a.vec_id + {_MRL_STEP}
    ),
    cos AS (
        SELECT id_a, id_b,
               {', '.join(
                   f"CAST(round({_duckdb_cos_prefix('va', 'vb', d)}, 8) "
                   f"AS DECIMAL(12,8)) AS cos_{d}"
                   for d in _MRL_DIMS
               )}
        FROM pairs
    ),
    s AS (
        SELECT count(*) AS n, sum(cos_64) AS sy, sum(cos_64 * cos_64) AS syy,
               {', '.join(
                   f"sum(abs(cos_{d} - cos_64)) AS sabs_{d}, "
                   f"sum(cos_{d}) AS sx_{d}, sum(cos_{d} * cos_{d}) AS sxx_{d}, "
                   f"sum(cos_{d} * cos_64) AS sxy_{d}"
                   for d in _MRL_DIMS[1:]
               )}
        FROM cos
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           {', '.join(
               f"round(CAST(sabs_{d} AS DOUBLE) / n, 4) AS mae_{d}"
               for d in _MRL_DIMS[1:]
           )},
           {', '.join(
               f"round((n * CAST(sxy_{d} AS DOUBLE) "
               f"- CAST(sx_{d} AS DOUBLE) * CAST(sy AS DOUBLE)) "
               f"/ sqrt((n * CAST(sxx_{d} AS DOUBLE) "
               f"- CAST(sx_{d} AS DOUBLE) * CAST(sx_{d} AS DOUBLE)) "
               f"* (n * CAST(syy AS DOUBLE) "
               f"- CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4) AS corr_{d}"
               for d in _MRL_DIMS[1:]
           )}
    FROM s
    """,
)
def matryoshka_truncation_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much cosine structure survives truncating embeddings to the first
    32 / 16 dims (the Matryoshka-representation question: can the ANN index
    run on a prefix and rerank on the full vector?): mean |cos_d - cos_64|
    and corr(cos_d, cos_64) over a deterministic pair sample (vec_id paired
    with vec_id+{_MRL_STEP}).

    Plan: ONE self-equi-join on a shifted key (no cross join — the pair
    sample is linear in table size), prefix cosines as codegen aggregates
    over array slices, then a single global reduce. Per-pair cosines are
    rounded to 8 decimals and summed as DECIMALs (exact, order-independent),
    so MAE and the corr sufficient statistics are bit-identical across
    engines — a double sum's partial-agg order could flip round(.,4) (see
    registry header). At 100 TB you'd sample ids by hash instead of taking
    all; the shape is unchanged."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    a = e.alias("a")
    b = e.select((F.col("vec_id") - _MRL_STEP).alias("join_id"), F.col("v").alias("vb"))
    pairs = a.join(b, F.col("a.vec_id") == F.col("join_id")).select(
        F.col("a.v").alias("va"), "vb"
    )

    def cos_prefix(d: int):
        dot = F.expr(
            f"aggregate(zip_with(slice(va, 1, {d}), slice(vb, 1, {d}), "
            f"(x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, z) -> acc + z)"
        )
        na = F.sqrt(
            F.expr(
                f"aggregate(slice(va, 1, {d}), CAST(0.0 AS DOUBLE), "
                f"(acc, x) -> acc + x * x)"
            )
        )
        nb = F.sqrt(
            F.expr(
                f"aggregate(slice(vb, 1, {d}), CAST(0.0 AS DOUBLE), "
                f"(acc, x) -> acc + x * x)"
            )
        )
        return dot / (na * nb)

    cos = pairs.select(
        *[
            F.round(cos_prefix(d), 8).cast("decimal(12,8)").alias(f"cos_{d}")
            for d in _MRL_DIMS
        ]
    )
    s = cos.agg(
        F.count("*").alias("n"),
        F.sum("cos_64").alias("sy"),
        F.sum(F.col("cos_64") * F.col("cos_64")).alias("syy"),
        *[
            agg
            for d in _MRL_DIMS[1:]
            for agg in (
                F.sum(F.abs(F.col(f"cos_{d}") - F.col("cos_64"))).alias(f"sabs_{d}"),
                F.sum(f"cos_{d}").alias(f"sx_{d}"),
                F.sum(F.col(f"cos_{d}") * F.col(f"cos_{d}")).alias(f"sxx_{d}"),
                F.sum(F.col(f"cos_{d}") * F.col("cos_64")).alias(f"sxy_{d}"),
            )
        ],
    )
    n = F.col("n")
    sy = F.col("sy").cast("double")
    syy = F.col("syy").cast("double")

    def corr_col(d: int):
        sx = F.col(f"sx_{d}").cast("double")
        sxx = F.col(f"sxx_{d}").cast("double")
        sxy = F.col(f"sxy_{d}").cast("double")
        return F.round(
            (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 4
        )

    return s.select(
        n.cast("bigint").alias("n_pairs"),
        *[
            F.round(F.col(f"sabs_{d}").cast("double") / n, 4).alias(f"mae_{d}")
            for d in _MRL_DIMS[1:]
        ],
        *[corr_col(d).alias(f"corr_{d}") for d in _MRL_DIMS[1:]],
    )
