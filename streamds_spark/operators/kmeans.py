"""Iterative k-means over an embedding column — the driver-loop pattern for
iterative algorithms: each iteration is one bounded Spark job (assign = join +
two aggs), only the k×dim centroid table ever reaches the driver.

Scale: vectors stay distributed; centroids are broadcast (k·dim doubles).
Convergence is measured by centroid movement, so the loop exits early on
stable clusterings. For 100 TB use a sampled init (k-means|| style) — init
here is deterministic first-k for reproducibility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamds_spark.functions.vectors import as_double


def _assign(pos: DataFrame, centroids: DataFrame) -> DataFrame:
    """pos(vec_id, d, x) × centroids(cid, d, cx) → (vec_id, cid) nearest."""
    from pyspark.sql import Window

    scored = (
        pos.join(F.broadcast(centroids), "d")
        .groupBy("vec_id", "cid")
        .agg(F.sum((F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))).alias("dist2"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("dist2"), F.asc("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "cid")
    )


def kmeans(
    vectors: DataFrame,
    k: int,
    max_iter: int = 10,
    tol: float = 1e-4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """Lloyd's algorithm. Returns (assignments(vec_id, cid), centroids).

    The per-iteration driver data is exactly the k×dim centroid list — used to
    build the next broadcast literal and the movement check; the vector table
    is never collected.
    """
    pos = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(as_double(F.col(vec_col))).alias("d", "x"),
    )
    spark = vectors.sparkSession
    # deterministic init: first k vectors by id
    first_k = (
        vectors.orderBy(id_col).limit(k)
        .select(F.col(id_col), F.posexplode(as_double(F.col(vec_col))).alias("d", "x"))
        .collect()
    )
    ids = sorted({r[0] for r in first_k})
    cid_of = {v: i for i, v in enumerate(ids)}
    cents: dict[tuple[int, int], float] = {(cid_of[r[0]], r["d"]): r["x"] for r in first_k}
    dim = max(d for _, d in cents) + 1
    centroids_rows = [(c, d, cents[(c, d)]) for c in range(k) for d in range(dim)]

    assign = None
    for _ in range(max_iter):
        centroids = spark.createDataFrame(centroids_rows, ["cid", "d", "cx"])
        assign = _assign(pos, centroids)
        new_rows = (
            pos.join(assign, "vec_id")
            .groupBy("cid", "d")
            .agg(F.avg("x").alias("cx"))
            .collect()
        )
        new_map = {(r["cid"], r["d"]): r["cx"] for r in new_rows}
        movement = max(
            abs(new_map.get((c, d), cents[(c, d)]) - cents[(c, d)])
            for c in range(k)
            for d in range(dim)
            if (c, d) in cents
        )
        cents = {**cents, **new_map}
        centroids_rows = [(c, d, cents[(c, d)]) for c in range(k) for d in range(dim)]
        if movement < tol:
            break

    centroid_list = [[cents[(c, d)] for d in range(dim)] for c in range(k)]
    return assign, centroid_list
