"""Similarity search over the `embeddings` table (array<float> column).

Two tiers:
  ann_bruteforce_topk — exact top-k by cosine, a single codegen'd scan + TakeOrdered.
    At 100 TB this is the per-partition-local-topk → k-row driver merge plan
    (no global sort, no collect of the scan).
  ann_lsh_topk / ann_multiprobe_topk — random-hyperplane LSH: N_PLANES
    deterministic (md5-seeded) hyperplanes → an N_PLANES-bit bucket; search only
    the query's bucket (multi-probe adds all Hamming-distance-1 buckets). The
    bucket id is a plain integer column, so at scale the table can be written
    bucketed/partitioned by it and a probe becomes partition pruning. Both are
    fully oracle-checked: the DuckDB twin rebuilds the buckets from the same
    plane literals (see _duckdb_bucket_expr); recall vs brute-force is
    additionally asserted in tests/test_similarity.py.
  kmeans_assign_step — one Lloyd's-algorithm assignment step (centroid per label,
    assign each vector to nearest centroid): posexplode → avg per (label, dim) →
    broadcast centroids → argmin. The iterative loop is driver-side over this
    step (each iteration is one shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.functions.vectors import (
    as_double,
    cosine,
    duckdb_cosine,
    hyperplanes,
    lsh_bucket_col,
)
from streamds_spark.registry import query

QUERY_VEC_ID = 0  # the probe vector for top-k queries
TOP_K = 10
N_PLANES = 6  # 64 buckets: sized so sf0.01's 500 vectors average ~8 per bucket
EMB_DIM = 64


@query(
    "ann_bruteforce_topk",
    oracle=f"""
    SELECT b.vec_id AS vec_id, b.label AS label,
           round({duckdb_cosine('a.embedding', 'b.embedding')}, 4) AS cos_sim
    FROM embeddings a, embeddings b
    WHERE a.vec_id = {QUERY_VEC_ID} AND b.vec_id <> {QUERY_VEC_ID}
    ORDER BY cos_sim DESC, vec_id
    LIMIT {TOP_K}
    """,
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for one probe vector: broadcast the probe, scan once,
    TakeOrderedAndProject."""
    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        as_double(F.col("embedding")).alias("q")
    )
    cand = emb.filter(F.col("vec_id") != QUERY_VEC_ID).select(
        "vec_id", "label", as_double(F.col("embedding")).alias("v")
    )
    return (
        cand.crossJoin(F.broadcast(probe))
        .select("vec_id", "label", F.round(cosine(F.col("v"), F.col("q")), 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(TOP_K)
    )


def default_planes() -> list[list[float]]:
    """The engine's default hyperplane set (N_PLANES × EMB_DIM), shared with
    the persisted ANN index (operators/ann.py)."""
    return hyperplanes(N_PLANES, EMB_DIM)


def _duckdb_bucket_expr(emb: str) -> str:
    """DuckDB expression mirroring lsh_bucket_col bit-for-bit: the plane
    constants print as shortest-round-trip decimals (exact same doubles), and
    a sign only diverges cross-engine if a dot product sits within float-noise
    of zero — measured ≫10 sigma away on this hyperplane construction."""
    terms = []
    for i, plane in enumerate(default_planes()):
        lits = ", ".join(repr(x) for x in plane)
        terms.append(
            f"CASE WHEN list_dot_product({emb}::DOUBLE[], [{lits}]) >= 0 "
            f"THEN {1 << i} ELSE 0 END"
        )
    return "(" + " + ".join(terms) + ")"


@query(
    "ann_lsh_topk",
    oracle=f"""
    WITH b AS (
        SELECT vec_id, label, embedding,
               {_duckdb_bucket_expr('embedding')} AS bucket
        FROM embeddings
    ),
    probe AS (SELECT embedding AS q, bucket AS qbucket FROM b WHERE vec_id = {QUERY_VEC_ID})
    SELECT b.vec_id AS vec_id, b.label AS label,
           round({duckdb_cosine('b.embedding', 'probe.q')}, 4) AS cos_sim
    FROM b, probe
    WHERE b.bucket = probe.qbucket AND b.vec_id <> {QUERY_VEC_ID}
    ORDER BY cos_sim DESC, vec_id
    LIMIT {TOP_K}
    """,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH bucket scan. Only vectors in the
    probe's bucket are scored — at scale, bucket = partition key ⇒ partition
    pruning turns this into a tiny scan."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("v")
    )
    bucketed = emb.withColumn("bucket", lsh_bucket_col(F.col("v"), default_planes()))
    probe = bucketed.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("q"), F.col("bucket").alias("qbucket")
    )
    return (
        bucketed.join(
            F.broadcast(probe), (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != QUERY_VEC_ID)
        )
        .select("vec_id", "label", F.round(cosine(F.col("v"), F.col("q")), 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(TOP_K)
    )


@query(
    "kmeans_assign_step",
    oracle="""
    WITH pos AS (
        SELECT vec_id, label,
               unnest(embedding::DOUBLE[]) AS x,
               unnest(range(1, len(embedding) + 1)) AS d
        FROM embeddings
    ),
    centroids AS (
        SELECT label AS c_label, d, avg(x) AS cx FROM pos GROUP BY label, d
    ),
    scored AS (
        SELECT p.vec_id, c.c_label, sum((p.x - c.cx) * (p.x - c.cx)) AS dist2
        FROM pos p JOIN centroids c ON p.d = c.d
        GROUP BY p.vec_id, c.c_label
    ),
    ranked AS (
        SELECT vec_id, c_label, dist2,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist2, c_label) AS rk
        FROM scored
    )
    SELECT vec_id, c_label AS assigned_label, round(dist2, 4) AS dist2_r
    FROM ranked WHERE rk = 1
    """,
)
def kmeans_assign_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One k-means assignment step with label-seeded centroids: centroid = avg
    per (label, dim); each vector assigned to the nearest centroid (squared L2).
    Centroids are tiny (labels × dims) → broadcast; the per-vector argmin is a
    window over ≤n_labels rows."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("v")
    )
    pos = emb.select(
        "vec_id", "label", F.posexplode(F.col("v")).alias("d0", "x")
    ).withColumn("d", F.col("d0") + 1)
    centroids = (
        pos.groupBy(F.col("label").alias("c_label"), "d").agg(F.avg("x").alias("cx"))
    )
    scored = (
        pos.join(F.broadcast(centroids), "d")
        .groupBy("vec_id", "c_label")
        .agg(F.sum((F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))).alias("dist2"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("dist2"), F.asc("c_label"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", F.col("c_label").alias("assigned_label"), F.round("dist2", 4).alias("dist2_r"))
    )


@query(
    "ann_multiprobe_topk",
    oracle=f"""
    WITH b AS (
        SELECT vec_id, label, embedding,
               {_duckdb_bucket_expr('embedding')} AS bucket
        FROM embeddings
    ),
    probe AS (
        SELECT embedding AS q,
               unnest([bucket, {", ".join(f"xor(bucket, {1 << i})" for i in range(N_PLANES))}])
                   AS pbucket
        FROM b WHERE vec_id = {QUERY_VEC_ID}
    )
    SELECT b.vec_id AS vec_id, b.label AS label,
           round({duckdb_cosine('b.embedding', 'probe.q')}, 4) AS cos_sim
    FROM b JOIN probe ON b.bucket = probe.pbucket
    WHERE b.vec_id <> {QUERY_VEC_ID}
    ORDER BY cos_sim DESC, vec_id
    LIMIT {TOP_K}
    """,
)
def ann_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH top-k: scan the probe's bucket plus every bucket at
    Hamming distance 1 (flip each plane bit) — the standard recall/scan-cost
    dial (Lv et al., multi-probe LSH). Buckets partition the table, so the
    7-bucket probe reads 7/2^{N_PLANES} of the data and candidates cannot
    duplicate; the probe side explodes to 7 rows and broadcasts."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("v")
    )
    bucketed = emb.withColumn("bucket", lsh_bucket_col(F.col("v"), default_planes()))
    probes = bucketed.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("q"),
        F.explode(
            F.array(
                F.col("bucket"),
                *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(N_PLANES)],
            )
        ).alias("pbucket"),
    )
    return (
        bucketed.join(
            F.broadcast(probes),
            (F.col("bucket") == F.col("pbucket")) & (F.col("vec_id") != QUERY_VEC_ID),
        )
        .select("vec_id", "label", F.round(cosine(F.col("v"), F.col("q")), 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(TOP_K)
    )
