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


@query(
    "cluster_quality_metrics",
    oracle="""
    WITH pos AS (
        SELECT vec_id, label,
               unnest(embedding::DOUBLE[]) AS x,
               unnest(range(1, len(embedding) + 1)) AS d
        FROM embeddings
    ),
    cent AS (SELECT label, d, avg(x) AS cx FROM pos GROUP BY label, d),
    gm AS (SELECT d, avg(x) AS gx FROM pos GROUP BY d),
    pv AS (
        SELECT p.vec_id, p.label, sum((p.x - c.cx) * (p.x - c.cx)) AS dist2
        FROM pos p JOIN cent c ON p.label = c.label AND p.d = c.d
        GROUP BY p.vec_id, p.label
    ),
    pc AS (
        SELECT label, count(*) AS n_vecs, sum(dist2) AS wss,
               avg(sqrt(dist2)) AS s
        FROM pv GROUP BY label
    ),
    bssl AS (
        SELECT c.label, sum((c.cx - g.gx) * (c.cx - g.gx)) AS cdist2
        FROM cent c JOIN gm g ON c.d = g.d GROUP BY c.label
    ),
    tot AS (
        SELECT sum(pc.n_vecs) AS n, count(*) AS k, sum(pc.wss) AS wss_tot,
               sum(pc.n_vecs * b.cdist2) AS bss
        FROM pc JOIN bssl b ON pc.label = b.label
    ),
    dij AS (
        SELECT ci.label AS i, cj.label AS j,
               sqrt(sum((ci.cx - cj.cx) * (ci.cx - cj.cx))) AS dist
        FROM cent ci JOIN cent cj ON ci.d = cj.d AND ci.label <> cj.label
        GROUP BY ci.label, cj.label
    ),
    db AS (
        SELECT d.i AS label, max((si.s + sj.s) / d.dist) AS db_i
        FROM dij d
        JOIN pc si ON si.label = d.i
        JOIN pc sj ON sj.label = d.j
        GROUP BY d.i
    )
    SELECT pc.label AS label, pc.n_vecs AS n_vecs,
           round(pc.wss, 4) + 0.0 AS wss_r,
           round(pc.s, 4) + 0.0 AS scatter_r,
           round(db.db_i, 4) + 0.0 AS db_i_r,
           round((tot.bss / (tot.k - 1)) / (tot.wss_tot / (tot.n - tot.k)), 4)
               + 0.0 AS ch_r,
           round((SELECT avg(db_i) FROM db), 4) + 0.0 AS db_r
    FROM pc JOIN db ON pc.label = db.label CROSS JOIN tot
    """,
)
def cluster_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-quality report for a labeled embedding table — the eval the
    k-means / SemDeDup stack needs before trusting its clusters: per-cluster
    size, within-cluster sum of squares (WSS), mean member-to-centroid
    distance (scatter s_i), the per-cluster Davies-Bouldin component
    max_j (s_i+s_j)/d_ij, plus the two corpus-level indices repeated on every
    row: Calinski-Harabasz (BSS/(k-1))/(WSS/(n-k)) and Davies-Bouldin
    avg_i(db_i).

    Plan shape at 100 TB: ONE pass over the exploded vectors builds the
    centroid table (k x dim rows — partial aggregates map-side), one
    centroid-broadcast join computes every vector's distance to its own
    centroid (shuffle keyed on vec_id), and everything after that is
    k-sized: k x k centroid-pair distances, k-row aggregates, a 1-row
    totals relation cross-joined back. No global window, no all-pairs over
    vectors — the only O(n) stages are the two scans the math forces."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("v")
    )
    pos = emb.select(
        "vec_id", "label", F.posexplode(F.col("v")).alias("d0", "x")
    ).withColumn("d", F.col("d0") + 1)
    # pos feeds three branches (centroids, global mean, per-vector dists) —
    # share the exploded scan instead of recomputing it
    pos = pos.localCheckpoint(eager=False)
    cent = pos.groupBy("label", "d").agg(F.avg("x").alias("cx"))
    cent = cent.localCheckpoint(eager=False)  # k*dim rows, feeds 3 branches
    gm = pos.groupBy("d").agg(F.avg("x").alias("gx"))
    pv = (
        pos.join(F.broadcast(cent), ["label", "d"])
        .groupBy("vec_id", "label")
        .agg(F.sum((F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))).alias("dist2"))
    )
    pc = pv.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.sum("dist2").alias("wss"),
        F.avg(F.sqrt("dist2")).alias("s"),
    )
    pc = pc.localCheckpoint(eager=False)  # k rows, feeds 4 branches
    bssl = (
        cent.join(F.broadcast(gm), "d")
        .groupBy("label")
        .agg(F.sum((F.col("cx") - F.col("gx")) * (F.col("cx") - F.col("gx"))).alias("cdist2"))
    )
    tot = (
        pc.join(F.broadcast(bssl), "label")
        .agg(
            F.sum("n_vecs").alias("n"),
            F.count("*").alias("k"),
            F.sum("wss").alias("wss_tot"),
            F.sum(F.col("n_vecs") * F.col("cdist2")).alias("bss"),
        )
    )
    ci = cent.select(F.col("label").alias("i"), "d", F.col("cx").alias("cxi"))
    cj = cent.select(F.col("label").alias("j"), "d", F.col("cx").alias("cxj"))
    dij = (
        ci.join(F.broadcast(cj), "d")
        .filter(F.col("i") != F.col("j"))
        .groupBy("i", "j")
        .agg(F.sqrt(F.sum((F.col("cxi") - F.col("cxj")) * (F.col("cxi") - F.col("cxj")))).alias("dist"))
    )
    si = pc.select(F.col("label").alias("i"), F.col("s").alias("s_i"))
    sj = pc.select(F.col("label").alias("j"), F.col("s").alias("s_j"))
    db = (
        dij.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .groupBy(F.col("i").alias("label"))
        .agg(F.max((F.col("s_i") + F.col("s_j")) / F.col("dist")).alias("db_i"))
    )
    db = db.localCheckpoint(eager=False)  # k rows, feeds the report + db avg
    db_avg = db.agg(F.avg("db_i").alias("db_avg"))
    return (
        pc.join(db, "label")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(db_avg))
        .select(
            "label",
            "n_vecs",
            (F.round("wss", 4) + F.lit(0.0)).alias("wss_r"),
            (F.round("s", 4) + F.lit(0.0)).alias("scatter_r"),
            (F.round("db_i", 4) + F.lit(0.0)).alias("db_i_r"),
            (
                F.round(
                    (F.col("bss") / (F.col("k") - 1))
                    / (F.col("wss_tot") / (F.col("n") - F.col("k"))),
                    4,
                )
                + F.lit(0.0)
            ).alias("ch_r"),
            (F.round("db_avg", 4) + F.lit(0.0)).alias("db_r"),
        )
    )


AUDIT_PROBES = 16  # probe vectors 0..15: enough probes for a stable recall count
AUDIT_K = 10


@query(
    "ann_recall_audit",
    oracle=f"""
    WITH b AS (
        SELECT vec_id, embedding,
               {_duckdb_bucket_expr('embedding')} AS bucket
        FROM embeddings
    ),
    probes AS (
        SELECT vec_id AS qid, embedding AS q, bucket AS qbucket
        FROM b WHERE vec_id < {AUDIT_PROBES}
    ),
    scored AS (
        SELECT p.qid, b.vec_id, b.bucket, p.qbucket,
               round({duckdb_cosine('b.embedding', 'p.q')}, 4) AS cs
        FROM b JOIN probes p ON b.vec_id <> p.qid
    ),
    bf AS (
        SELECT qid, vec_id FROM (
            SELECT qid, vec_id,
                   row_number() OVER (
                       PARTITION BY qid ORDER BY cs DESC, vec_id
                   ) AS rk
            FROM scored
        ) WHERE rk <= {AUDIT_K}
    ),
    lsh AS (
        SELECT qid, vec_id FROM (
            SELECT qid, vec_id,
                   row_number() OVER (
                       PARTITION BY qid ORDER BY cs DESC, vec_id
                   ) AS rk
            FROM scored WHERE bucket = qbucket
        ) WHERE rk <= {AUDIT_K}
    ),
    mp AS (
        SELECT qid, vec_id FROM (
            SELECT qid, vec_id,
                   row_number() OVER (
                       PARTITION BY qid ORDER BY cs DESC, vec_id
                   ) AS rk
            FROM scored
            WHERE xor(bucket, qbucket) = 0
               OR {" OR ".join(f"xor(bucket, qbucket) = {1 << i}" for i in range(N_PLANES))}
        ) WHERE rk <= {AUDIT_K}
    ),
    methods(method) AS (VALUES ('lsh'), ('multiprobe'))
    SELECT m.method,
           CAST({AUDIT_PROBES} AS BIGINT) AS n_probes,
           CAST({AUDIT_K} AS BIGINT) AS k,
           CAST((SELECT count(*) FROM bf) AS BIGINT) AS n_exact,
           CAST(COALESCE(CASE m.method
               WHEN 'lsh' THEN (SELECT count(*) FROM bf JOIN lsh
                                USING (qid, vec_id))
               ELSE (SELECT count(*) FROM bf JOIN mp USING (qid, vec_id))
           END, 0) AS BIGINT) AS n_hit
    FROM methods m
    ORDER BY method
    """,
)
def ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall evidence behind the ANN tiers (round 11, the estimator-audit
    discipline): for 16 probe vectors, the single-bucket LSH scan and the
    Hamming-1 multi-probe scan are graded against the exact brute-force
    cosine top-10 — n_hit = how many of the exact top-k each
    method's own top-k recovered, summed over probes. All integers, so the
    row is hash-exact; the recall ratio (and multi-probe's recovery of
    single-bucket misses, Lv et al.'s whole argument) is read from
    n_hit / n_exact per method in BASELINE.md. Plan: ONE broadcast of the
    16 probes against the bucketed scan scores every (probe, candidate)
    pair once; the three top-k's are qid-PARTITIONED windows over that one
    scored relation (never a global window); the hit counts are two tiny
    joins of <= n_probes x k rows."""
    from pyspark.sql import Window

    # spread=True (guide §2.2): the 16-probe × corpus cosine scoring is pure
    # row-local math riding a SINGLE-SPLIT scan; every derived value (cs is
    # per-row and rounded, top-k windows are qid-keyed, metrics are integer
    # counts) is partitioning-invariant, so the spread is value-identical
    emb = load_table(spark, sf_dir, "embeddings", spread=True).select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    bucketed = emb.withColumn(
        "bucket", lsh_bucket_col(F.col("v"), default_planes())
    )
    probes = bucketed.filter(F.col("vec_id") < AUDIT_PROBES).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("q"),
        F.col("bucket").alias("qbucket"),
    )
    scored = (
        bucketed.join(F.broadcast(probes), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            "bucket",
            "qbucket",
            F.round(cosine(F.col("v"), F.col("q")), 4).alias("cs"),
        )
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cs"), F.asc("vec_id"))

    def topk(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= AUDIT_K)
            .select("qid", "vec_id")
        )

    bf = topk(scored)
    lsh = topk(scored.where(F.col("bucket") == F.col("qbucket")))
    hamming1 = F.col("bucket").bitwiseXOR(F.col("qbucket"))
    mp = topk(
        scored.where(
            (hamming1 == 0)
            | hamming1.isin([1 << i for i in range(N_PLANES)])
        )
    )
    n_exact = bf.count()
    rows = [
        ("lsh", AUDIT_PROBES, AUDIT_K, n_exact, bf.join(lsh, ["qid", "vec_id"]).count()),
        ("multiprobe", AUDIT_PROBES, AUDIT_K, n_exact, bf.join(mp, ["qid", "vec_id"]).count()),
    ]
    return spark.createDataFrame(
        rows,
        "method string, n_probes bigint, k bigint, n_exact bigint, n_hit bigint",
    )
