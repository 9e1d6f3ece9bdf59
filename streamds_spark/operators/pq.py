"""Product quantization (PQ) for embedding compression + ADC ANN probes.

Complements the ANN family (`operators/ann.py` hyperplane LSH, `operators/ivf.py`
IVF lists): PQ slices each d-dim vector into `m` subvectors, learns a tiny
k-means codebook PER subspace, and stores each vector as `m` small codes
(m·log2(k) bits instead of d·32. 64-dim float → 8 bytes at m=8, k=256: 32×).
Probes never decompress: an Asymmetric Distance Computation (ADC) lookup table
is built on the driver from the query vector (m·k floats), broadcast as a
literal, and the scan scores each row with a codegen'd table lookup — no UDF,
no vector arithmetic per row.

Scale posture (the reason PQ exists at 100 TB):
  * training touches the driver only through the m·k·(d/m) = k·d codebook
    floats per iteration (same contract as operators/kmeans — vectors are
    never collected);
  * the codes table is ~d·32/(m·log2 k) times smaller than raw vectors, so an
    exhaustive ADC scan reads GBs where brute force reads TBs; compose with
    IVF (store codes partitioned by coarse list) for IVF-PQ, where a probe
    reads n_probe/n_lists of the compressed table;
  * encode/probe are single-pass map-only plans (one TakeOrdered for top-k).

Reference scope: the reference engine (StreamDS, Go) has no vector surface at
all — this operator family is part of the added LLM-data layer (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamds_spark.functions.vectors import as_double


def train_pq(
    vectors: DataFrame,
    m: int = 8,
    k: int = 16,
    dim: int | None = None,
    max_iter: int = 5,
    tol: float = 1e-6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Learn PQ codebooks: returns codebooks[sub][cid] = centroid (len d/m).

    Lloyd's per subspace, all subspaces trained jointly in shared jobs: assign
    is one broadcast join + partial agg, update one agg — per iteration the
    driver sees exactly k·dim floats. Deterministic init (subvectors of the
    first k vectors by id) for reproducibility; at 100 TB swap for a sampled
    k-means|| init, same loop.
    """
    if dim is None:
        dim = len(vectors.select(as_double(F.col(vec_col)).alias("v")).first()["v"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub_d = dim // m
    spark = vectors.sparkSession

    pos = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(as_double(F.col(vec_col))).alias("pos", "x"),
    ).select(
        "vec_id",
        (F.col("pos") / sub_d).cast("int").alias("sub"),
        (F.col("pos") % sub_d).cast("int").alias("d"),
        "x",
    )

    first_k = (
        vectors.orderBy(id_col)
        .limit(k)
        .select(F.col(id_col), F.posexplode(as_double(F.col(vec_col))).alias("pos", "x"))
        .collect()
    )
    ids = sorted({r[0] for r in first_k})
    cid_of = {v: i for i, v in enumerate(ids)}
    # cents[(sub, cid, d)] = coordinate
    cents: dict[tuple[int, int, int], float] = {
        (r["pos"] // sub_d, cid_of[r[0]], r["pos"] % sub_d): r["x"] for r in first_k
    }
    rows = [(s, c, d, cents[(s, c, d)]) for s in range(m) for c in range(k) for d in range(sub_d)]

    for _ in range(max_iter):
        centroids = spark.createDataFrame(rows, ["sub", "cid", "d", "cx"])
        scored = (
            pos.join(F.broadcast(centroids), ["sub", "d"])
            .groupBy("vec_id", "sub", "cid")
            .agg(F.sum((F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))).alias("dist2"))
        )
        best = scored.groupBy("vec_id", "sub").agg(
            F.min_by("cid", F.struct(F.col("dist2"), F.col("cid"))).alias("cid")
        )
        new_rows = (
            pos.join(best, ["vec_id", "sub"])
            .groupBy("sub", "cid", "d")
            .agg(F.avg("x").alias("cx"))
            .collect()
        )
        new_map = {(r["sub"], r["cid"], r["d"]): r["cx"] for r in new_rows}
        movement = max(
            abs(new_map.get(key, cents[key]) - cents[key]) for key in cents
        )
        cents = {**cents, **new_map}  # empty clusters keep their old centroid
        rows = [(s, c, d, cents[(s, c, d)]) for s in range(m) for c in range(k) for d in range(sub_d)]
        if movement < tol:
            break

    return [
        [[cents[(s, c, d)] for d in range(sub_d)] for c in range(k)] for s in range(m)
    ]


def _codebook_lit(codebooks: list[list[list[float]]]):
    """Literal array<array<array<double>>> column: codebooks[sub][cid][d]."""
    return F.array(
        *[
            F.array(*[F.array(*[F.lit(float(x)) for x in cent]) for cent in book])
            for book in codebooks
        ]
    )


def encode_pq(
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes array<int>): nearest codebook entry per subspace.

    Single map-only plan: the codebook literal ships with the task binary;
    per row it's m·k·(d/m) = k·d multiply-adds inside codegen
    (transform/zip_with/aggregate expressions), no shuffle, no UDF.
    """
    return vectors.select(
        F.col(id_col).alias("vec_id"),
        encode_pq_expr(codebooks, as_double(F.col(vec_col))).alias("codes"),
    )


def encode_pq_expr(codebooks: list[list[list[float]]], vec_col):
    """Codes expression over `vec_col` (array<double>) for the given
    codebooks — usable in any select. Pure Catalyst expressions.

    codes[s] = argmin_cid Σ_d (vec[s·sub_d + d] − codebook[s][cid][d])²;
    ties break to the lowest cid (array_position finds the first minimum),
    matching the training assignment's min_by(cid) tie-break."""
    m = len(codebooks)
    sub_d = len(codebooks[0][0])
    cb = _codebook_lit(codebooks)

    def best_code(s):
        sub = F.slice(vec_col, s * sub_d + 1, sub_d)
        book = cb[s]
        # scored[cid] = squared L2 between sub and book[cid]
        scored = F.transform(
            book,
            lambda cent: F.aggregate(
                F.zip_with(sub, cent, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        return F.array_position(scored, F.array_min(scored)).cast("int") - 1

    return F.array(*[best_code(s) for s in range(m)])


def adc_topk(
    codes_df: DataFrame,
    codebooks: list[list[list[float]]],
    qvec: list[float],
    topk: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by Asymmetric Distance Computation: exact L2 from the query to
    each vector's RECONSTRUCTION, via an m×k lookup table built driver-side.

    Per row the score is m literal-array lookups + m-1 adds (zip_with over the
    codes array) — the compressed table streams through codegen and a single
    TakeOrderedAndProject returns k rows. No join, no shuffle, no UDF.
    """
    m = len(codebooks)
    sub_d = len(codebooks[0][0])
    lut = [
        [
            sum(
                (float(qvec[s * sub_d + d]) - codebooks[s][c][d]) ** 2
                for d in range(sub_d)
            )
            for c in range(len(codebooks[s]))
        ]
        for s in range(m)
    ]
    lut_lit = F.array(
        *[F.array(*[F.lit(x) for x in row]) for row in lut]
    )
    dist = F.aggregate(
        F.zip_with(F.col("codes"), lut_lit, lambda c, row: F.element_at(row, c + 1)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        codes_df.select(F.col(id_col), dist.alias("adc_dist2"))
        .orderBy(F.asc("adc_dist2"), F.asc(id_col))
        .limit(topk)
    )


# ---------------------------------------------------------------------------
# IVF-PQ: the 100 TB composition — coarse k-means lists prune the scan,
# PQ codes shrink what's read. A probe touches n_probe/n_lists of a table
# that is itself ~32× smaller than the raw vectors.
# ---------------------------------------------------------------------------


def build_ivfpq_index(
    emb: DataFrame,
    path: str,
    n_lists: int = 8,
    m: int = 8,
    k_codes: int = 16,
    max_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Train coarse quantizer + PQ codebooks on the RESIDUALS-free layout
    (codes over raw vectors — simpler and adequate at moderate n_lists), write
    codes `partitionBy(list_id)`, persist both codebooks as JSON.

    Build is the amortized-once cost; the probe path never reads raw vectors.
    """
    import json
    import os

    from streamds_spark.operators.kmeans import kmeans

    assign, coarse = kmeans(emb, k=n_lists, max_iter=max_iter, id_col=id_col, vec_col=vec_col)
    books = train_pq(emb, m=m, k=k_codes, max_iter=max_iter, id_col=id_col, vec_col=vec_col)
    codes = encode_pq(emb, books, id_col=id_col, vec_col=vec_col)
    # kmeans and encode_pq both normalize the caller's id_col to `vec_id`,
    # so every downstream join is on `vec_id` regardless of id_col
    listed = assign.withColumnRenamed("cid", "list_id")
    (
        codes.join(listed, "vec_id")
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(os.path.join(path, "codes"))
    )
    # raw vectors, same partitioning: read ONLY for exact rerank of the ADC
    # shortlist (a pushed-down id lookup over the probed lists — shortlist-
    # sized IO, never a full scan)
    (
        emb.select(F.col(id_col).alias("vec_id"), as_double(F.col(vec_col)).alias("v"))
        .join(listed, "vec_id")
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(os.path.join(path, "vectors"))
    )
    with open(os.path.join(path, "quantizers.json"), "w") as f:
        json.dump({"coarse": coarse, "pq": books}, f)


def append_ivfpq_batch(
    new_emb: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Ingest a NEW vector batch into an existing IVF-PQ index WITHOUT
    retraining: assign each vector to its nearest coarse list and encode with
    the persisted codebooks (both broadcast literals — map-only except the
    k-list argmin, also expression-level), then APPEND to the partitioned
    codes and vectors tables. Probes see the new rows immediately (fresh
    directory listing per read; on a table format this is a transactional
    append).

    The standard index-maintenance contract: quantizers drift only if the
    data distribution does — monitor recall (ivf_recall_at_k style) and
    retrain offline when it degrades; appends stay cheap and constant-time
    per batch, exactly like the dedup bucket store
    (operators/dedup_incremental.py)."""
    import json
    import os

    with open(os.path.join(path, "quantizers.json")) as f:
        q = json.load(f)
    coarse, books = q["coarse"], q["pq"]
    v = as_double(F.col(vec_col))
    # nearest coarse centroid: squared-L2 against each centroid literal
    dists = F.array(
        *[
            F.aggregate(
                F.zip_with(v, F.array(*[F.lit(float(x)) for x in cent]), lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for cent in coarse
        ]
    )
    list_id = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    base = new_emb.select(
        F.col(id_col).alias("vec_id"), v.alias("v"), list_id.alias("list_id")
    )
    (
        base.select(
            "vec_id", encode_pq_expr(books, F.col("v")).alias("codes"), "list_id"
        )
        .write.mode("append")
        .partitionBy("list_id")
        .parquet(os.path.join(path, "codes"))
    )
    base.write.mode("append").partitionBy("list_id").parquet(
        os.path.join(path, "vectors")
    )


def ivfpq_probe_topk(
    spark,
    path: str,
    qvec: list[float],
    topk: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """ADC top-k over only the probed coarse lists: the scan carries a static
    `list_id IN (...)` partition prune (PartitionFilters, verified by test),
    then the ADC lookup scores codes in codegen and TakeOrdered merges k rows.
    """
    import json
    import os

    from streamds_spark.operators.ivf import nearest_lists

    with open(os.path.join(path, "quantizers.json")) as f:
        q = json.load(f)
    lists = nearest_lists(qvec, q["coarse"], n_probe)
    codes = spark.read.parquet(os.path.join(path, "codes")).filter(
        F.col("list_id").isin(lists)
    )
    return adc_topk(codes, q["pq"], qvec, topk=topk)


def ivfpq_probe_topk_reranked(
    spark,
    path: str,
    qvec: list[float],
    topk: int = 10,
    n_probe: int = 2,
    shortlist: int = 4,
) -> DataFrame:
    """IVF-PQ probe with EXACT rerank: ADC ranks a `shortlist·topk` candidate
    set from the compressed codes, then only those ids' raw vectors are read
    back (id + list_id pushdown on the vectors table) and scored with exact
    L2. Recall is then bounded by shortlist membership, not by quantization
    error — the standard production PQ configuration.

    Driver traffic: the shortlist id list (shortlist·topk longs). IO: the
    probed lists' codes + shortlist-sized raw-vector lookups."""
    import json
    import os

    from streamds_spark.operators.ivf import nearest_lists

    with open(os.path.join(path, "quantizers.json")) as f:
        q = json.load(f)
    lists = nearest_lists(qvec, q["coarse"], n_probe)
    codes = spark.read.parquet(os.path.join(path, "codes")).filter(
        F.col("list_id").isin(lists)
    )
    cand_ids = [
        r["vec_id"]
        for r in adc_topk(codes, q["pq"], qvec, topk=shortlist * topk).collect()
    ]
    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    exact = F.aggregate(
        F.zip_with(F.col("v"), qlit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        spark.read.parquet(os.path.join(path, "vectors"))
        .filter(F.col("list_id").isin(lists) & F.col("vec_id").isin(cand_ids))
        .select("vec_id", exact.alias("dist2"))
        .orderBy(F.asc("dist2"), F.asc("vec_id"))
        .limit(topk)
    )
