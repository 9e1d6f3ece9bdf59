"""Persisted ANN index: embeddings written PARTITIONED BY hyperplane bucket,
probed with static partition pruning.

This materializes the scale posture the ad-hoc `ann_lsh_topk` query can only
assert: once the table is laid out as .../bucket=NN/*.parquet, a probe
computes its bucket DRIVER-SIDE (functions/vectors.lsh_bucket_py — the
hyperplanes are deterministic, no Spark pass needed) and the scan's
PartitionFilters prune to 1/2^n_planes of the data before a single row is
read. Multi-probe (flipping signature bits) widens recall while still
touching only the probed directories.

    build_ann_index(emb_df, "/data/ann_index")           # once, full shuffle-free write
    ann_probe_topk(spark, "/data/ann_index", qvec, k=10) # per query: pruned scan + TakeOrdered

At 100 TB: the index write is a single pass (bucket is a pure expression —
no shuffle unless repartitioning for file sizing); each probe reads one (or
1+n_flip) of 2^n_planes partitions, scores cosine inside codegen, and
top-k's via TakeOrderedAndProject — no global sort, nothing driver-side but
the k results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamds_spark.functions.vectors import (
    as_double,
    cosine,
    hyperplanes,
    lsh_bucket_col,
    lsh_bucket_py,
)

DEFAULT_N_PLANES = 6


def build_ann_index(
    emb: DataFrame,
    path: str,
    n_planes: int = DEFAULT_N_PLANES,
    vec_col: str = "embedding",
) -> None:
    """Write the embedding table partitioned by hyperplane bucket.

    The bucket is a pure expression over the vector column, so the write is a
    single scan→write pass. partitionBy (directory layout) rather than
    bucketBy: ANN probes are equality filters on the bucket, which directory
    partitioning turns into static pruning visible as PartitionFilters in the
    scan — and the layout is engine-agnostic (any parquet reader sees it).
    """
    dim = len(emb.select(vec_col).first()[0])
    planes = hyperplanes(n_planes, dim)
    (
        emb.withColumn("v", as_double(F.col(vec_col)))
        .withColumn("bucket", lsh_bucket_col(F.col("v"), planes))
        .drop(vec_col)
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )
    # sidecar meta (SIBLING file — a stray JSON inside the dataset dir would
    # confuse partition discovery) so probes/servers recover the build params
    import json as _json

    with open(index_meta_path(path), "w") as f:
        _json.dump({"n_planes": n_planes, "dim": dim}, f)


def index_meta_path(index_path: str) -> str:
    return index_path.rstrip("/") + "._meta.json"


def load_index_meta(index_path: str) -> dict:
    """{'n_planes': N, 'dim': D} written at build time."""
    import json as _json

    with open(index_meta_path(index_path)) as f:
        return _json.load(f)


def probe_buckets(
    qvec: list[float], n_planes: int = DEFAULT_N_PLANES, n_flip_bits: int = 0
) -> list[int]:
    """Buckets a probe should read: its own signature plus (optionally) every
    signature within Hamming distance 1 on the first `n_flip_bits` bits —
    multi-probe LSH recalls near-misses that fell across one hyperplane."""
    planes = hyperplanes(n_planes, len(qvec))
    base = lsh_bucket_py(qvec, planes)
    out = [base]
    for i in range(min(n_flip_bits, n_planes)):
        out.append(base ^ (1 << i))
    return out


def ann_probe_topk(
    spark: SparkSession,
    index_path: str,
    qvec: list[float],
    k: int = 10,
    n_planes: int = DEFAULT_N_PLANES,
    n_flip_bits: int = 0,
) -> DataFrame:
    """Top-k by cosine against a persisted index, reading only the probe's
    bucket partitions (static pruning — the bucket ids are computed driver-side
    before the plan is built)."""
    buckets = probe_buckets(qvec, n_planes, n_flip_bits)
    q = F.array(*[F.lit(float(x)) for x in qvec])
    idx = spark.read.parquet(index_path).filter(F.col("bucket").isin(buckets))
    return (
        idx.select("vec_id", "label", F.round(cosine(F.col("v"), q), 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )
