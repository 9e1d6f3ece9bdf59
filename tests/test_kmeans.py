"""Iterative k-means: convergence and cluster recovery on separable data."""

from __future__ import annotations

import random

from pyspark.sql.types import ArrayType, FloatType, IntegerType, StructField, StructType

from streamds_spark.operators.kmeans import kmeans


def test_kmeans_recovers_separated_clusters(spark):
    rng = random.Random(3)
    centers = [[5.0 * c + 1.0 for _ in range(8)] for c in range(3)]
    rows = []
    for i in range(90):
        c = i % 3
        rows.append((i, [float(x + rng.gauss(0, 0.1)) for x in centers[c]]))
    schema = StructType(
        [StructField("vec_id", IntegerType()), StructField("embedding", ArrayType(FloatType()))]
    )
    vectors = spark.createDataFrame(rows, schema)
    assign, cents = kmeans(vectors, k=3, max_iter=8)
    got = {r["vec_id"]: r["cid"] for r in assign.collect()}
    # cluster labels are arbitrary — check co-membership instead
    by_true = {c: {i for i in range(90) if i % 3 == c} for c in range(3)}
    for true_c, members in by_true.items():
        cids = {got[i] for i in members}
        assert len(cids) == 1, f"true cluster {true_c} split across {cids}"
    assert len({next(iter({got[i] for i in m})) for m in by_true.values()}) == 3
    assert len(cents) == 3 and len(cents[0]) == 8


def test_kmeans_converges_early_on_stable_data(spark):
    rows = [(i, [float(i % 2 * 10)] * 4) for i in range(20)]
    schema = StructType(
        [StructField("vec_id", IntegerType()), StructField("embedding", ArrayType(FloatType()))]
    )
    assign, cents = kmeans(spark.createDataFrame(rows, schema), k=2, max_iter=20)
    got = {r["vec_id"]: r["cid"] for r in assign.collect()}
    assert {got[i] for i in range(0, 20, 2)} != {got[i] for i in range(1, 20, 2)}
