"""IVF ANN index: build → partition-pruned probe → recall vs brute force."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.operators.ivf import (
    build_ivf_index,
    ivf_probe_topk,
    ivf_recall_at_k,
    load_centroids,
    nearest_lists,
)
from streamds_spark.plans.audit import formatted_plan

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf"))
    emb = load_table(spark, SF, "embeddings")
    centroids = build_ivf_index(emb, path, n_lists=8, max_iter=4)
    return path, emb, centroids


def test_ivf_build_partitions_by_list(spark, index):
    path, emb, centroids = index
    assert len(centroids) == 8
    idx = spark.read.parquet(f"{path}/data")
    assert idx.count() == emb.count()
    n_lists = idx.select("list_id").distinct().count()
    assert 2 <= n_lists <= 8  # all rows landed in real lists


def test_ivf_probe_prunes_and_ranks(spark, index):
    path, emb, _ = index
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    got = ivf_probe_topk(spark, path, qvec, k=5, n_probe=2)
    plan = formatted_plan(got)
    assert "PartitionFilters" in plan and "list_id" in plan.split("PartitionFilters", 1)[1][:250]
    rows = got.collect()
    assert rows[0]["vec_id"] == 0 and rows[0]["cos_sim"] == 1.0  # finds itself first
    assert len(rows) == 5
    # probed lists are a strict subset of the data
    lists = nearest_lists(qvec, load_centroids(path), 2)
    n_read = spark.read.parquet(f"{path}/data").filter(F.col("list_id").isin(lists)).count()
    assert n_read < emb.count()


def test_ivf_recall_beats_floor(spark, index):
    """Labeled-cluster embeddings (10 true clusters squeezed into 8 lists, so
    some lists blend clusters): probing 3 of 8 lists must recall ≥85% of the
    exact top-10. Measured: ~0.77/0.90/0.93 at n_probe 2/3/4 — the classic
    IVF recall-vs-scan-fraction dial."""
    path, emb, _ = index
    recall = ivf_recall_at_k(spark, path, emb, probe_ids=[0, 7, 23], k=10, n_probe=3)
    assert recall >= 0.85, recall
