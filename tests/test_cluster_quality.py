"""cluster_quality_metrics: numpy reference parity on the real table plus
separation properties on synthetic clusters (well-separated clusters must
score a higher Calinski-Harabasz and a lower Davies-Bouldin than the same
points with extra noise)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql.types import ArrayType, FloatType, IntegerType, StructField, StructType

from streamds_spark.queries.llmdata.similarity import cluster_quality_metrics

SF = "/root/testdata/sf0.001"

SCHEMA = StructType(
    [
        StructField("vec_id", IntegerType()),
        StructField("label", IntegerType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def _np_metrics(ids, labels, vecs):
    """Pure-numpy reference: same definitions as the query docstring."""
    X = np.asarray(vecs, dtype=np.float64)
    y = np.asarray(labels)
    ks = sorted(set(y.tolist()))
    cent = {k: X[y == k].mean(axis=0) for k in ks}
    gm = X.mean(axis=0)
    n, k = len(X), len(ks)
    wss = {c: float(((X[y == c] - cent[c]) ** 2).sum()) for c in ks}
    s = {
        c: float(np.sqrt(((X[y == c] - cent[c]) ** 2).sum(axis=1)).mean())
        for c in ks
    }
    bss = sum((y == c).sum() * float(((cent[c] - gm) ** 2).sum()) for c in ks)
    ch = (bss / (k - 1)) / (sum(wss.values()) / (n - k))
    db_i = {}
    for i in ks:
        db_i[i] = max(
            (s[i] + s[j]) / float(np.linalg.norm(cent[i] - cent[j]))
            for j in ks
            if j != i
        )
    db = sum(db_i.values()) / k
    return {
        "n": {c: int((y == c).sum()) for c in ks},
        "wss": wss,
        "s": s,
        "db_i": db_i,
        "ch": ch,
        "db": db,
    }


def test_numpy_parity_on_real_table(spark):
    from streamds_spark.catalog import load_table

    rows = (
        load_table(spark, SF, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    ref = _np_metrics(
        [r.vec_id for r in rows],
        [r.label for r in rows],
        [r.embedding for r in rows],
    )
    got = {r["label"]: r for r in cluster_quality_metrics(spark, SF).collect()}
    assert set(got) == set(ref["wss"])
    for c, r in got.items():
        assert r["n_vecs"] == ref["n"][c]
        assert r["wss_r"] == pytest.approx(ref["wss"][c], abs=2e-4)
        assert r["scatter_r"] == pytest.approx(ref["s"][c], abs=2e-4)
        assert r["db_i_r"] == pytest.approx(ref["db_i"][c], abs=2e-4)
        assert r["ch_r"] == pytest.approx(ref["ch"], abs=2e-4)
        assert r["db_r"] == pytest.approx(ref["db"], abs=2e-4)


def _write_embeddings(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).write.mode("overwrite").parquet(
        f"{path}/embeddings.parquet"
    )


def _synthetic(sep, n_per=40, dim=16, seed=3):
    """Three Gaussian blobs whose centers sit `sep` apart per axis pair."""
    rng = np.random.default_rng(seed)
    rows = []
    for c in range(3):
        center = np.zeros(dim)
        center[c] = sep
        pts = center + rng.normal(0, 0.5, size=(n_per, dim))
        for i, p in enumerate(pts):
            rows.append((c * n_per + i, c, [float(x) for x in p]))
    return rows


def test_separation_moves_both_indices(spark, tmp_path):
    tight = str(tmp_path / "tight")
    loose = str(tmp_path / "loose")
    _write_embeddings(spark, tight, _synthetic(sep=8.0))
    _write_embeddings(spark, loose, _synthetic(sep=1.0))
    m_tight = cluster_quality_metrics(spark, tight).collect()[0]
    m_loose = cluster_quality_metrics(spark, loose).collect()[0]
    # well-separated blobs: higher Calinski-Harabasz, lower Davies-Bouldin
    assert m_tight["ch_r"] > m_loose["ch_r"] * 5
    assert m_tight["db_r"] < m_loose["db_r"] / 5
    # DB components are positive and the report carries one row per cluster
    assert m_tight["db_i_r"] > 0
    assert len(cluster_quality_metrics(spark, tight).collect()) == 3
