"""PCA/whitening (operators/pca.py): the partition-partial Gram reduction must
reproduce numpy's exact covariance, and whitening must actually whiten."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.operators.pca import covariance_stats, pca, project

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    rows = (
        load_table(spark, SF, "embeddings").orderBy("vec_id").select("vec_id", "embedding").collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    vecs = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, vecs


def test_covariance_matches_numpy(spark, emb):
    ids, vecs = emb
    n, mean, cov = covariance_stats(load_table(spark, SF, "embeddings"))
    assert n == len(vecs)
    np.testing.assert_allclose(mean, vecs.mean(axis=0), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(cov, np.cov(vecs, rowvar=False, bias=True), rtol=1e-8, atol=1e-12)


def test_pca_spectrum_matches_numpy(spark, emb):
    ids, vecs = emb
    res = pca(load_table(spark, SF, "embeddings"))
    ref = np.linalg.eigvalsh(np.cov(vecs, rowvar=False, bias=True))[::-1]
    np.testing.assert_allclose(res["eigvals"], ref, rtol=1e-8, atol=1e-12)
    assert abs(res["explained_variance_ratio"].sum() - 1.0) < 1e-9
    # components are orthonormal
    c = res["components"]
    np.testing.assert_allclose(c @ c.T, np.eye(len(c)), atol=1e-9)


def test_projection_matches_numpy(spark, emb):
    ids, vecs = emb
    res = pca(load_table(spark, SF, "embeddings"), n_components=8)
    got = {
        r["vec_id"]: np.array(r["projected"])
        for r in project(
            load_table(spark, SF, "embeddings"), res["mean"], res["components"]
        ).collect()
    }
    ref = (vecs - res["mean"]) @ res["components"].T
    for i, vid in enumerate(ids):
        np.testing.assert_allclose(got[vid], ref[i], rtol=1e-9, atol=1e-12)


def test_whitening_whitens(spark, emb):
    """Covariance of the whitened projection must be the identity (up to eps
    regularization) — the property whitening exists for."""
    ids, vecs = emb
    res = pca(load_table(spark, SF, "embeddings"), n_components=16)
    whitened = project(
        load_table(spark, SF, "embeddings"),
        res["mean"],
        res["components"],
        whiten_eigvals=res["eigvals"],
        out_col="embedding",
    )
    n, mean, cov = covariance_stats(whitened)
    np.testing.assert_allclose(mean, np.zeros(16), atol=1e-9)
    np.testing.assert_allclose(cov, np.eye(16), atol=1e-6)

def test_pca_truncated_ratio_uses_full_spectrum(spark, emb):
    """n_components must not change the ratio denominator (ADVICE r3: it was
    None when truncated; a truncated ratio must be the fraction of TOTAL
    variance, summing to < 1)."""
    full = pca(load_table(spark, SF, "embeddings"))
    k = 4
    trunc = pca(load_table(spark, SF, "embeddings"), n_components=k)
    assert trunc["explained_variance_ratio"] is not None
    np.testing.assert_allclose(
        trunc["explained_variance_ratio"], full["explained_variance_ratio"][:k],
        rtol=1e-12,
    )
    assert 0.0 < trunc["explained_variance_ratio"].sum() < 1.0
