"""SemDeDup (operators/semdedup.py): pure-Python parity on crafted clusters,
keep-rule semantics, custom-cluster path, and guards."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from streamds_spark.operators.semdedup import semdedup, sign_bucket_expr


def _py_semdedup(vecs: dict[int, list[float]], n_bits: int, thr: float):
    """Reference: sign buckets, within-bucket cosine >= thr (rounded to 4),
    drop the higher id of every qualifying pair."""
    def bucket(v):
        return sum(
            (1 << (n_bits - 1 - k)) for k in range(n_bits) if v[k] >= 0
        )

    def cos(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 4)

    buckets = {i: bucket(v) for i, v in vecs.items()}
    dropped = set()
    ids = sorted(vecs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            i, j = ids[x], ids[y]
            if buckets[i] == buckets[j] and cos(vecs[i], vecs[j]) >= thr:
                dropped.add(j)
    return buckets, dropped


@pytest.fixture(scope="module")
def crafted(spark):
    rng = np.random.default_rng(7)
    # components bounded away from 0 so a 0.01 perturbation can never flip
    # a sign bit (the near-dups must share their base's bucket)
    base1 = rng.uniform(0.2, 1.0, size=8) * rng.choice([-1.0, 1.0], size=8)
    base2 = rng.uniform(0.2, 1.0, size=8) * rng.choice([-1.0, 1.0], size=8)
    vecs = {
        # cluster A: three paraphrases of base1 (tiny perturbations) + one
        # genuinely different vector that shares the sign bucket
        0: base1,
        1: base1 + rng.normal(scale=0.01, size=8),
        2: base1 + rng.normal(scale=0.01, size=8),
        3: np.abs(rng.normal(size=8)) * np.sign(base1),  # same signs, low cos
        # cluster B: a pair of near-dups of base2
        10: base2,
        11: base2 + rng.normal(scale=0.01, size=8),
        # singleton
        20: rng.normal(size=8),
    }
    vecs = {i: [float(x) for x in v] for i, v in vecs.items()}
    df = spark.createDataFrame(
        [(i, v) for i, v in sorted(vecs.items())], "vec_id long, v array<double>"
    )
    return vecs, df


def test_matches_python_reference(spark, crafted):
    vecs, df = crafted
    buckets, dropped = _py_semdedup(vecs, n_bits=4, thr=0.95)
    rows = {r["vec_id"]: r for r in semdedup(df, n_sign_bits=4, threshold=0.95).collect()}
    assert set(rows) == set(vecs)
    for i, r in rows.items():
        assert r["cluster_id"] == buckets[i], i
        assert r["is_kept"] == (i not in dropped), i
    # the near-dup groups lost all but their min id
    assert not rows[1]["is_kept"] and not rows[2]["is_kept"]
    assert rows[0]["is_kept"]
    assert rows[10]["is_kept"] and not rows[11]["is_kept"]
    # the same-bucket-but-dissimilar vector survives
    assert rows[3]["is_kept"]
    assert rows[20]["is_kept"]


def test_custom_cluster_column(spark, crafted):
    """cluster_col: force EVERYTHING into one cluster — near-dups across
    sign buckets are then caught (the k-means-assignment path)."""
    vecs, df = crafted
    one = df.withColumn("c", F.lit(0))
    rows = {
        r["vec_id"]: r["is_kept"]
        for r in semdedup(one, threshold=0.95, cluster_col="c").collect()
    }
    # keep-min-id within the single cluster: 0 survives, 1/2/11 drop iff
    # cosine to a lower id >= thr — verify against the reference with 1 bucket
    def cos(a, b):
        a, b = np.asarray(a), np.asarray(b)
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 4)

    ids = sorted(vecs)
    want_drop = {
        j
        for x, i in enumerate(ids)
        for j in ids[x + 1 :]
        if cos(vecs[i], vecs[j]) >= 0.95
    }
    assert {i for i, k in rows.items() if not k} == want_drop


def test_threshold_monotonicity(spark, crafted):
    """Lowering the threshold can only drop MORE rows."""
    _, df = crafted
    kept_hi = {
        r["vec_id"]
        for r in semdedup(df, n_sign_bits=4, threshold=0.99).collect()
        if r["is_kept"]
    }
    kept_lo = {
        r["vec_id"]
        for r in semdedup(df, n_sign_bits=4, threshold=0.5).collect()
        if r["is_kept"]
    }
    assert kept_lo <= kept_hi


def test_guards(spark, crafted):
    _, df = crafted
    with pytest.raises(ValueError, match="threshold"):
        semdedup(df, threshold=0.0)
    with pytest.raises(ValueError, match="n_bits"):
        sign_bucket_expr("v", 0)
    with pytest.raises(ValueError, match="reserved"):
        semdedup(df.withColumn("cluster_id", F.lit(1)))
