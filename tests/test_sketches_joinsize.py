"""CMS join-size estimation: the never-underestimate guarantee in the
collision regime (key domain >> sketch width), the exact-equality regime
(tiny domain), and pure-Python inner-product parity."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from streamds_spark.queries.llmdata.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    build_cms,
    cms_join_size_estimate,
)

SF = "/root/testdata/sf0.001"


def _py_cell(key, j):
    h = hashlib.md5(f"cms{j}:{key}".encode()).hexdigest()
    return int(h[:15], 16) % CMS_WIDTH


def _py_cms(freqs):
    cms = [[0] * CMS_WIDTH for _ in range(CMS_DEPTH)]
    for k, c in freqs.items():
        for j in range(CMS_DEPTH):
            cms[j][_py_cell(k, j)] += c
    return cms


def test_registered_query_guarantee_and_regime(spark):
    rows = {r["pair"]: r for r in cms_join_size_estimate(spark, SF).collect()}
    assert set(rows) == {"events_selfjoin", "events_x_purchases"}
    for r in rows.values():
        assert r["est_rows"] >= r["exact_rows"]  # CMS never underestimates
        assert r["over_ratio_r"] >= 1.0
    # 150 users vs 512 cells x 4 rows: collision-free -> exact recovery
    assert rows["events_selfjoin"]["over_ratio_r"] == 1.0


def test_collision_regime_bounded_overestimate(spark):
    """5000 distinct keys >> 512 cells: collisions force est > exact, but the
    CMS bound holds: est <= exact + eps*N^2 with eps = e/width (loose union
    bound; we assert the much tighter empirical 2x)."""
    n = 5000
    df = spark.range(n).select(F.col("id").alias("term"), F.lit(1).alias("c"))
    freqs = {i: 1 for i in range(n)}
    cms = build_cms(df)
    got = {(r["j"], r["cell"]): r["cellsum"] for r in cms.collect()}
    ref = _py_cms(freqs)
    # sketch parity cell-for-cell vs pure Python
    for (j, cell), cs in got.items():
        assert ref[j][cell] == cs
    est = min(sum(v * v for v in row) for row in ref)
    exact = sum(c * c for c in freqs.values())  # = n
    assert est >= exact
    assert est <= 2 * (exact + (n * n) / CMS_WIDTH)  # far inside the bound
    # and the Spark-side inner product agrees with the Python one
    spark_est = (
        cms.groupBy("j")
        .agg(F.sum(F.col("cellsum") * F.col("cellsum")).alias("s"))
        .agg(F.min("s").alias("est"))
        .first()["est"]
    )
    assert spark_est == est
