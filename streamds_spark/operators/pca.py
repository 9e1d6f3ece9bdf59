"""Distributed PCA / whitening over an embedding column.

Covariance at scale: the naive formulation explodes each vector into d² pair
rows (n·d² rows through a shuffle — 4096× amplification at d=64, fatal at
100 TB). Here each PARTITION reduces its vectors to one partial statistic
(count, Σx, ΣxxT) with an Arrow-batched mapInPandas (numpy does the d×d Gram
per batch), so the shuffle moves `num_partitions` rows of d²+d+1 doubles —
independent of n. The driver finishes with an eigendecomposition of the d×d
covariance (microseconds for embedding-sized d).

Whitening/projection is a vectorized pandas_udf matmul (one BLAS call per
Arrow batch) — a d×k literal expression tree would blow past codegen limits at
d=64, and per-row Python is 100× slower; the Arrow batch path is the documented
fast lane for this shape.

Uses: decorrelating embeddings before SemDeDup/cosine thresholds, dimension
reduction ahead of IVF/PQ training (operators/ivf.py, operators/pq.py), and
embedding-drift diagnostics (explained-variance spectra per source).

No reference parity: the reference engine (Go) has no vector surface; this is
part of the added LLM-data layer (SURVEY.md §6).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamds_spark.functions.vectors import as_double


def covariance_stats(df: DataFrame, vec_col: str = "embedding") -> tuple[int, np.ndarray, np.ndarray]:
    """(n, mean[d], cov[d,d]) with one pass: partition-local (count, Σx, ΣxxT)
    partials via mapInPandas, reduced by a d²-sized aggregate — never an
    n·d²-row explode. Population covariance (divide by n), matching np.cov
    with bias=True."""
    src = df.select(as_double(F.col(vec_col)).alias("v"))

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cnt, s, g = 0, None, None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf["v"].tolist(), dtype=np.float64)
            cnt += len(x)
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            g = x.T @ x if g is None else g + x.T @ x
        if cnt:
            yield pd.DataFrame(
                {"cnt": [cnt], "s": [s.tolist()], "g": [g.reshape(-1).tolist()]}
            )

    part = src.mapInPandas(
        partials, schema="cnt long, s array<double>, g array<double>"
    )
    # reduce the ≤num_partitions partial rows to one (zip_with element sums)
    row = part.agg(
        F.sum("cnt").alias("cnt"),
        F.aggregate(
            F.collect_list("s"),
            F.expr("transform(first(s), x -> 0D)"),
            lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
        ).alias("s"),
        F.aggregate(
            F.collect_list("g"),
            F.expr("transform(first(g), x -> 0D)"),
            lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
        ).alias("g"),
    ).first()
    n = int(row["cnt"])
    s = np.array(row["s"])
    d = len(s)
    g = np.array(row["g"]).reshape(d, d)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    return n, mean, cov


def pca(
    df: DataFrame, n_components: int | None = None, vec_col: str = "embedding"
) -> dict:
    """Principal components of the embedding column.

    Returns {n, mean, eigvals (desc), components (rows = components),
    explained_variance_ratio} — all driver-side d-sized arrays; the data pass
    is covariance_stats' single scan. Component SIGN is fixed (largest-|coord|
    entry made positive) so results are deterministic across BLAS builds."""
    n, mean, cov = covariance_stats(df, vec_col)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1]
    eigvals = eigvals[order]
    comps = eigvecs[:, order].T
    for i in range(len(comps)):  # deterministic sign
        j = np.argmax(np.abs(comps[i]))
        if comps[i][j] < 0:
            comps[i] = -comps[i]
    # ratio denominator = FULL spectrum variance, computed before truncation —
    # kept components then report the fraction of total variance they explain
    total = max(np.sum(np.maximum(eigvals, 0.0)), 1e-300)
    if n_components is not None:
        eigvals, comps = eigvals[:n_components], comps[:n_components]
    ratio = np.maximum(eigvals, 0.0) / total
    return {
        "n": n,
        "mean": mean,
        "eigvals": eigvals,
        "components": comps,
        "explained_variance_ratio": ratio,
    }


def project(
    df: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    whiten_eigvals: np.ndarray | None = None,
    eps: float = 1e-9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "projected",
) -> DataFrame:
    """Project (and optionally whiten) every vector: out = W·(x − mean) with
    W = components (k×d), or diag(1/√(λ+eps))·components when whitening.
    One vectorized pandas_udf — a single BLAS matmul per Arrow batch."""
    from pyspark.sql.functions import pandas_udf

    w = np.asarray(components, dtype=np.float64)
    if whiten_eigvals is not None:
        w = w / np.sqrt(np.asarray(whiten_eigvals) + eps)[:, None]
    mu = np.asarray(mean, dtype=np.float64)

    @pandas_udf("array<double>")
    def proj(v: pd.Series) -> pd.Series:
        x = np.array(v.tolist(), dtype=np.float64)
        out = (x - mu) @ w.T
        return pd.Series(list(out))

    return df.select(
        F.col(id_col), proj(as_double(F.col(vec_col))).alias(out_col)
    )
