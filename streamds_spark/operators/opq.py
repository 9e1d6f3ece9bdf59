"""Optimized Product Quantization (parametric OPQ, Ge et al. CVPR 2013,
public method): rotate the embedding space before PQ so variance is BALANCED
across the m subspaces, which cuts quantization error at the same code
budget. The parametric ("OPQ-P") variant used here needs no alternating
optimization: take the PCA eigenbasis (operators/pca.py — one corpus pass)
and permute its components by EIGENVALUE ALLOCATION — greedily assign
components, largest eigenvalue first, to the subspace whose current variance
product is smallest — then use the permuted basis as the rotation R.

Why it lifts recall: plain PQ quantizes each contiguous d/m-dim slice with
the same number of codes; if one slice carries most of the variance (highly
anisotropic embeddings — the common case for learned embeddings), its
codebook is starved while others are wasted. R spreads variance evenly, so
each subspace codebook covers comparable spread. On isotropic vectors R is
a no-op by construction (all allocations balance) — the honest expectation
for the synthetic embeddings table, which the test acknowledges by
measuring the lift on deliberately-correlated data.

Scale shape: training is driver-side linear algebra on the d×d covariance
(pca's covariance_stats — ONE corpus pass, d² driver floats); applying R is
one Arrow-batched BLAS matmul per batch (pca.project), map-only. Encode,
ADC, and probes are the unchanged operators/pq.py paths run on the rotated
vectors — the QUERY vector is rotated driver-side with the same R (the
asymmetric-distance contract: both sides live in the rotated space).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame

from streamds_spark.operators.pca import pca, project


def eigenvalue_allocation(eigvals: "np.ndarray | list[float]", m: int) -> list[int]:
    """Permutation of component indices balancing variance across m buckets.

    Greedy (Ge et al. §4.1): components in descending-eigenvalue order each
    go to the non-full bucket with the smallest product of eigenvalues so
    far (log-sum for stability). Returns the concatenated bucket contents —
    index order for the rotated space, so subspace s = rows
    [s·d/m, (s+1)·d/m) of the permuted eigenbasis."""
    ev = np.maximum(np.asarray(eigvals, dtype=np.float64), 1e-12)
    d = len(ev)
    if d % m:
        raise ValueError(f"dim {d} not divisible by m {m}")
    cap = d // m
    order = np.argsort(ev)[::-1]  # descending
    buckets: list[list[int]] = [[] for _ in range(m)]
    logsum = [0.0] * m
    for idx in order:
        open_b = [b for b in range(m) if len(buckets[b]) < cap]
        b = min(open_b, key=lambda b: logsum[b])
        buckets[b].append(int(idx))
        logsum[b] += float(np.log(ev[idx]))
    return [i for b in buckets for i in b]


def train_opq(
    emb: DataFrame, m: int = 8, vec_col: str = "embedding"
) -> dict:
    """Learn the OPQ rotation from one corpus pass.

    Returns {"mean": d floats, "rot": d×d rows} — rot rows are the permuted
    PCA components, so y = rot @ (x - mean) is the rotated vector whose
    contiguous d/m slices have balanced variance."""
    p = pca(emb, vec_col=vec_col)
    perm = eigenvalue_allocation(p["eigvals"], m)
    return {
        "mean": [float(x) for x in p["mean"]],
        "rot": [[float(x) for x in p["components"][i]] for i in perm],
    }


def rotate_vectors(
    emb: DataFrame,
    opq: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "embedding",
) -> DataFrame:
    """(vec_id, rotated embedding): map-only Arrow-batched matmul."""
    return project(
        emb,
        np.asarray(opq["mean"]),
        np.asarray(opq["rot"]),
        id_col=id_col,
        vec_col=vec_col,
        out_col=out_col,
    )


def rotate_query(qvec: "list[float]", opq: dict) -> list[float]:
    """Driver-side twin of rotate_vectors for the probe vector."""
    r = np.asarray(opq["rot"], dtype=np.float64)
    mu = np.asarray(opq["mean"], dtype=np.float64)
    return [float(x) for x in r @ (np.asarray(qvec, dtype=np.float64) - mu)]


def anisotropic_demo_vectors(n: int = 1500, d: int = 64, seed: int = 11) -> np.ndarray:
    """Deterministic correlated vectors with a steep spectrum spread across
    ALL coordinates (random orthogonal mixing), so contiguous PQ slices see
    wildly unequal variance — the regime this operator exists for. Shared by
    the test suite and the recall harness (tools/opq_recall.py); NOT data
    for any query — a demo/measurement generator only."""
    rng = np.random.default_rng(seed)
    scales = np.geomspace(30.0, 0.1, d)
    q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    return (rng.standard_normal((n, d)) * scales) @ q.T
