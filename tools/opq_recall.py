"""IVF-PQ recall@10 at n_probe 2/4/8, plain vs OPQ-rotated — the measured
delta behind operators/opq.py (recorded in BASELINE.md).

Two datasets: the repo's embeddings table (synthetic, near-isotropic — the
honest expectation is no delta, since OPQ's rotation is a no-op when variance
is already balanced) and the anisotropic construction from tests/test_opq.py
(steep mixed spectrum — the regime OPQ exists for).

Usage: python tools/opq_recall.py [sf_dir]   # prints one JSON line
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamds_spark.catalog import load_table
from streamds_spark.session import get_spark

N_QUERIES = 20
TOPK = 10


def recall_curve(spark, df, vecs, ids, opq=None) -> dict:
    """Build an IVF-PQ index over df (already rotated if opq given) and
    measure mean recall@TOPK at n_probe 2/4/8 against exact L2 on the RAW
    vectors (ground truth never moves — rotation preserves distances)."""
    from streamds_spark.operators.opq import rotate_query
    from streamds_spark.operators.pq import build_ivfpq_index, ivfpq_probe_topk

    out = {}
    with tempfile.TemporaryDirectory(prefix="opq_ivfpq_") as path:
        build_ivfpq_index(df, path, n_lists=8, m=8, k_codes=16, max_iter=4)
        rng = np.random.default_rng(17)
        q_idx = rng.choice(len(vecs), size=N_QUERIES, replace=False)
        for n_probe in (2, 4, 8):
            hits = 0
            for qi in q_idx:
                qv = vecs[qi]
                exact = set(
                    ids[np.argsort(((vecs - qv) ** 2).sum(axis=1))[:TOPK]].tolist()
                )
                probe = rotate_query(qv.tolist(), opq) if opq else qv.tolist()
                got = {
                    r["vec_id"]
                    for r in ivfpq_probe_topk(
                        spark, path, probe, topk=TOPK, n_probe=n_probe
                    ).collect()
                }
                hits += len(exact & got)
            out[f"n_probe_{n_probe}"] = round(hits / (N_QUERIES * TOPK), 3)
    return out


def main() -> None:
    from streamds_spark.operators.opq import rotate_vectors, train_opq

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("opq-recall")
    results = {}

    for name, (df, id_col) in {
        "embeddings_table": (
            load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding"),
            "vec_id",
        ),
    }.items():
        rows = df.orderBy(id_col).collect()
        ids = np.array([r[0] for r in rows])
        vecs = np.array([list(r[1]) for r in rows], dtype=np.float64)
        opq = train_opq(df, m=8)
        rot_df = rotate_vectors(df, opq, out_col="embedding")
        results[name] = {
            "plain": recall_curve(spark, df, vecs, ids),
            "opq": recall_curve(spark, rot_df, vecs, ids, opq=opq),
        }

    # anisotropic synthetic (the OPQ regime)
    from streamds_spark.operators.opq import anisotropic_demo_vectors

    vecs = anisotropic_demo_vectors()
    ids = np.arange(len(vecs))
    df = spark.createDataFrame(
        [(int(i), v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    opq = train_opq(df, m=8)
    rot_df = rotate_vectors(df, opq, out_col="embedding")
    results["anisotropic_synthetic"] = {
        "plain": recall_curve(spark, df, vecs, ids),
        "opq": recall_curve(spark, rot_df, vecs, ids, opq=opq),
    }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
