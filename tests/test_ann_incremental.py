"""Incrementally-maintained ANN index (operators/ann_incremental.py): the
streamed/batched index must hold exactly what a one-shot build over the same
vectors holds (bucketing is a pure function of the vector), probes must keep
partition pruning over the growing store, replays must be no-ops, torn
batches invisible, and compaction result-preserving."""

from __future__ import annotations

import glob
import os

from streamds_spark.catalog import load_table
from streamds_spark.operators.ann import ann_probe_topk, build_ann_index
from streamds_spark.operators.ann_incremental import (
    ann_index_append,
    ann_index_probe,
    compact_ann_index,
    run_embedding_index_stream,
)
import pytest

SF = "/root/testdata/sf0.001"
N_PLANES = 6


def _batches(spark, n=3):
    emb = load_table(spark, SF, "embeddings")
    n_ids = emb.count()
    cut = n_ids // n
    return emb, [
        emb.filter(
            (emb.vec_id >= i * cut) & (emb.vec_id < ((i + 1) * cut if i < n - 1 else n_ids))
        )
        for i in range(n)
    ]


def _probe_rows(df):
    return [(r["vec_id"], r["label"], r["cos_sim"]) for r in df.collect()]


@pytest.mark.slow
def test_incremental_equals_one_shot_build(spark, tmp_path):
    emb, parts = _batches(spark)
    inc = str(tmp_path / "inc")
    ref = str(tmp_path / "ref")
    for i, part in enumerate(parts):
        ann_index_append(part, inc, i, n_planes=N_PLANES)
    build_ann_index(emb, ref, n_planes=N_PLANES)

    for probe_src in (0, 17, 42):
        qvec = [float(x) for x in emb.filter(emb.vec_id == probe_src).first()["embedding"]]
        got = ann_index_probe(spark, inc, qvec, k=8, n_flip_bits=1)
        want = ann_probe_topk(spark, ref, qvec, k=8, n_planes=N_PLANES, n_flip_bits=1)
        assert _probe_rows(got) == _probe_rows(want)

    # pruning survives the multi-dir read: PartitionFilters on bucket
    qvec = [float(x) for x in emb.first()["embedding"]]
    plan = (
        ann_index_probe(spark, inc, qvec, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "bucket" in plan


@pytest.mark.slow
def test_replay_overwrites_and_torn_batch_invisible(spark, tmp_path):
    emb, parts = _batches(spark)
    inc = str(tmp_path / "inc")
    for i, part in enumerate(parts[:2]):
        ann_index_append(part, inc, i, n_planes=N_PLANES)
    qvec = [float(x) for x in emb.first()["embedding"]]
    before = _probe_rows(ann_index_probe(spark, inc, qvec, k=10, n_flip_bits=2))

    # replayed batch 1 (same data): rewrites its dir, results unchanged
    ann_index_append(parts[1], inc, 1, n_planes=N_PLANES)
    assert _probe_rows(ann_index_probe(spark, inc, qvec, k=10, n_flip_bits=2)) == before

    # a torn batch (no _SUCCESS) must be invisible to probes
    ann_index_append(parts[2], inc, 2, n_planes=N_PLANES)
    os.remove(os.path.join(inc, "batch=2", "_SUCCESS"))
    assert _probe_rows(ann_index_probe(spark, inc, qvec, k=10, n_flip_bits=2)) == before

    # mismatched build params are refused, not silently mixed
    import pytest

    with pytest.raises(ValueError, match="n_planes"):
        ann_index_append(parts[2], inc, 3, n_planes=4)


@pytest.mark.slow
def test_compaction_preserves_probes(spark, tmp_path):
    emb, parts = _batches(spark)
    inc = str(tmp_path / "inc")
    for i, part in enumerate(parts):
        ann_index_append(part, inc, i, n_planes=N_PLANES)
    qvec = [float(x) for x in emb.filter(emb.vec_id == 7).first()["embedding"]]
    before = _probe_rows(ann_index_probe(spark, inc, qvec, k=10, n_flip_bits=1))

    assert compact_ann_index(spark, inc) == 3
    assert glob.glob(os.path.join(inc, "batch=*")) == []
    assert len(glob.glob(os.path.join(inc, "segment=*"))) == 1
    after = _probe_rows(ann_index_probe(spark, inc, qvec, k=10, n_flip_bits=1))
    assert after == before

    # an EMPTY batch after the segment commits, folds, and changes nothing
    ann_index_append(parts[0].limit(0), inc, 5, n_planes=N_PLANES)
    assert compact_ann_index(spark, inc) == 1
    assert _probe_rows(ann_index_probe(spark, inc, qvec, k=10, n_flip_bits=1)) == before

    # a real append after compaction is visible (duplicates of parts[1] rows),
    # and folding it preserves whatever it answered pre-fold
    ann_index_append(parts[1], inc, 6, n_planes=N_PLANES)
    dup = _probe_rows(ann_index_probe(spark, inc, qvec, k=10, n_flip_bits=1))
    assert dup[0] == before[0]  # exact self-match still first
    assert compact_ann_index(spark, inc) == 1
    assert _probe_rows(ann_index_probe(spark, inc, qvec, k=10, n_flip_bits=1)) == dup


@pytest.mark.slow
def test_streaming_index_maintenance(spark, tmp_path):
    """readStream over an embeddings dir -> per-trigger appends; after the
    drain the index answers exactly like a one-shot build."""
    import pyarrow.parquet as pq

    emb = load_table(spark, SF, "embeddings")
    src = str(tmp_path / "src")
    os.makedirs(src)
    tbl = pq.read_table(f"{SF}/embeddings.parquet").sort_by("vec_id")
    n = tbl.num_rows
    import time

    now = time.time()
    for i in range(3):
        part = tbl.slice(i * n // 3, (i + 1) * n // 3 - i * n // 3)
        p = os.path.join(src, f"{i:03d}.parquet")
        pq.write_table(part, p)
        os.utime(p, (now - 50 + i, now - 50 + i))

    inc = str(tmp_path / "inc")
    ref = str(tmp_path / "ref")
    q = run_embedding_index_stream(
        spark, src, inc, checkpoint=str(tmp_path / "ckpt"), n_planes=N_PLANES
    )
    q.awaitTermination(timeout=300)
    assert not q.isActive
    assert len(glob.glob(os.path.join(inc, "batch=*"))) == 3

    build_ann_index(emb, ref, n_planes=N_PLANES)
    for probe_src in (3, 25):
        qvec = [
            float(x) for x in emb.filter(emb.vec_id == probe_src).first()["embedding"]
        ]
        got = ann_index_probe(spark, inc, qvec, k=10, n_flip_bits=1)
        want = ann_probe_topk(spark, ref, qvec, k=10, n_planes=N_PLANES, n_flip_bits=1)
        assert _probe_rows(got) == _probe_rows(want)


@pytest.mark.slow
def test_post_compaction_replay_is_invisible_and_reclaimed(spark, tmp_path):
    """A batch replayed AFTER compaction (id <= segment hi) must never be
    read, and the next compaction reclaims its dir."""
    emb, parts = _batches(spark)
    inc = str(tmp_path / "inc")
    for i, part in enumerate(parts):
        ann_index_append(part, inc, i, n_planes=N_PLANES)
    qvec = [float(x) for x in emb.filter(emb.vec_id == 3).first()["embedding"]]
    before = _probe_rows(ann_index_probe(spark, inc, qvec, k=10, n_flip_bits=1))
    assert compact_ann_index(spark, inc) == 3  # segment=2 now live

    # replay of batch 1 arrives late (streaming redelivery after a crash)
    ann_index_append(parts[1], inc, 1, n_planes=N_PLANES)
    assert os.path.isdir(os.path.join(inc, "batch=1"))
    # invisible to probes: its rows are already inside the segment
    assert _probe_rows(ann_index_probe(spark, inc, qvec, k=10, n_flip_bits=1)) == before

    # next maintenance pass reclaims the garbage dir without changing results
    ann_index_append(parts[0], inc, 7, n_planes=N_PLANES)  # plus a real append
    assert compact_ann_index(spark, inc) == 1
    assert not os.path.isdir(os.path.join(inc, "batch=1"))
    dup = _probe_rows(ann_index_probe(spark, inc, qvec, k=10, n_flip_bits=1))
    assert dup[0] == before[0]
