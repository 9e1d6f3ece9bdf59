"""Incrementally-maintained IVF index (operators/ivf_incremental.py):
centroids train once on the first batch and freeze in _meta.json, so the
store must hold exactly what a one-shot build from the SAME centroids holds
(assignment is a pure function of vector x centroids); probes must prune on
list_id over the growing store, full-width probes must equal brute force,
replays must be no-ops, and compaction must preserve probe answers."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.functions.vectors import as_double, cosine
from streamds_spark.operators.ivf import ivf_probe_topk
from streamds_spark.operators.ivf_incremental import (
    assign_lists,
    compact_ivf_index,
    ivf_index_append,
    ivf_index_probe,
    load_ivf_meta,
)

SF = "/root/testdata/sf0.001"
N_LISTS = 8


def _batches(spark, n=3):
    emb = load_table(spark, SF, "embeddings")
    n_ids = emb.count()
    cut = n_ids // n
    return emb, [
        emb.filter(
            (emb.vec_id >= i * cut)
            & (emb.vec_id < ((i + 1) * cut if i < n - 1 else n_ids))
        )
        for i in range(n)
    ]


def _probe_rows(df):
    return [(r["vec_id"], r["label"], r["cos_sim"]) for r in df.collect()]


def _qvec(emb, vid):
    return [float(x) for x in emb.filter(emb.vec_id == vid).first()["embedding"]]


@pytest.mark.slow
def test_incremental_equals_one_shot_from_frozen_centroids(spark, tmp_path):
    emb, parts = _batches(spark)
    inc = str(tmp_path / "inc")
    for i, part in enumerate(parts):
        ivf_index_append(part, inc, i, n_lists=N_LISTS)
    meta = load_ivf_meta(inc)
    assert meta["n_lists"] == N_LISTS and meta["dim"] == 64

    # one-shot reference over the union, built from the SAME frozen
    # centroids (assign_lists is the shared pure function), probed with the
    # stock one-shot ivf_probe_topk
    ref = str(tmp_path / "ref")
    assign_lists(emb, meta["centroids"]).write.partitionBy("list_id").parquet(
        os.path.join(ref, "data")
    )
    with open(os.path.join(ref, "centroids.json"), "w") as f:
        json.dump(meta["centroids"], f)

    for vid in (0, 17, 42):
        qvec = _qvec(emb, vid)
        for n_probe in (1, 2, 4):
            got = ivf_index_probe(spark, inc, qvec, k=8, n_probe=n_probe)
            want = ivf_probe_topk(spark, ref, qvec, k=8, n_probe=n_probe)
            assert _probe_rows(got) == _probe_rows(want), (vid, n_probe)

    # pruning survives the multi-dir read: PartitionFilters on list_id
    plan = (
        ivf_index_probe(spark, inc, _qvec(emb, 0), k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "list_id" in plan


@pytest.mark.slow
def test_full_width_probe_equals_brute_force(spark, tmp_path):
    """n_probe = n_lists reads every list — the probe must then equal exact
    brute-force cosine top-k (the recall dial's 1.0 endpoint)."""
    emb, parts = _batches(spark)
    inc = str(tmp_path / "inc")
    for i, part in enumerate(parts):
        ivf_index_append(part, inc, i, n_lists=N_LISTS)
    qvec = _qvec(emb, 7)
    q = F.array(*[F.lit(x) for x in qvec])
    brute = (
        emb.select(
            "vec_id",
            "label",
            F.round(cosine(as_double(F.col("embedding")), q), 4).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )
    got = ivf_index_probe(spark, inc, qvec, k=10, n_probe=N_LISTS)
    assert _probe_rows(got) == _probe_rows(brute)


@pytest.mark.slow
def test_recall_dial_and_frozen_centroid_guards(spark, tmp_path):
    emb, parts = _batches(spark)
    inc = str(tmp_path / "inc")
    for i, part in enumerate(parts):
        ivf_index_append(part, inc, i, n_lists=N_LISTS)

    # recall@10 over a probe sample at the narrow end of the dial: the
    # probed-list candidates must recover a usable share of the exact top-k
    hits = total = 0
    for vid in (3, 25, 111, 200, 333):
        qvec = _qvec(emb, vid)
        q = F.array(*[F.lit(x) for x in qvec])
        exact = [
            r["vec_id"]
            for r in emb.select(
                "vec_id", cosine(as_double(F.col("embedding")), q).alias("s")
            )
            .orderBy(F.desc("s"), F.asc("vec_id"))
            .limit(10)
            .collect()
        ]
        approx = {
            r["vec_id"]
            for r in ivf_index_probe(spark, inc, qvec, k=10, n_probe=3).collect()
        }
        hits += len(approx & set(exact))
        total += 10
    assert hits / total >= 0.5, f"recall@10 n_probe=3 collapsed: {hits}/{total}"

    # frozen-quantizer guards: wrong n_lists and wrong dim are refused
    with pytest.raises(ValueError, match="n_lists"):
        ivf_index_append(parts[0], inc, 9, n_lists=N_LISTS + 1)
    bad_dim = parts[0].withColumn("embedding", F.expr("slice(embedding, 1, 32)"))
    with pytest.raises(ValueError, match="dim"):
        ivf_index_append(bad_dim, inc, 9, n_lists=N_LISTS)
    # empty FIRST batch cannot train a quantizer
    with pytest.raises(ValueError, match="empty first"):
        ivf_index_append(
            parts[0].filter("vec_id < 0"), str(tmp_path / "empty"), 0
        )


@pytest.mark.slow
def test_replay_compaction_and_append_after_compaction(spark, tmp_path):
    emb, parts = _batches(spark)
    inc = str(tmp_path / "inc")
    for i, part in enumerate(parts[:2]):
        ivf_index_append(part, inc, i, n_lists=N_LISTS)
    qvec = _qvec(emb, 0)
    before = _probe_rows(ivf_index_probe(spark, inc, qvec, k=10, n_probe=4))

    # replayed batch rewrites its dir; results unchanged
    ivf_index_append(parts[1], inc, 1, n_lists=N_LISTS)
    assert _probe_rows(ivf_index_probe(spark, inc, qvec, k=10, n_probe=4)) == before

    # torn batch (no _SUCCESS) is invisible
    ivf_index_append(parts[2], inc, 2, n_lists=N_LISTS)
    os.remove(os.path.join(inc, "batch=2", "_SUCCESS"))
    assert _probe_rows(ivf_index_probe(spark, inc, qvec, k=10, n_probe=4)) == before
    ivf_index_append(parts[2], inc, 2, n_lists=N_LISTS)  # re-commit
    with_b2 = _probe_rows(ivf_index_probe(spark, inc, qvec, k=10, n_probe=4))

    # compaction folds 3 batch dirs into one segment, answers preserved
    assert compact_ivf_index(spark, inc) == 3
    assert os.path.exists(os.path.join(inc, "segment=2", "_SUCCESS"))
    assert _probe_rows(ivf_index_probe(spark, inc, qvec, k=10, n_probe=4)) == with_b2

    # appends keep landing after compaction, against the same frozen
    # centroids, and fold again on the next pass
    shifted = parts[0].withColumn("vec_id", F.col("vec_id") + 10_000)
    ivf_index_append(shifted, inc, 3, n_lists=N_LISTS)
    after = _probe_rows(ivf_index_probe(spark, inc, qvec, k=10, n_probe=N_LISTS))
    assert len(after) == 10
    assert compact_ivf_index(spark, inc) == 1
    assert _probe_rows(
        ivf_index_probe(spark, inc, qvec, k=10, n_probe=N_LISTS)
    ) == after


@pytest.mark.slow
def test_rebuild_retrains_and_preserves_population(spark, tmp_path):
    """ivf_index_rebuild: a fresh store under newly trained centroids holds
    the SAME vector population (full-width probes identical), its meta is
    fresh, and the old store is untouched."""
    import pytest

    from streamds_spark.operators.ivf_incremental import ivf_index_rebuild

    emb, parts = _batches(spark)
    old = str(tmp_path / "old")
    for i, part in enumerate(parts):
        ivf_index_append(part, old, i, n_lists=N_LISTS)
    qvec = _qvec(emb, 3)
    before = _probe_rows(ivf_index_probe(spark, old, qvec, k=10, n_probe=N_LISTS))

    new = str(tmp_path / "new")
    n = ivf_index_rebuild(spark, old, new, n_lists=4)
    assert n == emb.count()
    meta = load_ivf_meta(new)
    assert meta["n_lists"] == 4 and len(meta["centroids"]) == 4
    # full-width probes see the identical population through new lists
    after = _probe_rows(ivf_index_probe(spark, new, qvec, k=10, n_probe=4))
    assert after == before
    # old store still serves
    assert _probe_rows(
        ivf_index_probe(spark, old, qvec, k=10, n_probe=N_LISTS)
    ) == before
    # appends continue against the NEW frozen quantizer
    ivf_index_append(parts[0].withColumn("vec_id", F.col("vec_id") + 10_000),
                     new, 1, n_lists=4)
    assert len(_probe_rows(ivf_index_probe(spark, new, qvec, k=10, n_probe=4))) == 10
    # rebuilding an empty store is refused
    with pytest.raises(ValueError, match="nothing committed"):
        ivf_index_rebuild(spark, str(tmp_path / "void"), str(tmp_path / "x"))
