"""Vector-search serving: the server's `ann` request against a persisted
LSH index — results equal a direct ann_probe_topk call, partition pruning
intact, and the validation contract (bad dim / missing index / bad k)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.operators.ann import ann_probe_topk, build_ann_index, load_index_meta
from streamds_spark.server import request, start_server
import pytest

SF = "/root/testdata/sf0.001"


def test_ann_serving_round_trip(spark, tmp_path):
    emb = load_table(spark, SF, "embeddings")
    index = str(tmp_path / "ann_index")
    build_ann_index(emb, index, n_planes=6)
    meta = load_index_meta(index)
    assert meta["n_planes"] == 6 and meta["dim"] == 64

    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    server = start_server(spark, SF)
    host, port = server.server_address[:2]
    try:
        resp = request(
            host, port, {"cmd": "ann", "index": index, "vector": qvec, "k": 5,
                         "flip_bits": 2},
        )
        assert resp["ok"], resp
        got = [(n["vec_id"], n["cos_sim"]) for n in resp["neighbors"]]
        direct = [
            (r["vec_id"], r["cos_sim"])
            for r in ann_probe_topk(
                spark, index, qvec, k=5, n_planes=6, n_flip_bits=2
            ).collect()
        ]
        assert got == direct
        # the probe vector itself is in the index -> exact self-match first
        assert got[0][0] == 0 and got[0][1] == 1.0

        # validation contract
        assert not request(host, port, {"cmd": "ann", "index": index})["ok"]
        assert not request(
            host, port, {"cmd": "ann", "index": index, "vector": [1.0, 2.0]}
        )["ok"]  # wrong dim
        assert not request(
            host, port,
            {"cmd": "ann", "index": str(tmp_path / "nope"), "vector": qvec},
        )["ok"]
        assert not request(
            host, port, {"cmd": "ann", "index": index, "vector": qvec, "k": 0}
        )["ok"]
    finally:
        server.shutdown()
        server.server_close()


def test_ivf_serving_round_trip(spark, tmp_path):
    """kind='ivf': served neighbors equal a direct ivf_probe_topk call; the
    scale-path index (coarse quantizer lists) behind the same endpoint."""
    from streamds_spark.operators.ivf import build_ivf_index, ivf_probe_topk

    emb = load_table(spark, SF, "embeddings")
    index = str(tmp_path / "ivf_index")
    build_ivf_index(emb, index, n_lists=8, max_iter=3)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    server = start_server(spark, SF)
    host, port = server.server_address[:2]
    try:
        resp = request(
            host, port,
            {"cmd": "ann", "kind": "ivf", "index": index, "vector": qvec,
             "k": 5, "n_probe": 3},
        )
        assert resp["ok"] and resp["kind"] == "ivf", resp
        got = [(n["vec_id"], n["cos_sim"]) for n in resp["neighbors"]]
        direct = [
            (r["vec_id"], r["cos_sim"])
            for r in ivf_probe_topk(spark, index, qvec, k=5, n_probe=3).collect()
        ]
        assert got == direct
        assert got[0][0] == 0 and got[0][1] == 1.0  # self-match
        assert not request(
            host, port,
            {"cmd": "ann", "kind": "ivf", "index": index, "vector": qvec,
             "n_probe": 0},
        )["ok"]
        assert not request(
            host, port,
            {"cmd": "ann", "kind": "nope", "index": index, "vector": qvec},
        )["ok"]
    finally:
        server.shutdown()
        server.server_close()


def test_probe_still_prunes_partitions(spark, tmp_path):
    """The serving path must keep the PartitionFilters pruning the index was
    built for — read the probe plan, not all buckets."""
    emb = load_table(spark, SF, "embeddings")
    index = str(tmp_path / "ann_index2")
    build_ann_index(emb, index, n_planes=6)
    qvec = [float(x) for x in emb.first()["embedding"]]
    df = ann_probe_topk(spark, index, qvec, k=5, n_planes=6, n_flip_bits=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan


@pytest.mark.slow
def test_incremental_index_served(spark, tmp_path):
    """kind 'lsh-inc' serves the STREAM-MAINTAINED index: responses equal a
    direct ann_index_probe and the one-shot-index serving path for the same
    vectors."""
    from streamds_spark.operators.ann_incremental import (
        ann_index_append,
        ann_index_probe,
    )

    emb = load_table(spark, SF, "embeddings")
    inc = str(tmp_path / "inc_index")
    n = emb.count()
    ann_index_append(emb.filter(F.col("vec_id") < n // 2), inc, 0, n_planes=6)
    ann_index_append(emb.filter(F.col("vec_id") >= n // 2), inc, 1, n_planes=6)
    ref = str(tmp_path / "ref_index")
    build_ann_index(emb, ref, n_planes=6)

    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 11).first()["embedding"]]
    server = start_server(spark, SF)
    host, port = server.server_address[:2]
    try:
        resp = request(
            host, port,
            {"cmd": "ann", "kind": "lsh-inc", "index": inc, "vector": qvec,
             "k": 6, "flip_bits": 1},
        )
        assert resp["ok"] and resp["kind"] == "lsh-inc"
        direct = ann_index_probe(spark, inc, qvec, k=6, n_flip_bits=1).collect()
        assert [(d["vec_id"], d["cos_sim"]) for d in resp["neighbors"]] == [
            (r["vec_id"], r["cos_sim"]) for r in direct
        ]
        assert resp["neighbors"][0]["vec_id"] == 11  # self-match first
        # same answers as the one-shot index served with kind lsh
        one_shot = request(
            host, port,
            {"cmd": "ann", "kind": "lsh", "index": ref, "vector": qvec,
             "k": 6, "flip_bits": 1},
        )
        assert one_shot["ok"] and one_shot["neighbors"] == resp["neighbors"]
        # dim validation still enforced
        bad = request(
            host, port,
            {"cmd": "ann", "kind": "lsh-inc", "index": inc, "vector": [1.0, 2.0]},
        )
        assert not bad["ok"] and "dim" in bad["error"]
    finally:
        server.shutdown()
        server.server_close()


@pytest.mark.slow
def test_incremental_ivf_index_served(spark, tmp_path):
    """kind 'ivf-inc' serves the stream-maintained IVF index: responses
    equal a direct ivf_index_probe, the full-width probe equals brute
    force, and dim validation is enforced."""
    from streamds_spark.operators.ivf_incremental import (
        ivf_index_append,
        ivf_index_probe,
    )

    emb = load_table(spark, SF, "embeddings")
    inc = str(tmp_path / "ivf_inc_index")
    n = emb.count()
    ivf_index_append(emb.filter(F.col("vec_id") < n // 2), inc, 0, n_lists=8)
    ivf_index_append(emb.filter(F.col("vec_id") >= n // 2), inc, 1, n_lists=8)

    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 11).first()["embedding"]]
    server = start_server(spark, SF)
    host, port = server.server_address[:2]
    try:
        resp = request(
            host, port,
            {"cmd": "ann", "kind": "ivf-inc", "index": inc, "vector": qvec,
             "k": 6, "n_probe": 3},
        )
        assert resp["ok"] and resp["kind"] == "ivf-inc"
        direct = ivf_index_probe(spark, inc, qvec, k=6, n_probe=3).collect()
        assert [(d["vec_id"], d["cos_sim"]) for d in resp["neighbors"]] == [
            (r["vec_id"], r["cos_sim"]) for r in direct
        ]
        assert resp["neighbors"][0]["vec_id"] == 11  # self-match first
        bad = request(
            host, port,
            {"cmd": "ann", "kind": "ivf-inc", "index": inc, "vector": [1.0]},
        )
        assert not bad["ok"] and "dim" in bad["error"]
        bad_np = request(
            host, port,
            {"cmd": "ann", "kind": "ivf-inc", "index": inc, "vector": qvec,
             "n_probe": 0},
        )
        assert not bad_np["ok"] and "n_probe" in bad_np["error"]
    finally:
        server.shutdown()
        server.server_close()
