"""streaming_dedup (engine.py): bounded-state streaming deduplication via
dropDuplicatesWithinWatermark — same-batch and cross-batch duplicates inside
the watermark horizon are absorbed, a duplicate arriving AFTER its key's
state was evicted re-emits (the documented bounded-state contract), and the
no-eviction case equals the batch dropDuplicates twin."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from streamds_spark.streaming.engine import foreach_batch_parquet, streaming_dedup
import pytest


def _write(src: str, name: str, rows: list[tuple[str, str, int]]) -> None:
    with open(os.path.join(src, name), "w") as f:
        for ts, key, v in rows:
            f.write(f"{ts}|{key}|{v}\n")


def _run_once(spark, src: str, ckpt: str, out: str, watermark: str) -> None:
    stream = (
        spark.readStream.format("text")
        .load(src)
        .select(F.split("value", "\\|").alias("p"))
        .select(
            F.col("p").getItem(0).cast("timestamp").alias("ts"),
            F.col("p").getItem(1).alias("k"),
            F.col("p").getItem(2).cast("int").alias("v"),
        )
    )
    deduped = streaming_dedup(stream, ["k"], ts_col="ts", watermark="1 hour")
    q = (
        deduped.writeStream.foreachBatch(foreach_batch_parquet(out))
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _emitted(spark, out: str) -> list[tuple[str, int]]:
    rows = []
    for b in sorted(glob.glob(os.path.join(out, "batch=*"))):
        rows += [
            (r["k"], r["v"]) for r in spark.read.parquet(b).collect()
        ]
    return rows


@pytest.mark.slow
def test_dedup_absorbs_within_horizon_and_reemits_after_eviction(spark, tmp_path):
    src, ckpt, out = (str(tmp_path / d) for d in ("in", "ckpt", "out"))
    os.makedirs(src)

    # run 1: same-batch duplicate (k1 twice) + a fresh key
    _write(src, "a.txt", [
        ("2024-01-01 10:00:00", "k1", 1),
        ("2024-01-01 10:05:00", "k1", 2),
        ("2024-01-01 10:10:00", "k2", 3),
    ])
    _run_once(spark, src, ckpt, out, "1 hour")
    got = _emitted(spark, out)
    assert sorted(k for k, _ in got) == ["k1", "k2"]
    assert ("k1", 1) in got, "first-seen row wins within a batch"

    # run 2: cross-run duplicate still inside the 1 h horizon -> absorbed
    _write(src, "b.txt", [
        ("2024-01-01 10:20:00", "k1", 4),
        ("2024-01-01 10:30:00", "k3", 5),
    ])
    _run_once(spark, src, ckpt, out, "1 hour")
    got = _emitted(spark, out)
    assert sorted(k for k, _ in got) == ["k1", "k2", "k3"]

    # run 3: advance event time far past every key's expiry (10:20 + 1 h)
    _write(src, "c.txt", [("2024-01-01 14:00:00", "k4", 6)])
    _run_once(spark, src, ckpt, out, "1 hour")

    # run 4: k1 again — its state was evicted at watermark 13:00, so by the
    # bounded-state CONTRACT this re-emits (lifetime exactness is the
    # appendlog manifests' job, not the time-horizon dedup's)
    _write(src, "d.txt", [("2024-01-01 14:05:00", "k1", 7)])
    _run_once(spark, src, ckpt, out, "1 hour")
    got = _emitted(spark, out)
    k1_rows = [(k, v) for k, v in got if k == "k1"]
    assert ("k1", 7) in k1_rows, "post-eviction duplicate must re-emit"
    assert len(k1_rows) == 2
    assert sorted(k for k, _ in got) == ["k1", "k1", "k2", "k3", "k4"]


def test_stream_equals_batch_twin_when_no_eviction(spark, tmp_path):
    """With every duplicate inside one watermark horizon, the stream's output
    keys equal the batch dropDuplicates twin's."""
    src, ckpt, out = (str(tmp_path / d) for d in ("in", "ckpt", "out"))
    os.makedirs(src)
    rows = [
        ("2024-01-01 09:00:00", "a", 1),
        ("2024-01-01 09:10:00", "b", 2),
        ("2024-01-01 09:15:00", "a", 3),
        ("2024-01-01 09:20:00", "c", 4),
        ("2024-01-01 09:25:00", "b", 5),
    ]
    _write(src, "a.txt", rows)
    _run_once(spark, src, ckpt, out, "1 hour")
    stream_keys = sorted(k for k, _ in _emitted(spark, out))

    batch = spark.createDataFrame(
        [(ts, k, v) for ts, k, v in rows], "ts_s string, k string, v int"
    ).select(F.col("ts_s").cast("timestamp").alias("ts"), "k", "v")
    batch_keys = sorted(
        r["k"] for r in batch.dropDuplicates(["k"]).collect()
    )
    assert stream_keys == batch_keys == ["a", "b", "c"]
