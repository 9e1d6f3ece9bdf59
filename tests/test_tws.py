"""transformWithStateInPandas operators: exact-recursive streaming EWMA and
Welford anomaly flags.

Two layers of coverage:
  - Unit tests drive the StatefulProcessor fold logic directly through a fake
    ValueState (same exists/get/update surface), verifying the math against
    single-machine reference folds including state carry-over across batches.
    These always run.
  - Integration tests run the real transformWithStateInPandas query; they
    require google.protobuf (the state-server protocol dep) and skip with a
    clear reason where it's absent (see tws.tws_available)."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from streamds_spark.streaming.tws import (
    AnomalyFlagProcessor,
    RunningEwmaProcessor,
    anomaly_flags,
    running_ewma,
    tws_available,
)

needs_tws = pytest.mark.skipif(
    not tws_available(),
    reason="transformWithStateInPandas needs google.protobuf (absent here)",
)


class FakeValueState:
    """Mimics pyspark ValueState: exists/get/update over a tuple."""

    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


class FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, FakeValueState())


def _feed(proc, key, batches):
    """Run handleInputRows once per batch against a shared fake handle,
    mimicking state carry-over across micro-batches."""
    handle = FakeHandle()
    proc.init(handle)
    out = []
    for pdf in batches:
        out.extend(proc.handleInputRows((key,), iter([pdf]), None))
    proc.close()
    return pd.concat(out, ignore_index=True) if out else pd.DataFrame()


def _ref_ewma(values, alpha=0.3):
    y = None
    for v in values:
        y = v if y is None else alpha * v + (1 - alpha) * y
    return y


def _batch(rows):
    return pd.DataFrame(rows, columns=["ts", "value"])


def test_ewma_processor_state_carryover_unit():
    b0 = _batch([("2024-01-01T00:00:00", 10.0), ("2024-01-01T00:01:00", 12.0)])
    b1 = _batch([("2024-01-01T00:02:00", 11.0)])
    out = _feed(RunningEwmaProcessor(alpha=0.3), "a", [b0, b1])
    # one emission per batch; the last carries the full-sequence fold
    assert list(out["n"]) == [2, 3]
    assert out["ewma"].iloc[-1] == pytest.approx(_ref_ewma([10.0, 12.0, 11.0]))


def test_ewma_processor_orders_within_batch_unit():
    # rows arrive ts-shuffled inside the batch; the fold must sort by ts
    b0 = _batch(
        [
            ("2024-01-01T00:02:00", 11.0),
            ("2024-01-01T00:00:00", 10.0),
            ("2024-01-01T00:01:00", 12.0),
        ]
    )
    out = _feed(RunningEwmaProcessor(alpha=0.3), "a", [b0])
    assert out["ewma"].iloc[-1] == pytest.approx(_ref_ewma([10.0, 12.0, 11.0]))


def test_anomaly_processor_flags_spike_not_self_masked_unit():
    calm = _batch(
        [
            (f"2024-01-01T00:{i:02d}:00", 10.0 + (0.1 if i % 2 else -0.1))
            for i in range(20)
        ]
    )
    later = _batch(
        [("2024-01-01T00:30:00", 50.0), ("2024-01-01T00:31:00", 10.1)]
    )
    out = _feed(AnomalyFlagProcessor(z_thresh=3.0, min_n=10), "u", [calm, later])
    assert list(out["value"]) == [50.0]
    assert abs(out["zscore"].iloc[0]) > 3.0


def test_anomaly_processor_respects_min_n_unit():
    # spike at position 5 < min_n=10 must NOT be flagged
    rows = [(f"2024-01-01T00:{i:02d}:00", 10.0) for i in range(5)]
    rows.append(("2024-01-01T00:05:00", 99.0))
    out = _feed(AnomalyFlagProcessor(z_thresh=3.0, min_n=10), "u", [_batch(rows)])
    assert out.empty


# ---- real-query integration (needs protobuf) --------------------------------


def _stream_from_files(spark, d):
    return (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(d)
        .select(F.split("value", " ").alias("p"))
        .select(
            F.col("p").getItem(0).alias("key"),
            F.col("p").getItem(1).cast("timestamp").alias("ts"),
            F.col("p").getItem(2).cast("double").alias("value"),
        )
    )


def _drain(df, ckpt, mode):
    rows = []
    q = (
        df.writeStream.outputMode(mode)
        .option("checkpointLocation", ckpt)
        .foreachBatch(lambda bdf, bid: rows.extend(bdf.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return rows


@needs_tws
def test_running_ewma_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src)
    # two files -> two micro-batches (maxFilesPerTrigger=1): state must carry
    a_vals = [10.0, 12.0, 11.0]
    b_vals = [100.0]
    with open(os.path.join(src, "f0.txt"), "w") as f:
        f.write("a 2024-01-01T00:00:00 10.0\n")
        f.write("a 2024-01-01T00:01:00 12.0\n")
        f.write("b 2024-01-01T00:00:30 100.0\n")
    with open(os.path.join(src, "f1.txt"), "w") as f:
        f.write("a 2024-01-01T00:02:00 11.0\n")
    rows = _drain(
        running_ewma(_stream_from_files(spark, src)),
        str(tmp_path / "ckpt"),
        "update",
    )
    final = {}
    for r in rows:
        final[r["key"]] = (r["n"], r["ewma"])
    assert final["a"][0] == 3
    assert final["a"][1] == pytest.approx(_ref_ewma(a_vals))
    assert final["b"] == (1, pytest.approx(_ref_ewma(b_vals)))


@needs_tws
def test_anomaly_flags_spike_detection(spark, tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src)
    # 20 calm points around 10, then one 10-sigma spike in a LATER micro-batch
    lines = [
        f"u 2024-01-01T00:{i:02d}:00 {10.0 + (0.1 if i % 2 else -0.1)}"
        for i in range(20)
    ]
    with open(os.path.join(src, "f0.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(src, "f1.txt"), "w") as f:
        f.write("u 2024-01-01T00:30:00 50.0\n")
        f.write("u 2024-01-01T00:31:00 10.1\n")
    rows = _drain(
        anomaly_flags(_stream_from_files(spark, src), z_thresh=3.0, min_n=10),
        str(tmp_path / "ckpt"),
        "append",
    )
    flagged = [(r["key"], r["value"]) for r in rows]
    assert flagged == [("u", 50.0)]
    assert abs(rows[0]["zscore"]) > 3.0
