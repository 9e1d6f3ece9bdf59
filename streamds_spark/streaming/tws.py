"""transformWithStateInPandas operators — Spark 4's arbitrary-state streaming
API (SPARK-49958, the successor to applyInPandasWithState): typed state
variables (ValueState / ListState / MapState) with per-variable TTL, timers,
and schema evolution, managed by the same RocksDB-capable state store as the
built-in aggregates.

Two operators:
  - RunningEwmaProcessor: per-key exponentially-weighted mean with a
    ValueState float — the streaming twin of queries/timeseries.py's batch
    EWMA, but exact-recursive (no truncation) because state carries y_{t-1}.
  - AnomalyFlagProcessor: per-key Welford mean/variance state; emits rows
    whose value deviates more than `z_thresh` sigmas from the running mean
    (streaming z-score outlier detection, the online cousin of
    value_outliers_mad).

Scale posture: state is hash-partitioned by key like any stateful aggregate;
per-key state is O(1) floats (EWMA: one, Welford: three). TTL/timers bound
live-key cardinality on expiring domains. Batches arrive Arrow-encoded;
the per-key fold is a vectorized pandas reduction, not a per-row loop.

Runtime requirement: transformWithStateInPandas talks to the JVM state server
over a protobuf protocol, so `google.protobuf` must be installed
(`pip install protobuf`, bundled with pyspark[connect]). In environments
without it the query fails at initialization with
STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE; `tws_available()` reports
this, tests gate on it, and the applyInPandasWithState path
(streaming/stateful.py) remains the dependency-free stateful fallback.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

def tws_available() -> bool:
    """True when the runtime dependency of transformWithStateInPandas
    (google.protobuf, used by the state-server protocol) is importable."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n", LongType()),
        StructField("ewma", DoubleType()),
    ]
)

_EWMA_STATE_SCHEMA = StructType(
    [StructField("ewma", DoubleType()), StructField("n", LongType())]
)


class RunningEwmaProcessor(StatefulProcessor):
    """y_t = α·x_t + (1-α)·y_{t-1}, exact-recursive across micro-batches.
    Input rows are folded in (ts, value) order within each batch."""

    def __init__(self, alpha: float = 0.3):
        self.alpha = alpha

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.state = handle.getValueState("ewma", _EWMA_STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        if self.state.exists():
            ewma, n = self.state.get()
        else:
            ewma, n = None, 0
        for pdf in rows:
            for v in pdf.sort_values("ts")["value"]:
                v = float(v)
                ewma = v if ewma is None else self.alpha * v + (1 - self.alpha) * ewma
                n += 1
        self.state.update((ewma, n))
        yield pd.DataFrame({"key": [key[0]], "n": [n], "ewma": [ewma]})

    def close(self) -> None:
        pass


ANOMALY_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("value", DoubleType()),
        StructField("zscore", DoubleType()),
    ]
)

_WELFORD_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("mean", DoubleType()),
        StructField("m2", DoubleType()),
    ]
)


class AnomalyFlagProcessor(StatefulProcessor):
    """Welford online mean/variance per key; emits (key, value, zscore) for
    each input whose |z| exceeds z_thresh against the state BEFORE folding the
    point in (so a lone spike can't mask itself). Needs >= min_n prior points
    before it starts flagging."""

    def __init__(self, z_thresh: float = 3.0, min_n: int = 10):
        self.z_thresh = z_thresh
        self.min_n = min_n

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.state = handle.getValueState("welford", _WELFORD_STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        if self.state.exists():
            n, mean, m2 = self.state.get()
        else:
            n, mean, m2 = 0, 0.0, 0.0
        out_v, out_z = [], []
        for pdf in rows:
            for v in pdf.sort_values("ts")["value"]:
                v = float(v)
                if n >= self.min_n:
                    var = m2 / (n - 1) if n > 1 else 0.0
                    if var > 0:
                        z = (v - mean) / var**0.5
                        if abs(z) > self.z_thresh:
                            out_v.append(v)
                            out_z.append(z)
                n += 1
                d = v - mean
                mean += d / n
                m2 += d * (v - mean)
        self.state.update((n, mean, m2))
        if out_v:
            yield pd.DataFrame(
                {"key": [key[0]] * len(out_v), "value": out_v, "zscore": out_z}
            )

    def close(self) -> None:
        pass


def running_ewma(stream: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Streaming DataFrame[(key, ts, value)] → per-key running EWMA rows."""
    from streamds_spark.session import ensure_workers_can_import

    ensure_workers_can_import(stream.sparkSession)
    return stream.groupBy("key").transformWithStateInPandas(
        statefulProcessor=RunningEwmaProcessor(alpha),
        outputStructType=EWMA_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def anomaly_flags(
    stream: DataFrame, z_thresh: float = 3.0, min_n: int = 10
) -> DataFrame:
    """Streaming DataFrame[(key, ts, value)] → flagged outlier rows."""
    from streamds_spark.session import ensure_workers_can_import

    ensure_workers_can_import(stream.sparkSession)
    return stream.groupBy("key").transformWithStateInPandas(
        statefulProcessor=AnomalyFlagProcessor(z_thresh, min_n),
        outputStructType=ANOMALY_OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
