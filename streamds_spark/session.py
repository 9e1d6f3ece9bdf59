"""SparkSession factory tuned for both local testing and large-cluster posture.

Scale stance (100 TB / 1000 executors):
  - AQE on: runtime coalescing of shuffle partitions, skew-join splitting and
    dynamic broadcast conversion replace any hand-tuned partition counts.
  - Arrow on: every Pandas-UDF path (minhash batching, multimodal decode) moves
    columnar batches, never per-row pickling.
  - Session timezone pinned to UTC so event-time semantics are deployment-independent.
  - `spark.sql.shuffle.partitions` is only an AQE *upper* seed locally; on a real
    cluster leave it high (e.g. 2000) and let AQE coalesce.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "streamds_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Return (or create) the session. Idempotent: re-uses an active session."""
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{DEFAULT_CPUS}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
