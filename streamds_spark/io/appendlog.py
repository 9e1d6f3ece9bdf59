"""Append-log table facade — the HyDFS user semantics (create/append/merge/get)
on Spark-native storage.

Reference behavior (SURVEY.md §1.3): appends are per-client chunk files tagged
with Lamport timestamps (appendLocal, core_process_utils.go:2165-2189); merge
sorts a client's appends by Lamport timestamp and concatenates (mergeFile,
:2040-2146) — per-client order guaranteed, cross-client order unspecified.

Here: an append-log table is a directory of parquet chunks, each row carrying
(client_id, seq, payload columns). `get` reads everything with per-client
ordering columns available; `merge` compacts chunks into one ordered table.
Replication/caching (3-way, invalidation) is the storage layer's job in a real
deployment (HDFS/S3 + table format) — by design not reimplemented.

Scale: append = one parquet write (no read-modify-write); merge = one sorted
rewrite, partitionable by client_id.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def create(spark: SparkSession, path: str) -> None:
    """CREATE: initialize an empty log dir (idempotent like the reference's
    createfile + overwrite-on-create)."""
    os.makedirs(os.path.join(path, "chunks"), exist_ok=True)


def append(df: DataFrame, path: str, client_id: str) -> None:
    """APPEND: write one chunk tagged (client_id, seq, pos). seq is a per-append
    monotonic stamp (the Lamport-timestamp role: orders THIS client's appends);
    pos is a per-row ordinal within the chunk (monotonically_increasing_id is
    partition-major, so sorting by it reproduces the DataFrame's row order) —
    without it, lines inside one append would come back in arbitrary order."""
    seq = time.monotonic_ns()
    chunk = (
        df.withColumn("_client", F.lit(client_id))
        .withColumn("_seq", F.lit(seq))
        .withColumn("_pos", F.monotonically_increasing_id())
    )
    chunk.write.mode("append").parquet(os.path.join(path, "chunks"))
    # marker for humans/debugging; data order comes from the _seq column
    open(os.path.join(path, f".append-{client_id}-{seq}-{uuid.uuid4().hex[:6]}"), "w").close()


def get(spark: SparkSession, path: str) -> DataFrame:
    """GET: full view with per-client ordering columns (_client, _seq)."""
    return spark.read.parquet(os.path.join(path, "chunks"))


def merge(spark: SparkSession, path: str) -> None:
    """MERGE: compact chunks into a single table ordered by (_client, _seq) —
    per-client append order preserved, cross-client order deterministic-but-
    arbitrary (client id order), matching the reference's guarantee."""
    merged = get(spark, path).orderBy("_client", "_seq", "_pos")
    tmp = os.path.join(path, "_merged_tmp")
    merged.write.mode("overwrite").parquet(tmp)
    final = os.path.join(path, "chunks")
    back = spark.read.parquet(tmp)
    back.write.mode("overwrite").parquet(final)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    for marker in os.listdir(path):
        if marker.startswith(".append-"):
            os.remove(os.path.join(path, marker))


def read_ordered(spark: SparkSession, path: str) -> DataFrame:
    """Read with the merge ordering applied (what the reference's readers see
    after a merge)."""
    return get(spark, path).orderBy("_client", "_seq", "_pos")
