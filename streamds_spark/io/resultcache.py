"""Materialized result cache keyed by plan fingerprint — the warehouse
result-cache feature (Snowflake-style "same query, unchanged data → serve
the stored result") on plain parquet.

Fingerprint = sha256 of
  * the CANONICALIZED analyzed plan (Spark normalizes exprIds to `none#N`,
    so the same logical query from any session hashes identically while a
    changed filter literal or column set hashes differently), and
  * every input file's (path, size, mtime) from `df.inputFiles()` — data
    changes invalidate without any notification channel.

Safety rail: a plan with NO input files (createDataFrame / views over
in-memory data) is never cached — `inputFiles()` cannot see that data, so
a stored result could go stale invisibly. `cached()` computes it fresh
and reports `hit=False, cacheable=False`.

At 100 TB this is the cheap end of incremental computation: the repeated
dashboard/report query costs one parquet read of its RESULT instead of a
corpus scan, and the first run after an ingest batch recomputes exactly
because the part-file listing moved.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame


def plan_fingerprint(df: DataFrame) -> tuple[str, bool]:
    """(fingerprint hex, cacheable). Driver-side only — no jobs."""
    canon = df._jdf.queryExecution().analyzed().canonicalized().toString()  # noqa: SLF001
    files = sorted(df.inputFiles())
    stats = []
    for f in files:
        path = f[len("file:") :] if f.startswith("file:") else f
        try:
            st = os.stat(path)
            stats.append([f, st.st_size, int(st.st_mtime)])
        except OSError:
            stats.append([f, -1, -1])
    payload = json.dumps([canon, stats], sort_keys=True)
    return hashlib.sha256(payload.encode()).hexdigest()[:32], bool(files)


@dataclass
class CacheResult:
    df: DataFrame
    hit: bool
    cacheable: bool
    fingerprint: str


def cached(df: DataFrame, cache_dir: str) -> CacheResult:
    """Serve `df`'s result from the cache when the fingerprint matches a
    stored run; otherwise materialize it there (parquet + _SUCCESS marker —
    a torn write is never visible) and serve the fresh copy."""
    fp, cacheable = plan_fingerprint(df)
    if not cacheable:
        return CacheResult(df=df, hit=False, cacheable=False, fingerprint=fp)
    dest = os.path.join(cache_dir, fp)
    spark = df.sparkSession
    if os.path.exists(os.path.join(dest, "_SUCCESS")):
        return CacheResult(
            df=spark.read.parquet(dest), hit=True, cacheable=True, fingerprint=fp
        )
    df.write.mode("overwrite").parquet(dest)
    return CacheResult(
        df=spark.read.parquet(dest), hit=False, cacheable=True, fingerprint=fp
    )
