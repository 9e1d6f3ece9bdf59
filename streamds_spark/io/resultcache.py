"""Materialized result cache keyed by plan fingerprint — the warehouse
result-cache feature (Snowflake-style "same query, unchanged data → serve
the stored result") on plain parquet.

Fingerprint = sha256 of
  * the CANONICALIZED analyzed plan (Spark normalizes exprIds to `none#N`,
    so the same logical query from any session hashes identically while a
    changed filter literal or column set hashes differently), and
  * every input file's (path, size, mtime_ns) from `df.inputFiles()` — data
    changes invalidate without any notification channel — EXCEPT files that
    live inside an append-log table (io/appendlog.py), which are keyed on
    the log's LOGICAL batch identities instead: the union of committed
    batch/txn/chunk identities is invariant under merge/compaction (the
    rewrite changes files, not results, so the cache survives it) and gains
    a member on any genuine append (which correctly misses). Object-store
    deployments get the same win: manifest identity needs no stat()/mtime
    semantics from the storage layer.

Safety rails — `cached()` computes fresh and reports `cacheable=False` when
  * the plan has NO input files (createDataFrame / views over in-memory
    data): `inputFiles()` cannot see that data, so a stored result could go
    stale invisibly; or
  * the plan contains a non-deterministic or time-dependent expression
    (`rand`, `uuid`, `current_date`, `current_timestamp`,
    `monotonically_increasing_id`, `input_file_name`, ...): such a query
    canonicalizes identically tomorrow over unchanged files, so a stored
    result would silently freeze "now". Detected by walking the analyzed
    plan's expression classes (`analyzed().toJSON()`), not by string-
    matching the plan text — a column NAMED `rand_x` never false-positives.

At 100 TB this is the cheap end of incremental computation: the repeated
dashboard/report query costs one parquet read of its RESULT instead of a
corpus scan, and the first run after an ingest batch recomputes exactly
because the part-file listing (or the log manifest) moved.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame

from streamds_spark.io import appendlog

# Catalyst expression classes whose value depends on run time, randomness, or
# physical placement — any occurrence makes a plan's RESULT non-reproducible
# from (plan, input data) alone, so it must never be served from the cache.
_NONDETERMINISTIC_EXPRS = frozenset(
    {
        # randomness (seeded rand() still varies with partition layout/time
        # of evaluation relative to other runs — never cache)
        "Rand",
        "Randn",
        "RandStr",
        "Uuid",
        "Shuffle",
        # physical placement / ids
        "MonotonicallyIncreasingID",
        "SparkPartitionID",
        "InputFileName",
        "InputFileBlockStart",
        "InputFileBlockLength",
        # time- and session-dependent
        "CurrentDate",
        "CurrentTimestamp",
        "Now",
        "LocalTimestamp",
        "CurrentTimeZone",
        "CurrentUser",
        "SessionUser",
        "CurrentDatabase",
        "CurrentCatalog",
        "CurrentBatchTimestamp",
    }
)


def nondeterministic_classes(df: DataFrame) -> set[str]:
    """Simple names of non-deterministic/time-dependent expression classes
    appearing anywhere in the analyzed plan (empty set → safe to cache).
    Driver-side only — walks the plan's JSON rendering, no jobs."""
    tree = json.loads(df._jdf.queryExecution().analyzed().toJSON())  # noqa: SLF001
    found: set[str] = set()

    def walk(o) -> None:
        if isinstance(o, dict):
            c = o.get("class")
            if isinstance(c, str):
                simple = c.rsplit(".", 1)[-1]
                if simple in _NONDETERMINISTIC_EXPRS:
                    found.add(simple)
            for v in o.values():
                walk(v)
        elif isinstance(o, list):
            for v in o:
                walk(v)

    walk(tree)
    return found


def plan_fingerprint(df: DataFrame) -> tuple[str, bool]:
    """(fingerprint hex, cacheable). Driver-side only — no jobs."""
    canon = df._jdf.queryExecution().analyzed().canonicalized().toString()  # noqa: SLF001
    files = sorted(df.inputFiles())
    stats = []
    logical: set[str] = set()
    for f in files:
        path = f[len("file:") :] if f.startswith("file:") else f
        ident = appendlog.file_logical_identity(path)
        if ident is not None:
            root, entries = ident
            logical.update(f"{root}::{e}" for e in entries)
            continue
        try:
            st = os.stat(path)
            stats.append([f, st.st_size, st.st_mtime_ns])
        except OSError:
            stats.append([f, -1, -1])
    payload = json.dumps([canon, stats, sorted(logical)], sort_keys=True)
    fp = hashlib.sha256(payload.encode()).hexdigest()[:32]
    cacheable = bool(files) and not nondeterministic_classes(df)
    return fp, cacheable


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
