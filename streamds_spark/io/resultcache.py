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
import shutil
import uuid
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


# Python-evaluated expression/plan classes: the function BODY lives in pickled
# Python bytecode that the canonicalized plan fingerprint cannot see (the plan
# prints only the udf's NAME), so two different functions with one name would
# collide and an edited udf would never invalidate. Never cache these.
_PYTHON_EVAL_MARKERS = (
    "PythonUDF",
    "PythonUDAF",
    "PythonUDTF",
    "InPandas",  # FlatMapGroupsInPandas, MapInPandas, ...WithState
    "InArrow",
    "PythonMap",
    "PythonFlatMap",
)


def nondeterministic_classes(df: DataFrame) -> set[str]:
    """Simple names of expression/plan classes that make the plan unsafe to
    cache (empty set → safe). Driver-side only, no jobs. Three detectors:

    * the named Catalyst non-deterministic/time-dependent class list;
    * any Python-evaluated expression or plan node (`PythonUDF`, grouped-map
      pandas, ...): the fingerprint cannot capture the Python function body;
    * catch-all for anything the list misses (future Catalyst expressions,
      `asNondeterministic()` udfs): any JSON node carrying
      `udfDeterministic: false`, plus a JVM walk asserting every plan node's
      top-level expressions report `deterministic == true` (an Expression's
      flag already folds in its expression children).
    """
    tree = json.loads(df._jdf.queryExecution().analyzed().toJSON())  # noqa: SLF001
    found: set[str] = set()

    def walk(o) -> None:
        if isinstance(o, dict):
            c = o.get("class")
            if isinstance(c, str):
                simple = c.rsplit(".", 1)[-1]
                if simple in _NONDETERMINISTIC_EXPRS:
                    found.add(simple)
                if any(m in simple for m in _PYTHON_EVAL_MARKERS):
                    found.add(simple)
            if o.get("udfDeterministic") is False:
                found.add("udfDeterministic:false")
            for v in o.values():
                walk(v)
        elif isinstance(o, list):
            for v in o:
                walk(v)

    walk(tree)
    found.update(_jvm_nondeterministic_nodes(df))
    return found


def _jvm_nondeterministic_nodes(df: DataFrame) -> set[str]:
    """Recurse the analyzed LogicalPlan via the JVM handle and return the
    node class names whose top-level expressions are not all deterministic —
    the authoritative Catalyst flag, covering expressions no list names."""
    found: set[str] = set()

    def visit(plan) -> None:
        exprs = plan.expressions()
        for i in range(exprs.size()):
            try:
                det = exprs.apply(i).deterministic()
            except Exception:  # unresolved/exotic expression: be conservative
                det = False
            if not det:
                found.add(plan.getClass().getSimpleName())
                break
        kids = plan.children()
        for i in range(kids.size()):
            visit(kids.apply(i))
        # subqueries hang off expressions, not children; the JSON walk plus
        # Catalyst's own deterministic folding cover scalar-subquery bodies.

    visit(df._jdf.queryExecution().analyzed())  # noqa: SLF001
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
    # Concurrent misses on one fingerprint must not interleave delete-then-
    # write sequences under one directory: materialize into a writer-unique
    # temp dir, then atomically promote via rename. Outcomes:
    #   * rename wins            -> serve dest, nothing to clean;
    #   * loser (dest complete)  -> drop own temp, serve the winner's
    #     identical-fingerprint copy;
    #   * dest torn (no _SUCCESS: a pre-temp-dir-era crash) -> clear the
    #     wreck and retry the promotion once; if another racer beat us to
    #     the retry, fall back to serving the private temp dir.
    tmp = f"{dest}.tmp-{uuid.uuid4().hex}"
    df.write.mode("overwrite").parquet(tmp)
    serve = tmp
    try:
        os.rename(tmp, dest)
        serve = dest
    except OSError:
        if os.path.exists(os.path.join(dest, "_SUCCESS")):
            shutil.rmtree(tmp, ignore_errors=True)
            serve = dest
        else:
            shutil.rmtree(dest, ignore_errors=True)
            try:
                os.rename(tmp, dest)
                serve = dest
            except OSError:
                serve = (
                    dest
                    if os.path.exists(os.path.join(dest, "_SUCCESS"))
                    else tmp
                )
                if serve == dest:
                    shutil.rmtree(tmp, ignore_errors=True)
    return CacheResult(
        df=spark.read.parquet(serve), hit=False, cacheable=True, fingerprint=fp
    )
