"""Tombstone store: takedown / delete propagation for append-only state.

The streaming stores (corpus appendlog, dedup hash/bucket stores, CDC chunk
store, bottom-k sample store, ANN/IVF index dirs) are append-only by
design — overwrite-by-batchId idempotence and replay safety all hang off
never mutating a committed dir. That discipline makes DELETION a first-class
problem: a taken-down document would otherwise live forever in every store
that ever saw it. (Reference scope note: StreamDS's HyDFS is append-only
with merge — `core_process_utils.go` mergeFile — and has no delete; this is
the capability a real training-data pipeline adds on top.)

Design — the classic LSM answer, expressed in the repo's own idioms:

* a DELETE is an append: `add()` writes a small parquet of keys under
  `<store>/tombstones/t-<fold_after>-<ns>-<uuid>/` (commit marker =
  `_SUCCESS`, same torn-write rule as every other store dir). Nothing
  committed is ever mutated.
* READERS subtract: every reader of the store anti-joins the union of
  committed tombstone keys (`apply()`). The tombstone side is tiny relative
  to the corpus, so Spark's size-based planning broadcasts it — the read
  cost of deletion is one broadcast-anti-join, never a rewrite.
* COMPACTION folds: when a maintenance pass rewrites the store anyway
  (segment fold / appendlog merge), it applies the tombstones to the
  rewrite, so the bytes physically disappear; the tombstone dirs whose
  coverage is fully folded are then GC'd with a ONE-CYCLE grace (staged in
  `_FOLDED.txt`, deleted on the NEXT pass — an in-flight reader that listed
  them finishes its anti-join; the appendlog merge-GC discipline).

Fold-eligibility (`fold_after`): streaming replay can REWRITE a batch dir
above the checkpoint's durable frontier with its original (pre-delete)
content. A tombstone may therefore only be GC'd once compaction has folded
every batch that could carry pre-delete rows: the caller records
`fold_after = durable_frontier_at_delete + 1` (micro-batches are serial, so
the one in-flight batch at delete time is `frontier + 1`; nothing later can
contain pre-delete data under the no-key-reuse doctrine below), and a fold
with `upto >= fold_after` both rewrote those batches with the filter applied
and made them unreplayable (compaction only folds at/below the durable
frontier). `fold_after = 0` marks a tombstone foldable by any pass
(single-writer batch logs with no replay source).

Doctrine (documented, not enforced): deleted keys are never reused. Rows
for a tombstoned key in batches ingested AFTER the delete would be
suppressed while the tombstone lives and reappear after it folds; unique
ids (the norm for content-addressed corpora) make the case vacuous.

Sketch stores (HLL registers, HDR registers) cannot subtract — see
`streaming/llm_pipeline.rebuild_sketch_stores` for the documented
rebuild-affected-state answer.
"""

from __future__ import annotations

import glob as _glob
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DIRNAME = "tombstones"
_FOLDED = "_FOLDED.txt"


def root(store_path: str) -> str:
    return os.path.join(store_path, DIRNAME)


def committed_dirs(store_path: str) -> list[tuple[str, int]]:
    """[(dir, fold_after)] for committed tombstone dirs, name-sorted (names
    embed a monotonic timestamp, so this is creation order)."""
    out = []
    for d in sorted(_glob.glob(os.path.join(root(store_path), "t-*"))):
        if not os.path.exists(os.path.join(d, "_SUCCESS")):
            continue
        parts = os.path.basename(d).split("-")
        try:
            fold_after = int(parts[1])
        except (IndexError, ValueError):
            fold_after = 2**62  # unparseable: keep forever (suppress-safe)
        out.append((d, fold_after))
    return out


def add(
    spark: SparkSession,
    store_path: str,
    key_col: str,
    keys,
    fold_after: int = 0,
) -> str:
    """Append one tombstone dir of deleted keys. `keys` is a list of scalar
    values or a DataFrame whose FIRST column is the key (written via Spark —
    a mass takedown list never passes through the driver). One store has ONE
    key column: a second add() with a different name is refused (readers
    infer the anti-join column from the stored schema)."""
    existing = committed_dirs(store_path)
    if existing:
        prev_key = (
            spark.read.parquet(existing[0][0]).schema.fieldNames()[0]
        )
        if prev_key != key_col:
            raise ValueError(
                f"tombstone store {store_path!r} is keyed on {prev_key!r}; "
                f"cannot add keys for {key_col!r}"
            )
    if isinstance(keys, DataFrame):
        df = keys.select(F.col(keys.columns[0]).alias(key_col)).distinct()
    else:
        vals = list(keys)
        if not vals:
            raise ValueError("empty delete set")
        df = spark.createDataFrame([(v,) for v in vals]).toDF(key_col).distinct()
    name = f"t-{int(fold_after)}-{time.monotonic_ns()}-{uuid.uuid4().hex[:8]}"
    dest = os.path.join(root(store_path), name)
    df.coalesce(1).write.parquet(dest)  # _SUCCESS = commit point
    return dest


def keys_df(
    spark: SparkSession, store_path: str
) -> "tuple[str, DataFrame] | None":
    """(key_col, distinct deleted keys) over every committed tombstone dir,
    or None when the store has no tombstones. One parquet relation — the
    dirs share one single-column schema by add()'s contract."""
    dirs = [d for d, _ in committed_dirs(store_path)]
    if not dirs:
        return None
    df = spark.read.parquet(*dirs)
    key = df.schema.fieldNames()[0]
    return key, df.select(key).distinct()


def apply(df: DataFrame, store_path: str) -> DataFrame:
    """Subtract the store's tombstoned keys from `df` (anti-join on the
    tombstones' own key column, which `df` must carry). No tombstones ->
    `df` unchanged, zero plan overhead. The tombstone side is a handful of
    small parquet files, so Spark's size-based planning broadcasts it."""
    t = keys_df(df.sparkSession, store_path)
    if t is None:
        return df
    key, tdf = t
    return df.join(tdf, on=key, how="left_anti")


def suppressed_count(spark: SparkSession, store_path: str, df: DataFrame) -> int:
    """How many distinct tombstoned keys actually occur in `df` — the
    exactness-audit input for bounded-state readers (corpus_sample)."""
    t = keys_df(spark, store_path)
    if t is None:
        return 0
    key, tdf = t
    return df.select(key).join(tdf, on=key, how="left_semi").distinct().count()


def eligible_dirs(store_path: str, upto: "int | None") -> list[str]:
    """Tombstone dirs a fold reaching `upto` fully covers (fold_after <=
    upto). `upto=None` means the caller rewrote EVERYTHING and no replay
    source exists (single-writer batch log): every committed dir is
    eligible."""
    return [
        d
        for d, fold_after in committed_dirs(store_path)
        if upto is None or fold_after <= upto
    ]


def gc_then_stage(store_path: str, folded: list[str]) -> int:
    """The one-cycle-grace GC step, called AFTER a fold commits: physically
    delete the dirs the PREVIOUS fold staged (every reader that could have
    listed them has had a full fold cycle to finish), then stage `folded`
    (this fold's fully-covered dirs) for the next pass. Staged dirs remain
    committed and visible — readers keep applying them until the delete,
    which only ever removes already-physically-folded keys. Returns the
    number of dirs deleted."""
    r = root(store_path)
    marker = os.path.join(r, _FOLDED)
    deleted = 0
    try:
        with open(marker) as f:
            prev = [ln.strip() for ln in f if ln.strip()]
    except OSError:
        prev = []
    for name in prev:
        d = os.path.join(r, name)
        if os.path.isdir(d):
            shutil.rmtree(d, ignore_errors=True)
            deleted += 1
    names = sorted(os.path.basename(d) for d in folded if os.path.isdir(d))
    if names:
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write("\n".join(names) + "\n")
        os.replace(tmp, marker)
    elif prev:
        try:
            os.remove(marker)
        except OSError:
            pass
    return deleted
