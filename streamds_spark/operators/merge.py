"""Batch MERGE (upsert/delete) — the incremental-maintenance primitive the
reference's append-only HyDFS store cannot express (appendFile/mergeFile only
concatenate, `misc/hydfs_utils.go` append path): StreamDS users rewrite whole
tables to change a row. Here MERGE is a single full-outer shuffle join.

Semantics (Delta/Iceberg MERGE INTO subset):
  - matched  + delete flag        -> row removed
  - matched  + no delete          -> update_cols taken from changes (others kept)
  - not matched in base           -> change row inserted (unless delete flag)
  - not matched in changes        -> base row kept verbatim

Scale posture: one shuffle of each side on the merge key — the minimum any
engine pays for an upsert. Full-outer join cannot broadcast, but when the base
table is bucketed on the key (io/sinks.write_bucketed) its side of the exchange
disappears; the changes side is usually tiny. AQE handles skewed keys. No
driver-side state, no collect.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_into(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    update_cols: Sequence[str],
    delete_col: str = "is_delete",
) -> DataFrame:
    """Apply `changes` onto `base` by `key`. `changes` must carry every base
    column plus a boolean `delete_col`. Returns the merged table with base's
    column order."""
    b, c = base.alias("b"), changes.alias("c")
    joined = b.join(c, F.col(f"b.{key}") == F.col(f"c.{key}"), "full_outer")
    # Any row the changes side marks deleted drops out — matched (true delete)
    # or unmatched (delete of an absent key: a no-op that must not insert).
    kept = joined.filter(~F.coalesce(F.col(f"c.{delete_col}"), F.lit(False)))
    inserted = F.col(f"b.{key}").isNull()
    out = []
    for col in base.columns:
        bc, cc = F.col(f"b.{col}"), F.col(f"c.{col}")
        if col == key:
            out.append(F.coalesce(bc, cc).alias(col))
        elif col in update_cols:
            out.append(F.when(inserted, cc).otherwise(F.coalesce(cc, bc)).alias(col))
        else:
            out.append(F.when(inserted, cc).otherwise(bc).alias(col))
    return kept.select(*out)
