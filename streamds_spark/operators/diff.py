"""Snapshot diff: row-level added/removed/changed between two versions of a
keyed table — the audit complement of MERGE (operators/merge.py applies a
change set; this recovers one). The pattern a 100 TB lake uses to validate a
backfill or reconcile replicas before promoting a snapshot.

Plan: ONE full-outer shuffle join on the key columns; change detection is a
null-safe column comparison (IS DISTINCT FROM), so no hashing pass and no
second scan. Unchanged rows are dropped before any downstream aggregation,
which at reconciliation time is almost all of them — the join output that
survives is change-set-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: "list[str]",
    compare_cols: "list[str] | None" = None,
) -> DataFrame:
    """Rows keyed by `keys` with change_type in {'added','removed','changed'}
    (unchanged rows are filtered out). Non-key columns are compared null-safe;
    pass compare_cols to restrict the comparison (e.g. ignore audit columns).
    """
    cols = compare_cols or [c for c in old.columns if c not in keys]
    # explicit presence markers instead of key-null checks, so the diff stays
    # correct even for tables whose key columns can hold NULLs
    o = old.withColumn("_in_old", F.lit(True)).alias("o")
    n = new.withColumn("_in_new", F.lit(True)).alias("n")
    cond = [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in keys]
    joined = o.join(n, cond, "full_outer")

    in_old = F.col("o._in_old").isNotNull()
    in_new = F.col("n._in_new").isNotNull()
    differs = F.lit(False)
    for c in cols:
        differs = differs | ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))

    change = (
        F.when(in_old & ~in_new, F.lit("removed"))
        .when(~in_old & in_new, F.lit("added"))
        .when(differs, F.lit("changed"))
    )
    key_cols = [
        F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k) for k in keys
    ]
    return joined.select(*key_cols, change.alias("change_type")).filter(
        F.col("change_type").isNotNull()
    )
