"""Incremental aggregate maintenance: refresh a persisted rollup from a new
batch of facts WITHOUT rescanning history — the materialized-view-maintenance
primitive behind every incremental dashboard/feature-store pipeline.

Only distributive/algebraic aggregates participate (count, sum, min, max —
avg is maintained as sum+count and finalized at read): each is mergeable per
group, so refresh = aggregate ONLY the delta batch, then full-outer merge
with the stored rollup and combine per column. Cost scales with the delta
and the touched key set, never with history size.

Scale posture: the delta aggregate is one partial-agg shuffle over the batch;
the merge joins rollup⋈delta on the group keys — with the rollup stored
bucketed by those keys (io/sinks.write_bucketed) the join is exchange-free on
the stored side, and at 100 TB the rollup table is keys-sized, not
facts-sized. Holes (keys only in one side) coalesce to the other side's
values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# aggregate name -> (delta aggregation fn, merge fn over (old, new))
_MERGEABLE = {
    "count": (
        lambda c: F.count(c),
        lambda o, n: F.coalesce(o, F.lit(0)) + F.coalesce(n, F.lit(0)),
    ),
    "sum": (
        lambda c: F.sum(c),
        lambda o, n: F.when(o.isNull(), n).when(n.isNull(), o).otherwise(o + n),
    ),
    "min": (
        lambda c: F.min(c),
        lambda o, n: F.when(o.isNull(), n).when(n.isNull(), o).otherwise(F.least(o, n)),
    ),
    "max": (
        lambda c: F.max(c),
        lambda o, n: F.when(o.isNull(), n)
        .when(n.isNull(), o)
        .otherwise(F.greatest(o, n)),
    ),
}


def aggregate_delta(
    batch: DataFrame, keys: list[str], aggs: dict[str, tuple[str, str]]
) -> DataFrame:
    """Aggregate one delta batch: aggs maps output column -> (agg, input col),
    e.g. {"n": ("count", "*"), "total": ("sum", "value")}."""
    exprs = []
    for out, (agg, col) in aggs.items():
        if agg not in _MERGEABLE:
            raise ValueError(
                f"{agg!r} is not incrementally mergeable (use count/sum/min/max; "
                "maintain avg as sum+count)"
            )
        exprs.append(_MERGEABLE[agg][0](col).alias(out))
    return batch.groupBy(*keys).agg(*exprs)


def refresh_rollup(
    rollup: DataFrame,
    batch: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
) -> DataFrame:
    """Merge a persisted rollup with a new facts batch; returns the updated
    rollup (same schema: keys + agg columns)."""
    delta = aggregate_delta(batch, keys, aggs)
    old = rollup.select(
        *keys, *[F.col(o).alias(f"_old_{o}") for o in aggs]
    )
    new = delta.select(*keys, *[F.col(o).alias(f"_new_{o}") for o in aggs])
    merged = old.join(new, keys, "full_outer")
    out_cols = [
        _MERGEABLE[agg][1](F.col(f"_old_{o}"), F.col(f"_new_{o}")).alias(o)
        for o, (agg, _) in aggs.items()
    ]
    return merged.select(*keys, *out_cols)
