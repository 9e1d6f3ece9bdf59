"""Generic distributed as-of join (trades/quotes lookup): for each left row,
the most recent right row with right.ts <= left.ts on the same key.

The naive formulation — an inequality join + per-row argmax — explodes to
O(|L|·|R|) per key before aggregating. This operator instead UNIONS the two
sides with a tag, sorts each key's timeline once, and forward-fills the last
right payload over a running window:

    one shuffle on the key, O(|L|+|R|) rows total, no inequality join.

Equal timestamps are inclusive (a right row AT the left row's timestamp
matches), implemented by ordering right rows before left rows within a tie —
the same semantics as DuckDB's `ASOF JOIN ... ON l.k = r.k AND l.t >= r.t`,
which tests/test_property_oracle.py uses as a differential oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Backward inclusive as-of join. Returns every left row plus the payload
    columns of the latest right row with right_ts <= left_ts on `on`; right
    payload columns are NULL when no prior right row exists. Right payload =
    all right columns except the key and timestamp."""
    payload_cols = [c for c in right.columns if c not in on and c != right_ts]
    r = right.select(
        *on,
        F.col(right_ts).alias("_t"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_payload"),
        F.lit(1).alias("_is_r"),
    )
    left_cols = left.columns
    l = left.select(
        *on,
        F.col(left_ts).alias("_t"),
        F.struct(*[F.col(c) for c in left_cols if c not in on]).alias("_lrow"),
        F.lit(0).alias("_is_r"),
    )
    u = l.withColumn("_payload", F.lit(None).cast(r.schema["_payload"].dataType)).unionByName(
        r.withColumn("_lrow", F.lit(None).cast(l.schema["_lrow"].dataType))
    )
    # right rows sort BEFORE left rows at equal _t → inclusive match
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t").asc(), F.col("_is_r").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
    out_cols: list[Column] = [F.col(c) for c in on]
    out_cols += [F.col(f"_lrow.{c}").alias(c) for c in left_cols if c not in on]
    out_cols += [F.col(f"_match.{c}").alias(c) for c in payload_cols]
    return filled.filter(F.col("_is_r") == 0).select(*out_cols)
