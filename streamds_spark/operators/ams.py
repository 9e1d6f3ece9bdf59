"""AMS "tug-of-war" sketch — the mergeable second-frequency-moment state
(F2 = sum over values of frequency^2, the SELF-JOIN SIZE).

What the sketch family gains: HLL answers |distinct|, KMV answers
|A ∩ B|, Misra-Gries answers "who is heavy" — none answers "how big is
the join". F2 is the classic join/self-join size estimate a distributed
optimizer wants before committing to a shuffle strategy (skewed keys =
large F2), and the exact answer needs a full groupBy over the key space.

State: k integer counters c_j = Σ_v f_v · s_j(v), with s_j(v) ∈ {−1, +1}
the j-th bit of a deterministic md5 hash of the value. Because
Σ_rows s_j(v) telescopes the frequencies, the counters compute in ONE
scan with NO frequency table — a single k-expression aggregate that
map-side combine collapses to k integers per task at any input size.
E[c_j²] = F2 exactly (Alon–Matias–Szegedy, STOC'96), so the estimator is
mean-of-squares; Var ≤ 2·F2²/k gives ~1/√k relative error.

Mergeability is plain addition: counters over shards sum to the whole-
input counters EXACTLY (same hash, linear state) — per-shard state is
k BIGINTs forever, the same 100 TB posture as the HLL register tables.

Determinism: signs come from md5 bits (functions/hashing.py), identical
in Spark and DuckDB, so the counters — and therefore the estimate — are
hash-exact against a SQL replay, not merely close.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from streamds_spark.functions.hashing import duckdb_md5_int, md5_int60

_MAX_K = 60  # md5_int60 yields 60 usable sign bits


def _sign_expr(j: int) -> Column:
    # bit j of the 60-bit hash mapped to {-1, +1}
    return F.expr(f"2 * ((_ams_h >> {j}) & 1) - 1")


def ams_counters(
    df: DataFrame, value_col: str, k: int = 32, group_cols: "tuple[str, ...]" = ()
) -> DataFrame:
    """Long-format sketch: one row per (group..., j) with counter c —
    computed in one scan as k conditional sums (no frequency table).
    NULL values are skipped (they are not a frequency)."""
    if not 1 <= k <= _MAX_K:
        raise ValueError(f"ams_counters: k must be in [1, {_MAX_K}], got {k}")
    src = df.filter(F.col(value_col).isNotNull()).withColumn(
        "_ams_h", md5_int60(F.col(value_col))
    )
    aggs = [
        F.sum(_sign_expr(j)).cast("bigint").alias(f"_c{j}") for j in range(k)
    ]
    wide = src.groupBy(*group_cols).agg(*aggs) if group_cols else src.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("j"),
                F.coalesce(F.col(f"_c{j}"), F.lit(0)).alias("c"),
            )
            for j in range(k)
        ]
    )
    cols = [*group_cols, F.explode(entries).alias("e")]
    return wide.select(*cols).select(*group_cols, "e.j", "e.c")


def ams_merge(counters: DataFrame, group_cols: "tuple[str, ...]" = ()) -> DataFrame:
    """Fold shard sketches (extra grouping columns beyond `group_cols` are
    summed away): linear state, so the fold equals the whole-input sketch
    exactly."""
    return counters.groupBy(*group_cols, "j").agg(
        F.sum("c").cast("bigint").alias("c")
    )


def ams_f2_estimate(
    counters: DataFrame, group_cols: "tuple[str, ...]" = ()
) -> DataFrame:
    """Mean-of-squares estimator per group: (n_counters, sum_c_sq,
    f2_estimate). sum_c_sq is an exact BIGINT; the estimate is the one
    IEEE division, rounded."""
    agg = counters.groupBy(*group_cols).agg(
        F.count("*").cast("bigint").alias("n_counters"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sum_c_sq"),
    )
    return agg.withColumn(
        "f2_estimate",
        F.expr(
            "round(CAST(sum_c_sq AS DOUBLE) / CAST(n_counters AS DOUBLE), 4)"
            " + 0.0"
        ),
    )


def duckdb_ams_counter_sql(value_expr: str, j: int) -> str:
    """DuckDB fragment replaying counter j over rows of `value_expr`
    (exactly _sign_expr over duckdb_md5_int)."""
    h = duckdb_md5_int(value_expr)
    return f"CAST(sum(2 * (({h} >> {j}) & 1) - 1) AS BIGINT)"
