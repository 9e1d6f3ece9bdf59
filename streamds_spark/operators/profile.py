"""Table profiling: one-scan per-column statistics (null counts, approximate
distincts, min/max, numeric moments) — the pipeline-health primitive run
before/after every transformation stage of a data pipeline.

Scale: ALL columns profile in a single pass (one scan, one 1-row aggregate);
distinct counts use HLL sketches so the aggregate state is bounded regardless
of cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def profile_table(df: DataFrame) -> DataFrame:
    """Returns one row per column: (column, dtype, n_rows, n_nulls,
    approx_distinct, min_str, max_str, mean, stddev). Numeric-only stats are
    NULL for non-numeric columns. One job, one scan."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for f in df.schema.fields:
        c = f.name
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls"))
        aggs.append(F.approx_count_distinct(c).alias(f"{c}__distinct"))
        aggs.append(F.min(F.col(c).cast("string")).alias(f"{c}__min"))
        aggs.append(F.max(F.col(c).cast("string")).alias(f"{c}__max"))
        if isinstance(f.dataType, NumericType):
            aggs.append(F.avg(c).alias(f"{c}__mean"))
            aggs.append(F.stddev_samp(c).alias(f"{c}__sd"))
    row = df.agg(*aggs).collect()[0].asDict()
    spark = df.sparkSession
    out = []
    for f in df.schema.fields:
        c = f.name
        out.append(
            (
                c,
                f.dataType.simpleString(),
                row["__n"],
                row[f"{c}__nulls"],
                row[f"{c}__distinct"],
                row[f"{c}__min"],
                row[f"{c}__max"],
                float(row[f"{c}__mean"]) if row.get(f"{c}__mean") is not None else None,
                float(row[f"{c}__sd"]) if row.get(f"{c}__sd") is not None else None,
            )
        )
    return spark.createDataFrame(
        out,
        "column string, dtype string, n_rows bigint, n_nulls bigint, "
        "approx_distinct bigint, min_str string, max_str string, "
        "mean double, stddev double",
    )
