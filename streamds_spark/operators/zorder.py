"""Z-order (Morton curve) layout: multi-dimensional data clustering so
parquet min/max statistics prune files on EITHER dimension of a 2-column
predicate.

Sorting a 100 TB table by (a) makes filters on a fast and filters on b
useless; interleaving the bits of a and b and range-partitioning on that key
gives every file a bounded rectangle in (a, b) space, so a reader filtering on
either column can skip most files from footer stats alone — the layout trick
behind Delta/Iceberg OPTIMIZE ZORDER, rebuilt here on plain parquet.

The curve math is textbook Morton encoding (public knowledge); the layout
write is repartitionByRange + sortWithinPartitions, which at cluster scale is
one range-exchange — the same cost as any global sort, paid once at write
time, amortized over every pruned read after.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def zorder_sql(xcol: str, ycol: str, bits: int = 16) -> str:
    """Morton-interleave SQL expression for two non-negative int expressions,
    valid in BOTH Spark SQL and DuckDB (only >>, <<, &, CAST, +): bit i of x
    lands at position 2i, bit i of y at 2i+1."""
    terms = []
    for i in range(bits):
        terms.append(f"(((CAST({xcol} AS BIGINT) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((CAST({ycol} AS BIGINT) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_key(xcol: str, ycol: str, bits: int = 16) -> Column:
    """Column form of zorder_sql (codegen'd arithmetic, no UDF)."""
    return F.expr(zorder_sql(xcol, ycol, bits))


def zorder_py(x: int, y: int, bits: int = 16) -> int:
    """Python reference for tests."""
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def write_zorder_layout(
    df: DataFrame,
    xcol: str,
    ycol: str,
    path: str,
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Write df as parquet clustered on the Morton key of (xcol, ycol).

    Both columns are min/max-normalized to [0, 2^bits) first (two scalar
    aggregates — a driver-side stat read, same posture as broadcast stat
    joins), then rows are range-partitioned AND sorted by the interleaved key,
    so each output file covers a compact z-range => a bounded rectangle in
    (x, y) space => parquet footer min/max on BOTH columns are tight.
    """
    lo_hi = df.agg(
        F.min(xcol).alias("xlo"),
        F.max(xcol).alias("xhi"),
        F.min(ycol).alias("ylo"),
        F.max(ycol).alias("yhi"),
    ).collect()[0]
    scale = (1 << bits) - 1

    def _norm(col: str, lo, hi) -> Column:
        span = float(hi - lo) if hi != lo else 1.0
        return F.floor((F.col(col) - F.lit(lo)) / F.lit(span) * scale).cast("bigint")

    keyed = df.withColumn("__zx", _norm(xcol, lo_hi.xlo, lo_hi.xhi)).withColumn(
        "__zy", _norm(ycol, lo_hi.ylo, lo_hi.yhi)
    )
    keyed = keyed.withColumn("__zkey", zorder_key("__zx", "__zy", bits))
    (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zx", "__zy", "__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def layout_file_stats(spark: SparkSession, path: str, xcol: str, ycol: str) -> DataFrame:
    """Per-file min/max of both layout columns (what a footer-stats pruner
    sees): the file-skipping evidence for a given predicate is `files whose
    [min,max] interval intersects the predicate range`."""
    return (
        spark.read.parquet(path)
        .select(xcol, ycol, F.col("_metadata.file_path").alias("file"))
        .groupBy("file")
        .agg(
            F.min(xcol).alias("xmin"),
            F.max(xcol).alias("xmax"),
            F.min(ycol).alias("ymin"),
            F.max(ycol).alias("ymax"),
        )
    )
