"""Physical-layout utilities: file sizing, compaction, and sorted corpus
writes — the operational half of 100 TB performance.

Small files are the classic large-pipeline failure mode: a 100k-task job that
writes 100k × 2 MB parquet files makes every downstream scan pay 100k footer
reads and schedules 100k splits. The fixes are all write-side:

  compact_small_files — rewrite a directory to ~target-sized files
                        (repartition by size estimate + maxRecordsPerFile cap).
  write_corpus        — the opinionated corpus writer: zstd, optional sort
                        column (clusters values → tighter row-group min/max
                        stats → parquet predicate pushdown skips row groups),
                        optional partition columns, file-size capping.

Both are single-pass rewrites; neither collects anything to the driver.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def dir_file_stats(path: str) -> dict:
    """Parquet file census for a local/posix directory (for cluster storage,
    ask the filesystem — this helper backs the tests and local tooling)."""
    files = [
        f
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.isfile(f)
    ]
    sizes = [os.path.getsize(f) for f in files]
    return {
        "n_files": len(files),
        "total_bytes": sum(sizes),
        "min_bytes": min(sizes) if sizes else 0,
        "max_bytes": max(sizes) if sizes else 0,
    }


def compact_small_files(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    max_records_per_file: int | None = None,
) -> dict:
    """Rewrite a parquet directory into ~target-sized files.

    The output file count comes from the SOURCE's total size (compressed
    bytes are a good proxy for rewritten compressed bytes), so one pass
    suffices — no count() pre-scan of row widths. maxRecordsPerFile adds a
    hard cap for skewed row sizes. Returns before/after stats."""
    before = dir_file_stats(src_path)
    n_files = max(1, -(-before["total_bytes"] // target_file_bytes))  # ceil
    df = spark.read.parquet(src_path)
    writer = df.repartition(n_files).write.mode("overwrite")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(dest_path)
    return {"before": before, "after": dir_file_stats(dest_path), "target_files": n_files}


def write_corpus(
    df: DataFrame,
    path: str,
    sort_col: str | None = None,
    partition_cols: list[str] | None = None,
    n_files: int | None = None,
    codec: str = "zstd",
    max_records_per_file: int | None = None,
) -> None:
    """Opinionated corpus write: zstd (best ratio/speed for text at rest),
    optional within-file clustering on sort_col so parquet row-group min/max
    statistics make selective scans skip row groups, optional directory
    partitioning for partition pruning, and file sizing.

    sortWithinPartitions (NOT orderBy): clustering only needs local order —
    a global sort would add a range exchange whose only benefit is cross-file
    ordering no reader depends on."""
    out = df
    if n_files is not None:
        out = (
            out.repartition(n_files, *partition_cols)
            if partition_cols
            else out.repartition(n_files)
        )
    if sort_col is not None:
        out = out.sortWithinPartitions(sort_col)
    writer = out.write.mode("overwrite").option("compression", codec)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def interleave_bits(scaled: list[Column], bits: int) -> Column:
    """Morton (Z-order) key: interleave the low `bits` bits of each already-
    scaled non-negative integer column. Pure shift/mask arithmetic — one
    codegen'd expression, no UDF. len(scaled) * bits must fit in 63 bits."""
    n = len(scaled)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits overflows a signed 64-bit key")
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(scaled):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + i)
            )
    return z


def add_zorder_key(
    df: DataFrame, cols: list[str], bits: int = 12, key_col: str = "_zorder"
) -> DataFrame:
    """Append a Z-order key over numeric columns: each column is min/max
    linear-scaled to [0, 2^bits) and the bits interleaved.

    The min/max pass is one tiny aggregate (2 scalars per column to the
    driver — legitimate driver-side scalars, same class as k-means
    centroids). On a production lake you'd read these bounds from table
    metadata instead; the scaling itself stays fully distributed."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_mn_{c}"), F.max(c).alias(f"_mx_{c}")]
    row = df.agg(*aggs).first()
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        mn, mx = float(row[f"_mn_{c}"]), float(row[f"_mx_{c}"])
        span = (mx - mn) or 1.0
        s = F.least(
            F.lit(top).cast("long"),
            ((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * top).cast("long"),
        )
        scaled.append(F.greatest(F.lit(0).cast("long"), s))
    return df.withColumn(key_col, interleave_bits(scaled, bits))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 12,
    n_files: int = 32,
    codec: str = "zstd",
) -> None:
    """Z-order-clustered parquet write: range-partition + locally sort on the
    Morton key so EVERY clustered column gets tight per-file (and per-row-
    group) min/max statistics. A single-column sort gives perfect skipping on
    one predicate column and none on the others; Z-order trades a little of
    each for skipping on ALL of them — the multi-dimensional point/box-query
    layout (cf. Delta Lake OPTIMIZE ZORDER BY; this is the same construction
    from first principles).

    repartitionByRange samples the key (one extra pass over a sample, not the
    data) — at 100 TB that's the standard range-exchange cost, and the write
    itself is one shuffle + local sort."""
    keyed = add_zorder_key(df, cols, bits=bits)
    (
        keyed.repartitionByRange(n_files, "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
        .write.mode("overwrite")
        .option("compression", codec)
        .parquet(path)
    )
