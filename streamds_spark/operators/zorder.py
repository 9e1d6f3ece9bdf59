"""Z-order (Morton curve) utilities around io/layout.py's canonical
implementation (interleave_bits / add_zorder_key / write_zordered — the
clustered-write path lives THERE; this module adds the pieces needed for
cross-engine verification and pruning evidence):

  zorder_sql        — the same bit-interleave as layout.interleave_bits, as a
                      portable SQL string (valid in Spark SQL AND DuckDB), so
                      the key computation is oracle-checkable
                      (queries/extras.zorder_key_orders);
  zorder_py         — plain-Python reference for tests;
  layout_file_stats — per-file min/max of the clustered columns, i.e. what a
                      footer-stats pruner sees (the file-skipping evidence in
                      tests/test_zorder.py).

Why z-order at all: sorting a 100 TB table by (a) makes filters on a fast and
filters on b useless; interleaving the bits gives every file a bounded
rectangle in (a, b) space, so a reader filtering on EITHER column skips most
files from footer stats alone — the layout trick behind Delta/Iceberg
OPTIMIZE ZORDER, rebuilt on plain parquet. The curve math is textbook Morton
encoding (public knowledge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamds_spark.io.layout import write_zordered  # re-export: canonical writer

__all__ = ["zorder_sql", "zorder_py", "layout_file_stats", "write_zordered"]


def zorder_sql(xcol: str, ycol: str, bits: int = 16) -> str:
    """Morton-interleave SQL expression for two non-negative int expressions,
    valid in BOTH Spark SQL and DuckDB (only >>, <<, &, CAST, +). Bit b of x
    lands at position 2b, bit b of y at 2b+1 — the same layout as
    io/layout.interleave_bits([x, y], bits), which tests pin by equality.

    CONTRACT: inputs must already fit in `bits` bits (non-negative,
    < 2**bits). Wider values are silently TRUNCATED — high bits are dropped,
    so distinct (x, y) pairs can collide on the same zkey. Pre-mask at the
    call site (e.g. `col % 4096` for bits=12, as zorder_key_orders does);
    zorder_py raises on out-of-range inputs to catch this in tests."""
    terms = []
    for i in range(bits):
        terms.append(f"(((CAST({xcol} AS BIGINT) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((CAST({ycol} AS BIGINT) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_py(x: int, y: int, bits: int = 16) -> int:
    """Python reference for tests. Enforces the zorder_sql input contract
    (the SQL form silently truncates; the reference refuses instead)."""
    if not (0 <= x < (1 << bits) and 0 <= y < (1 << bits)):
        raise ValueError(
            f"zorder inputs must be in [0, 2**{bits}); got ({x}, {y}) — "
            "pre-mask the columns (zorder_sql truncates silently here)"
        )
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


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
