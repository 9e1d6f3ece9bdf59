"""HyperLogLog as a first-class MERGEABLE relation (Flajolet et al. 2007).

`approx_distinct_parts` already exposes Spark's built-in HLL++ aggregate, but
its sketch lives inside an opaque aggregation buffer: the registry row is
rows-only (no DuckDB twin) and the sketch cannot be persisted, merged across
batches, or audited. This module builds the sketch AS A DATAFRAME — a
(bucket, max_rho) register table — from deterministic md5 bit arithmetic
that DuckDB reproduces character-for-character, so BOTH the registers and
the estimate are hash-exact oracle-checkable, and merging is a plain
`union → groupBy(bucket).max(rho)` any engine can run incrementally (the
property a 100 TB streaming ingest needs: per-batch register tables are
m-row relations; cross-batch distinct-count state is bounded by m forever).

Bit extraction (identical SQL in Spark and DuckDB — no conv(), which DuckDB
lacks):
  h       = md5(cast(key as string))           32 lowercase hex chars
  bucket  = 16*nib(h[1]) + nib(h[2])           8-bit register index, m=256
  hex60   = h[3..17]                           60 payload bits
  z       = # leading '0' chars of hex60       via regexp_replace('^0+')
  v       = nibble value of first non-zero     1..15
  rho     = 4*z + 4 - floor(log2(v))           1-based first-1-bit position
            (61 when hex60 is all zeros)
  nib(c)  = instr('0123456789abcdef', c) - 1

Estimate (standard bias-corrected HLL with linear counting):
  S     = (m - |registers|) + sum(2^-rho)      zero registers contribute 2^0
  E_raw = alpha_m * m^2 / S,  alpha_256 = 0.7213 / (1 + 1.079/256)
  E     = m * ln(m / V)  when E_raw <= 2.5m and V = m - |registers| > 0
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

M = 256  # registers (p = 8): relative error 1.04/sqrt(m) ~= 6.5%
ALPHA = 0.7213 / (1 + 1.079 / M)
HEX = "0123456789abcdef"


def hll_registers(df: DataFrame, key_col: str) -> DataFrame:
    """(bucket, max_rho) register table for the distinct values of key_col.
    One map-only pass + a ≤m-group aggregate (partials combine map-side);
    the result is the sketch — persist it, union it, re-aggregate it.
    The bit arithmetic is written as SQL expression strings that match
    duckdb_hll_sql character for character."""
    keyed = df.select(F.md5(F.col(key_col).cast("string")).alias("h"))
    bits = keyed.select(
        F.expr(
            f"(instr('{HEX}', substring(h, 1, 1)) - 1) * 16"
            f" + instr('{HEX}', substring(h, 2, 1)) - 1"
        ).cast("int").alias("bucket"),
        F.expr("regexp_replace(substring(h, 3, 15), '^0+', '')").alias("t"),
    )
    rhos = bits.select(
        "bucket",
        F.expr(
            "CASE WHEN length(t) = 0 THEN 61"
            " ELSE (15 - length(t)) * 4 + 4"
            f" - CAST(floor(log2(instr('{HEX}', substring(t, 1, 1)) - 1)) AS INT)"
            " END"
        ).cast("int").alias("rho"),
    )
    return rhos.groupBy("bucket").agg(F.max("rho").alias("max_rho"))


def hll_merge(*registers: DataFrame) -> DataFrame:
    """Merge sketches: union the register tables, keep the max per bucket.
    Associative + commutative + idempotent — re-delivered batches are
    absorbed, which is why the streaming store needs no dedup discipline."""
    out = registers[0]
    for r in registers[1:]:
        out = out.unionByName(r)
    return out.groupBy("bucket").agg(F.max("max_rho").alias("max_rho"))


def hll_estimate(registers: DataFrame) -> DataFrame:
    """1-row (n_registers, est) from a register table — deterministic
    arithmetic, so two engines agree bit-for-bit given equal registers."""
    agg = registers.agg(
        F.count("*").alias("n_registers"),
        # coalesce: an EMPTY register table (no keys seen yet) must linear-
        # count to 0, not propagate sum()'s NULL into the estimate
        F.coalesce(
            F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))), F.lit(0.0)
        ).alias("s_seen"),
    )
    s = (F.lit(M) - F.col("n_registers")).cast("double") + F.col("s_seen")
    e_raw = F.lit(ALPHA * M * M) / s
    v_zero = F.lit(M) - F.col("n_registers")
    est = F.when(
        (e_raw <= 2.5 * M) & (v_zero > 0),
        F.lit(float(M)) * F.log(F.lit(float(M)) / v_zero.cast("double")),
    ).otherwise(e_raw)
    return agg.select("n_registers", est.alias("est"))


def duckdb_hll_sql(table: str, key: str) -> str:
    """DuckDB twin of hll_registers + hll_estimate over table.key —
    the same hex arithmetic, character for character."""
    return f"""
    WITH keyed AS (
        SELECT md5(CAST({key} AS VARCHAR)) AS h FROM {table}
    ),
    bits AS (
        SELECT (instr('{HEX}', substr(h, 1, 1)) - 1) * 16
               + instr('{HEX}', substr(h, 2, 1)) - 1 AS bucket,
               regexp_replace(substr(h, 3, 15), '^0+', '') AS t
        FROM keyed
    ),
    rhos AS (
        SELECT bucket,
               CASE WHEN length(t) = 0 THEN 61
                    ELSE (15 - length(t)) * 4 + 4
                         - CAST(floor(log2(instr('{HEX}', substr(t, 1, 1)) - 1))
                                AS INTEGER)
               END AS rho
        FROM bits
    ),
    regs AS (SELECT bucket, max(rho) AS max_rho FROM rhos GROUP BY bucket),
    agg AS (
        SELECT count(*) AS n_registers,
               sum(pow(2.0, -max_rho)) AS s_seen
        FROM regs
    )
    SELECT n_registers,
           CASE WHEN {ALPHA * M * M} / (({M} - n_registers) + s_seen) <= {2.5 * M}
                     AND {M} - n_registers > 0
                THEN {float(M)} * ln({float(M)} / ({M} - n_registers))
                ELSE {ALPHA * M * M} / (({M} - n_registers) + s_seen)
           END AS est
    FROM agg
    """
