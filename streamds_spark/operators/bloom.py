"""Bloom-filter membership sketch: build distributed, probe map-only.

The 100 TB decontamination problem: flag every corpus document containing a
shingle from a benchmark/eval set. The exact formulation is a shingle
equi-join — it shuffles the CORPUS's shingles (the 100 TB side). This
operator replaces that with the classic two-phase plan:

  1. BUILD (benchmark side, small): k positions per key via xxhash64
     double-hashing (Kirsch-Mitzenmacher: pos_i = h1 + i·h2 mod m), exploded
     to (word, bit), reduced with bit_or into an m/64-long bit array — all
     JVM expressions, one small shuffle keyed by word. The array (m=2²⁰ bits
     → 128 KiB) collects to the driver and ships as a broadcast variable.
  2. PROBE (corpus side, huge): a vectorized Arrow pandas_udf tests k bits
     per shingle against the broadcast array — MAP-ONLY, zero shuffle of the
     big side. Bloom false positives (tunable via m, k) are then removed by
     an exact join of ONLY the flagged survivors — bloom prunes the join's
     left side to ~(true hits + FP·n), so the exact pass shuffles a sliver.

False negatives: impossible (Bloom property) — the two-phase result equals
the exact join exactly, tested. Python is unavoidable here only because the
probe must consult 128 KiB of shared state per row; the Arrow batch path
amortizes it to one numpy gather per batch.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class BloomFilter:
    words: np.ndarray  # uint64[m/64]
    m_bits: int
    k: int

    @property
    def n_set_bits(self) -> int:
        return int(np.unpackbits(self.words.view(np.uint8)).sum())

    def fp_rate(self, n_keys: int) -> float:
        """Theoretical false-positive probability after n_keys insertions."""
        return (1.0 - np.exp(-self.k * n_keys / self.m_bits)) ** self.k


def _hashes(col: Column) -> tuple[Column, Column]:
    """Two independent 64-bit hashes (xxhash64 with domain separation)."""
    return F.xxhash64(col), F.xxhash64(col, F.lit("bloom-h2"))


def build_bloom(df: DataFrame, col: str, m_bits: int = 1 << 20, k: int = 5) -> BloomFilter:
    """Aggregate the column's values into a Bloom bit array.

    Distributed: explode each key to its k bit positions, bit_or-reduce per
    64-bit word (≤ m/64 groups — a tiny shuffle regardless of input size),
    collect the words. pmod BEFORE the i·h2 multiply keeps every intermediate
    far from long overflow (ANSI-safe)."""
    h1, h2 = _hashes(F.col(col))
    keyed = df.select(
        F.pmod(h1, F.lit(m_bits)).alias("p1"), F.pmod(h2, F.lit(m_bits)).alias("p2")
    )
    pos = keyed.select(
        F.explode(
            F.array(*[F.pmod(F.col("p1") + i * F.col("p2"), F.lit(m_bits)) for i in range(k)])
        ).alias("pos")
    )
    words = (
        pos.select(
            (F.col("pos") / 64).cast("long").alias("word"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    arr = np.zeros(m_bits // 64, dtype=np.uint64)
    for r in words:
        arr[r["word"]] = np.uint64(r["bits"] & 0xFFFFFFFFFFFFFFFF)
    return BloomFilter(words=arr, m_bits=m_bits, k=k)


def probe_bloom(
    df: DataFrame, col: str, bloom: BloomFilter, out_col: str = "maybe_member"
) -> DataFrame:
    """Add `maybe_member`: True iff all k bloom bits are set for the value.

    The bit array rides a Spark broadcast variable; the probe is one Arrow
    batch → numpy gather per partition chunk. Map-only plan (asserted by
    test) — the probed side never shuffles."""
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(bloom.words)
    m_bits, k = bloom.m_bits, bloom.k
    h1, h2 = _hashes(F.col(col))

    @F.pandas_udf("boolean")
    def check(p1: pd.Series, p2: pd.Series) -> pd.Series:
        w = bc.value
        a = p1.to_numpy(dtype=np.int64).astype(np.uint64)
        b = p2.to_numpy(dtype=np.int64).astype(np.uint64)
        ok = np.ones(len(a), dtype=bool)
        for i in range(k):
            pos = (a + np.uint64(i) * b) % np.uint64(m_bits)
            word = (pos >> np.uint64(6)).astype(np.int64)
            bit = pos & np.uint64(63)
            ok &= (w[word] >> bit) & np.uint64(1) != 0
        return pd.Series(ok)

    return df.withColumn(
        out_col,
        check(F.pmod(h1, F.lit(m_bits)), F.pmod(h2, F.lit(m_bits))),
    )


def bloom_decontaminate(
    corpus_shingles: DataFrame,
    benchmark_shingles: DataFrame,
    shingle_col: str = "shingle",
    id_col: str = "doc_id",
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """(doc_id, n_contaminated_shingles) for docs sharing ≥1 shingle with the
    benchmark — EXACT result (equal to the plain equi-join, tested), at
    bloom-probe cost: the corpus side is filtered map-side to bloom survivors
    before the verifying join, so the shuffle carries (true + FP) rows
    instead of every corpus shingle."""
    bloom = build_bloom(benchmark_shingles, shingle_col, m_bits=m_bits, k=k)
    candidates = probe_bloom(corpus_shingles, shingle_col, bloom).filter(
        F.col("maybe_member")
    )
    verified = candidates.join(
        benchmark_shingles.select(shingle_col).distinct(), shingle_col
    )
    return verified.groupBy(id_col).agg(
        F.count("*").alias("n_contaminated_shingles")
    )
