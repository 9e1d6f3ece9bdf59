"""Perceptual image hashing (pHash) + near-duplicate detection over binary
media columns — image dedup for a multimodal training corpus, built on the
same Arrow-batched plumbing as functions/multimodal.py.

Algorithm (classic pHash, public knowledge): grayscale → 32×32 → 2-D DCT-II →
keep the low-frequency 8×8 block (minus the DC term) → threshold at the
median → 63-bit hash (63 coefficients survive the DC drop). Visually-similar
images agree on most bits, so near-duplicates are pairs with small Hamming
distance. The DCT here is FIXED-POINT INTEGER (see MINT below), which makes
the hash engine-reproducible and the whole near-dup census hash-exact
against a DuckDB replay (duckdb_phash_hist_sql).

Pixel source: the container has no image codecs, so pixels come from the
SAME deterministic stub decode the rest of the multimodal layer uses
(synth_payload's md5-chained bytes tiled to width×height). A real deployment
swaps _stub_pixels for PIL/`cv2` inside the same mapInPandas — schema, batch
shape, and everything downstream are unchanged.

Scale shape: hashing is map-only (Arrow batches, numpy DCT via one matmul
per image). Candidate pairing reuses the SimHash trick — split the 64-bit
hash into B equal bands; any pair within Hamming distance B-1 of each other
shares at least one full band (pigeonhole), so a (band_idx, band_value)
equi-join finds all such pairs without an all-pairs comparison, and the
exact Hamming check on xor prunes false candidates. B defaults to 4 (16-bit
bands, radius <= 3) and widens to 8 or 16 bands for looser radii (see
phash_neardup_pairs for the collision-rate tradeoff). Same posture as
dedup_simhash, which is driver-verified.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

PHASH_SIZE = 32  # DCT input side
PHASH_BLOCK = 8  # low-frequency block side
N_BANDS = 4  # 16-bit bands over the 64-bit hash


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix (so dct2(a) = M @ a @ M.T)."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    m[0, :] = np.sqrt(1.0 / n)
    return m


_DCT_M = _dct_matrix(PHASH_SIZE)

# Fixed-point DCT coefficients: round(M * 2^DCT_SHIFT) as int64. phash64 runs
# the ENTIRE transform in integer arithmetic (two exact int matmuls, an exact
# order-statistic median, integer comparisons), so the hash is a deterministic
# pure-integer function of the pixels — independent of BLAS/accumulation
# order, reproducible bit-for-bit by any engine, which is what lets
# image_phash_neardups carry a DuckDB oracle replaying the same table of
# coefficients (float DCT could never be cross-engine exact). Scaling keeps
# coefficient ORDER information: freq_int = MINT @ px @ MINT^T equals
# 2^(2*SHIFT) * freq_float up to per-entry rounding of the coefficients, and
# the hash only compares coefficients to their median, so the constant factor
# is irrelevant. Value bound: |MINT| <= 4096, so |freq_int| <= 32*4096*255*
# 32*4096 < 2^43 — comfortably inside int64.
DCT_SHIFT = 14
MINT = np.round(_DCT_M * (1 << DCT_SHIFT)).astype(np.int64)


def _stub_pixels(payload: bytes) -> np.ndarray:
    """STUB pixel decode for synth_payload blobs (md5-chained body bytes
    tiled to width*height grayscale). A real impl decodes the codec here."""
    if len(payload) < 11:
        raise ValueError(
            f"not a synth_payload blob: {len(payload)} bytes (< 11-byte "
            "header of magic + >II width/height) — real codecs are not "
            "available in this environment; see functions/multimodal.py"
        )
    width, height = struct.unpack(">II", payload[3:11])
    if width == 0 or height == 0:
        raise ValueError(f"degenerate image dimensions {width}x{height}")
    body = np.frombuffer(payload[11:], dtype=np.uint8)
    if body.size == 0:
        body = np.zeros(1, dtype=np.uint8)
    reps = -(-(width * height) // body.size)
    return np.tile(body, reps)[: width * height].reshape(height, width)


def phash64(pixels: np.ndarray) -> int:
    """Perceptual hash of a grayscale image array. NOTE: the classic
    construction thresholds the 8x8 low-frequency block MINUS the DC term,
    so the hash is effectively 63 bits (the top bit is always 0 and the
    fourth 16-bit band carries 15 usable bits — slightly coarser buckets
    there, same completeness guarantee)."""
    h, w = pixels.shape
    # box-resample to PHASH_SIZE x PHASH_SIZE (nearest grid sampling)
    ys = (np.arange(PHASH_SIZE) * h) // PHASH_SIZE
    xs = (np.arange(PHASH_SIZE) * w) // PHASH_SIZE
    small = pixels[np.ix_(ys, xs)].astype(np.int64)
    freq = MINT @ small @ MINT.T  # exact integer DCT (see MINT above)
    block = freq[:PHASH_BLOCK, :PHASH_BLOCK].flatten()
    vals = block[1:]  # drop the DC coefficient
    med = np.partition(vals, 31)[31]  # exact 32nd-smallest of 63 (odd count)
    bits = vals > med
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return out


PHASH_SCHEMA = StructType(
    [StructField("media_id", LongType()), StructField("phash", LongType())]
)


def image_phash(media: DataFrame) -> DataFrame:
    """(media_id, phash) for every image payload, Arrow-batched map-only.

    Pixels come from functions/multimodal.decode_image_pixels: synthetic
    blobs via the deterministic stub, real image bytes via Pillow when the
    deployment provides it (env-gated; tests/test_phash.py has the
    real-decode test, skipped cleanly without the dependency)."""
    from streamds_spark.functions.multimodal import decode_image_pixels

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_image_pixels(bytes(payload))
                # 63-bit value (see phash64) — always fits a signed LongType
                out.append({"media_id": mid, "phash": phash64(px)})
            yield pd.DataFrame(out, columns=["media_id", "phash"])

    return media.select("media_id", "payload").mapInPandas(batches, schema=PHASH_SCHEMA)


def phash_neardup_pairs(
    hashes: DataFrame, max_hamming: int = 3, n_bands: int | None = None
) -> DataFrame:
    """Near-duplicate image pairs (id_a < id_b, hamming <= max_hamming) via
    banded candidate join + exact popcount verify. Complete for
    max_hamming < n_bands (pigeonhole: a pair differing in <= max_hamming
    bits must agree on at least one full band).

    n_bands defaults to the narrowest complete scheme for the radius: 4
    bands of 16 bits (radius <= 3), 8 bands of 8 bits (radius <= 7), or 16
    bands of 4 bits (radius <= 15). The tradeoff is explicit: wider radius
    means narrower bands, so random-pair band collisions rise from
    4/2^16 to 8/2^8 to 16/2^4 — candidate volume stays O(sum of bucket^2),
    never all-pairs, but the near-dup workload should pick the TIGHTEST
    radius it can (image near-dup convention is <= 8-10, i.e. 16 bands only
    when genuinely needed). Radius >= 16 is refused: 2-bit bands collide on
    a quarter of random pairs, which IS effectively all-pairs."""
    if n_bands is None:
        n_bands = next((b for b in (N_BANDS, 8, 16) if max_hamming < b), 0)
    if not n_bands or max_hamming >= n_bands:
        raise ValueError(
            f"banded join is only complete for max_hamming < n_bands; got "
            f"radius {max_hamming} with {n_bands or '>16 required'} bands"
        )
    if 64 % n_bands:
        raise ValueError(f"n_bands must divide 64; got {n_bands}")
    if n_bands > 16:
        # bands narrower than 4 bits collide on >= 1/16 of random pairs —
        # the all-pairs regime the docstring refuses, also when the caller
        # picks n_bands explicitly
        raise ValueError(f"n_bands must be <= 16 (band width >= 4 bits); got {n_bands}")
    width = 64 // n_bands
    mask = (1 << width) - 1
    bands = hashes.select(
        "media_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("phash"), width * b)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bv"),
    ).select("media_id", "phash", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))

    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            F.col("a.phash").alias("ha"),
            F.col("b.phash").alias("hb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def duckdb_phash_hist_sql(max_hamming: int = 3) -> str:
    """DuckDB twin of the ENTIRE image_phash_neardups pipeline — synthetic
    payload body (hex md5 chain, functions/multimodal.synth_payload), stub
    pixel tiling, 32x32 nearest-grid resample, the fixed-point integer DCT
    (the same MINT coefficient table embedded as literals, so both engines
    multiply identical integers), the 32nd-smallest median threshold, the
    63-bit hash, and a BRUTE-FORCE all-pairs Hamming histogram — which also
    independently re-proves the banded candidate join's completeness at the
    radius, since the oracle never bands.

    Only the first PHASH_BLOCK rows of MINT are needed: both matmul legs of
    the 8x8 low-frequency block contract against M[u, :] with u < 8."""
    hexd = "0123456789abcdef"
    mint_rows = ", ".join(
        f"({u},{i},{int(MINT[u, i])})"
        for u in range(PHASH_BLOCK)
        for i in range(PHASH_SIZE)
    )
    # pixel index arithmetic (all integer): ys=(3r)//2, xs=(c*w)//32,
    # pos = (ys*w + xs) mod 3w; byte = nibble pair at hex offset 2*pos
    pos = "((((3 * g1.r) // 2) * i.w + (g2.c * i.w) // 32) % (3 * i.w))"
    px = (
        f"(instr('{hexd}', substr(b.hex, 2 * {pos} + 1, 1)) - 1) * 16"
        f" + instr('{hexd}', substr(b.hex, 2 * {pos} + 2, 1)) - 1"
    )
    return f"""
    WITH RECURSIVE imgs AS (
        SELECT doc_id, text, CAST(64 + doc_id % 64 AS BIGINT) AS w
        FROM documents WHERE doc_id % 3 = 0
    ),
    chain(doc_id, k, hx) AS (
        SELECT doc_id, 1, md5(text) FROM imgs
      UNION ALL
        SELECT doc_id, k + 1, md5(hx) FROM chain WHERE k < 24
    ),
    body AS (
        SELECT doc_id, string_agg(hx, '' ORDER BY k) AS hex
        FROM chain GROUP BY doc_id
    ),
    mint(u, i, v) AS (VALUES {mint_rows}),
    small AS (
        SELECT i.doc_id, g1.r, g2.c, CAST({px} AS BIGINT) AS px
        FROM imgs i
        JOIN body b ON b.doc_id = i.doc_id
        CROSS JOIN range(0, {PHASH_SIZE}) g1(r)
        CROSS JOIN range(0, {PHASH_SIZE}) g2(c)
    ),
    t1 AS (
        SELECT s.doc_id, m.u, s.c AS j, SUM(m.v * s.px) AS t
        FROM small s JOIN mint m ON m.i = s.r
        GROUP BY 1, 2, 3
    ),
    freq AS (
        SELECT t1.doc_id, t1.u, m.u AS v, SUM(t1.t * m.v) AS f
        FROM t1 JOIN mint m ON m.i = t1.j
        GROUP BY 1, 2, 3
    ),
    vals AS (
        SELECT doc_id, u * {PHASH_BLOCK} + v AS p, f
        FROM freq WHERE NOT (u = 0 AND v = 0)
    ),
    med AS (
        SELECT doc_id, f AS med FROM (
            SELECT doc_id, f,
                   row_number() OVER (PARTITION BY doc_id ORDER BY f) AS rn
            FROM vals
        ) WHERE rn = 32
    ),
    hashes AS (
        SELECT v.doc_id,
               CAST(SUM(CASE WHEN v.f > m.med
                             THEN CAST(pow(2, 63 - v.p) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS h
        FROM vals v JOIN med m ON m.doc_id = v.doc_id
        GROUP BY 1
    ),
    pairs AS (
        SELECT bit_count(xor(a.h, b.h)) AS hamming
        FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.h, b.h)) <= {max_hamming}
    )
    SELECT CAST(hamming AS BIGINT) AS hamming,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM pairs GROUP BY 1
    """
