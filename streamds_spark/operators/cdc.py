"""Content-defined chunking (CDC): split text at positions where a rolling
window hash matches a pattern, so chunk boundaries depend on CONTENT, not
offsets — inserting or deleting a character early in a document shifts every
fixed-size chunk but leaves all content-defined chunks after the next
boundary identical (the shift-resistance property storage dedup systems —
LBFS/Muthitacharoen et al. 2001, FastCDC/Xia et al. 2016 — are built on,
and the right granularity for cross-document boilerplate dedup).

Design: the boundary test here is windowed, not chained — position i is a
boundary iff md5 of the W-character window ending at i starts with the given
hex prefix (match probability 16^-len(prefix), so expected chunk length is
W-ish + 16^len(prefix)). A windowed test keeps the operator a pure
per-position expression (no sequential state), which buys two things:
  - the whole operator is built-ins end to end — explode positions, filter
    on the window hash, one doc-partitioned lag window for spans, one
    doc-keyed join to slice chunk text; no UDF, no collect;
  - an exact DuckDB twin exists (md5 of the same UTF-8 bytes), so the
    chunking is hash-checked cross-engine, not just unit-tested.
The cost vs classic gear-hash CDC: no minimum-chunk-length clamp (that
constraint is inherently sequential) — tiny chunks occur at the geometric
rate instead. Documented trade, properties preserved.

Scale (100 TB): the position explode is W-bounded per character (one md5 of
W chars per position) and map-only; boundaries are a tiny filtered subset;
the only shuffles are the per-doc lag window and the doc-keyed text join,
both partitioned by doc_id (never global); chunk-hash sharing is a plain
groupBy on the hash. Skewed mega-docs are AQE-splittable on the join, and
the explode factor is (n_chars - W + 1), linear in input bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cdc_chunks(
    docs: DataFrame,
    text_col: str = "text",
    window: int = 8,
    prefix: str = "0",
) -> DataFrame:
    """(doc_id, s, e, chunk_hash) — 1-based closed character spans covering
    each non-empty document exactly, split at content-defined boundaries.
    Documents shorter than `window` (or with no hash match) yield one chunk.
    chunk_hash = md5 of the chunk's UTF-8 bytes."""
    if not (window >= 2 and prefix and all(c in "0123456789abcdef" for c in prefix)):
        raise ValueError(f"need window >= 2 and a lowercase hex prefix, got {window}, {prefix!r}")
    d = docs.select(
        "doc_id", F.col(text_col).alias("text"), F.length(text_col).alias("n")
    ).filter(F.col("n") >= 1)
    pos = d.filter(F.col("n") >= window).select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(window), F.col("n"))).alias("i"),
    )
    win_md5 = F.md5(
        F.encode(F.expr(f"substring(text, i - {window - 1}, {window})"), "UTF-8")
    )
    # boundaries feed three consumers (body spans, per-doc max, tail) — share
    # the one filtered relation structurally rather than re-running the
    # position explode + per-position md5 per branch (lazy: no plan-build job)
    bnd = (
        pos.filter(F.substring(win_md5, 1, len(prefix)) == prefix)
        .select("doc_id", "i")
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("doc_id").orderBy("i")
    body = bnd.select(
        "doc_id",
        (F.coalesce(F.lag("i").over(w), F.lit(0)) + 1).alias("s"),
        F.col("i").alias("e"),
    )
    last = bnd.groupBy("doc_id").agg(F.max("i").alias("mx"))
    tail = (
        d.join(last, "doc_id", "left")
        .filter(F.coalesce(F.col("mx"), F.lit(0)) < F.col("n"))
        .select(
            "doc_id",
            (F.coalesce(F.col("mx"), F.lit(0)) + 1).alias("s"),
            F.col("n").alias("e"),
        )
    )
    spans = body.unionByName(tail)
    return spans.join(d.select("doc_id", "text"), "doc_id").select(
        "doc_id",
        "s",
        "e",
        F.md5(
            F.encode(F.expr("substring(text, s, e - s + 1)"), "UTF-8")
        ).alias("chunk_hash"),
    )


def _gear_table(seed: int = 0x5EED) -> "list[int]":
    """256 deterministic 64-bit gear values from a splitmix64 stream — a
    fixed, platform-independent table (no RNG library dependence)."""
    vals, x = [], seed & 0xFFFFFFFFFFFFFFFF
    for _ in range(256):
        x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = x
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        vals.append(z ^ (z >> 31))
    return vals


def gear_boundaries(data: bytes, mask_bits: int, min_len: int, max_len: int,
                    gear: "list[int] | None" = None) -> "list[int]":
    """Pure-Python reference for the gear-hash boundary rule (1-based byte
    positions, always ending with len(data)). h_i = (2*h_{i-1} + gear[b_i])
    mod 2^64; position i ends a chunk when the chunk is >= min_len and the
    low `mask_bits` of h_i are zero, or when the chunk hits max_len."""
    g = gear or _gear_table()
    mask = (1 << mask_bits) - 1
    n, h, last, out = len(data), 0, 0, []
    for i, b in enumerate(data, 1):
        h = ((h << 1) + g[b]) & 0xFFFFFFFFFFFFFFFF
        if (i - last >= min_len and (h & mask) == 0) or i - last >= max_len:
            out.append(i)
            last = i
    if last < n:
        out.append(n)
    return out


def cdc_chunks_gear(
    docs: DataFrame,
    text_col: str = "text",
    mask_bits: int = 5,
    min_len: int = 16,
    max_len: int = 128,
) -> DataFrame:
    """FastCDC-style gear-hash chunker — the production-rate variant of
    cdc_chunks: one table lookup + shift + add per byte instead of an md5
    per position (~W× less hashing), plus the classic min/max chunk-length
    clamps the windowed-md5 variant cannot express. The price is losing the
    SQL twin (the min-length rule is sequential), so this ships as an
    Arrow-batched mapInPandas with the pure-Python gear_boundaries as its
    test oracle; cdc_chunks stays the cross-engine-checked reference.

    Spans are 1-based closed BYTE offsets over UTF-8 (cdc_chunks uses
    character offsets — byte-exact hashing is what production dedup wants).
    Vectorization: since 64-bit shifts age a byte out of the hash after 64
    positions, h_i equals the 64-lag windowed sum — computed per document
    as 64 shifted numpy adds over the byte array, i.e. vectorized along the
    dimension that grows (document length), with no Python per-byte loop.

    Scale: map-only (zero shuffles, zero state) — chunking parallelizes
    per input split exactly like the md5 variant; each task's memory is one
    Arrow batch plus a 2 KB gear table."""
    if not (0 < mask_bits < 32 and 1 <= min_len <= max_len):
        raise ValueError(
            f"need 0 < mask_bits < 32 and 1 <= min_len <= max_len, "
            f"got {mask_bits}, {min_len}, {max_len}"
        )
    import pandas as pd

    id_type = docs.schema["doc_id"].dataType.simpleString()
    gear = _gear_table()
    mask = (1 << mask_bits) - 1

    def chunk_batches(batches):
        import hashlib

        import numpy as np

        g = np.array(gear, dtype=np.uint64)
        for pdf in batches:
            ids, ss, es, hs = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = (text or "").encode("utf-8")
                n = len(data)
                if n == 0:
                    continue
                arr = g[np.frombuffer(data, dtype=np.uint8)]
                h = arr.copy()
                for k in range(1, min(64, n)):
                    h[k:] += arr[:-k] << np.uint64(k)
                cand = np.flatnonzero((h & np.uint64(mask)) == 0) + 1
                last, ci, bounds = 0, 0, []
                while last < n:
                    while ci < len(cand) and cand[ci] < last + min_len:
                        ci += 1
                    if ci < len(cand) and cand[ci] - last <= max_len:
                        b = int(cand[ci])
                        ci += 1
                    else:
                        b = min(last + max_len, n)
                    bounds.append(b)
                    last = b
                prev = 0
                for b in bounds:
                    ids.append(doc_id)
                    ss.append(prev + 1)
                    es.append(b)
                    hs.append(hashlib.md5(data[prev:b]).hexdigest())
                    prev = b
            yield pd.DataFrame(
                {"doc_id": ids, "s": ss, "e": es, "chunk_hash": hs}
            )

    return docs.select("doc_id", F.col(text_col).alias("text")).mapInPandas(
        chunk_batches, schema=f"doc_id {id_type}, s int, e int, chunk_hash string"
    )
