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
