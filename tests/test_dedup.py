"""Dedup-operator semantics on crafted fixtures with KNOWN duplicates (the
TESTDATA documents are unique, so these tests inject real near-dups)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamds_spark.functions.hashing import md5_int28, md5_int60
from streamds_spark.functions.text import shingles_expr, tokens


BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches the "
    "birds fly south for the winter as leaves fall gently from the old oak tree"
)
# Append-only edit: ~26 of 27 shingles shared (Jaccard ≈ 0.96), safely above
# the 4×4-band LSH threshold; a mid-text swap at ~0.79 sits near the S-curve
# knee and can legitimately miss.
NEAR_DUP = BASE + " today"
UNRELATED = "completely different content about spark query engines and distributed joins running fast"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(0, BASE), (1, BASE), (2, NEAR_DUP), (3, UNRELATED)], ["doc_id", "text"]
    )


def test_exact_dedup_groups_identical_texts(spark, docs):
    grouped = (
        docs.groupBy(F.md5(F.col("text").cast("binary")).alias("h"))
        .agg(F.min("doc_id").alias("keep"), F.count("*").alias("n"))
        .collect()
    )
    by_n = sorted((r["n"], r["keep"]) for r in grouped)
    assert by_n == [(1, 2), (1, 3), (2, 0)]  # docs 0,1 collapse; keep doc 0


def test_minhash_lsh_finds_near_dup_pair(spark, docs):
    """doc 0/1 (identical) and 0/2, 1/2 (one-word diff) must share LSH buckets;
    the unrelated doc must not pair with anything."""
    from streamds_spark.queries.llmdata import dedup as D

    sig = (
        docs.select("doc_id", tokens(F.col("text")).alias("toks"))
        .select("doc_id", F.explode(shingles_expr("toks", D.SHINGLE_N)).alias("s"))
        .select("doc_id", md5_int28(F.col("s")).alias("h"))
    )
    from streamds_spark.functions.hashing import MINHASH_PRIME, minhash_perm_constants

    mins = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"m{i}")
        for i, (a, b) in enumerate(minhash_perm_constants(D.NUM_PERM))
    ]
    sigs = sig.groupBy("doc_id").agg(*mins)
    bands = []
    for bnd, cols in enumerate(D._BAND_COLS):
        bands.append(
            sigs.select(
                "doc_id",
                F.lit(bnd).alias("band"),
                F.md5(F.concat_ws(",", *[F.col(c).cast("string") for c in cols])).alias("bucket"),
            )
        )
    buckets = bands[0]
    for e in bands[1:]:
        buckets = buckets.unionByName(e)
    a, b = buckets.alias("a"), buckets.alias("b")
    pairs = {
        (r["da"], r["db"])
        for r in a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .distinct()
        .collect()
    }
    assert (0, 1) in pairs  # identical docs always collide on every band
    assert (0, 2) in pairs or (1, 2) in pairs  # near-dup shares most shingles
    assert not any(3 in p for p in pairs)  # unrelated doc never pairs


def test_simhash_hamming_distance(spark, docs):
    """SimHash: identical docs → equal hashes; near-dups → small Hamming
    distance; unrelated → large."""
    th = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
        .select("doc_id", md5_int28(F.col("w")).alias("h"))
    )
    votes = (
        th.select("doc_id", "h", F.explode(F.sequence(F.lit(0), F.lit(27))).alias("i"))
        .groupBy("doc_id", "i")
        .agg(F.sum(F.when(F.expr("(h >> i) & 1") == 1, 1).otherwise(-1)).alias("vote"))
    )
    sims = {
        r["doc_id"]: r["sh"]
        for r in votes.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("vote") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), i)")).otherwise(0)
            ).alias("sh")
        )
        .collect()
    }

    def hamming(x: int, y: int) -> int:
        return bin(x ^ y).count("1")

    assert sims[0] == sims[1]
    assert hamming(sims[0], sims[2]) <= 6
    assert hamming(sims[0], sims[3]) > 6


@pytest.mark.slow
def test_ngram_jaccard_scores(spark, docs):
    sh = (
        docs.select("doc_id", tokens(F.col("text")).alias("toks"))
        .select("doc_id", F.array_distinct(shingles_expr("toks", 3)).alias("s"))
    )
    a, b = sh.alias("a"), sh.alias("b")
    jac = {
        (r["da"], r["db"]): r["j"]
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("da"),
            F.col("b.doc_id").alias("db"),
            (
                F.size(F.array_intersect("a.s", "b.s"))
                / F.size(F.array_union("a.s", "b.s"))
            ).alias("j"),
        )
        .collect()
    }
    assert jac[(0, 1)] == 1.0
    assert 0.5 < jac[(0, 2)] < 1.0
    assert jac[(0, 3)] == 0.0


def test_md5_int_hash_matches_duckdb(spark):
    """The cross-engine hash contract (functions/hashing.py) holds bit-for-bit."""
    import duckdb

    values = ["hello", "the quick", "x", "ünïcodé", ""]
    df = spark.createDataFrame([(v,) for v in values], ["s"])
    srows = {
        r["s"]: (r["h60"], r["h28"])
        for r in df.select(
            "s", md5_int60(F.col("s")).alias("h60"), md5_int28(F.col("s")).alias("h28")
        ).collect()
    }
    con = duckdb.connect()
    for v in values:
        d60, d28 = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT, ('0x' || substr(md5(?), 1, 7))::BIGINT",
            [v, v],
        ).fetchone()
        assert srows[v] == (d60, d28), v
