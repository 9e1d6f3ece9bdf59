"""Mergeable bottom-k sampling (operators/sampling.py): determinism under
re-partitioning, the KMV merge property on arbitrary shardings (fuzzed),
stratified equal-size draws, and cross-engine hash parity."""

from __future__ import annotations

import random

import duckdb

from pyspark.sql import functions as F

from streamds_spark.functions.hashing import duckdb_md5_int
from streamds_spark.operators.sampling import (
    bottomk_merge,
    bottomk_sample,
    stratified_bottomk,
)


def _ids(df):
    return [(r["doc_id"], r["h"]) for r in df.orderBy("h", "doc_id").collect()]


def test_deterministic_under_partitioning(spark):
    rows = [(i,) for i in range(1000)]
    a = spark.createDataFrame(rows, ["doc_id"])
    b = spark.createDataFrame(rows, ["doc_id"]).repartition(17)
    sa = _ids(bottomk_sample(a, "doc_id", 50))
    sb = _ids(bottomk_sample(b, "doc_id", 50))
    assert sa == sb and len(sa) == 50


def test_merge_property_fuzzed_shardings(spark):
    """bottom_k over any sharding's per-shard samples == whole-data sample,
    for random shard counts and skewed shard sizes."""
    rng = random.Random(17)
    ids = rng.sample(range(10**6), 500)
    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    want = _ids(bottomk_sample(df, "doc_id", 40))
    for trial in range(3):
        n_shards = rng.randint(2, 6)
        assignment = [rng.randint(0, n_shards - 1) for _ in ids]
        shards = [
            spark.createDataFrame(
                [(i,) for i, a in zip(ids, assignment) if a == s] or [(-(s + 1),)],
                ["doc_id"],
            )
            for s in range(n_shards)
        ]
        folded = bottomk_merge(
            40, "doc_id", *[bottomk_sample(s, "doc_id", 40) for s in shards]
        )
        got = _ids(folded)
        # the dummy negative ids exist only for empty shards and would need
        # hashes in the global bottom-40 to intrude — filter them to keep
        # the comparison on the true population
        got = [(i, h) for i, h in got if i >= 0][:40]
        want_t = [(i, h) for i, h in want if i >= 0][:40]
        assert got[: len(want_t)] == want_t, trial


def test_stratified_equal_draws_and_mergeability(spark):
    rows = [(i, f"s{i % 3}") for i in range(600)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    strat = stratified_bottomk(df, "source", "doc_id", 10)
    per = {
        r["source"]: r["n"]
        for r in strat.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert per == {"s0": 10, "s1": 10, "s2": 10}
    # each stratum's draw == bottom-k over that stratum alone
    for s in ("s0", "s1", "s2"):
        alone = _ids(bottomk_sample(df.filter(F.col("source") == s), "doc_id", 10))
        got = _ids(strat.filter(F.col("source") == s).select("doc_id", "h"))
        assert got == alone, s


def test_hash_parity_with_duckdb(spark):
    rng = random.Random(5)
    ids = [0, 1, 2**31, 2**62] + [rng.randint(0, 2**62) for _ in range(200)]
    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    got = _ids(bottomk_sample(df, "doc_id", 30))
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(i,) for i in ids])
    want = con.execute(
        f"SELECT doc_id, {duckdb_md5_int('CAST(doc_id AS VARCHAR)')} AS h "
        "FROM t ORDER BY h, doc_id LIMIT 30"
    ).fetchall()
    assert got == [tuple(r) for r in want]


def test_reserved_output_columns_are_refused(spark):
    """An input already carrying `h` (or `rn` for the stratified draw) would
    be silently clobbered by the hash/rank projection — wrong sample, wrong
    output — so the samplers refuse it loudly (the CLI passes arbitrary
    catalog tables)."""
    import pytest

    df_h = spark.createDataFrame([(1, 99)], "k int, h int")
    with pytest.raises(ValueError, match="h"):
        bottomk_sample(df_h, "k", 5)
    with pytest.raises(ValueError, match="h"):
        stratified_bottomk(df_h, "k", "k", 5)
    df_rn = spark.createDataFrame([(1, 99)], "k int, rn int")
    with pytest.raises(ValueError, match="rn"):
        stratified_bottomk(df_rn, "k", "k", 5)
    # clean inputs still sample
    clean = spark.createDataFrame([(i,) for i in range(10)], "k int")
    assert bottomk_sample(clean, "k", 3).count() == 3
