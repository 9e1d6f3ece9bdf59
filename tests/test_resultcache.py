"""Plan-fingerprint result cache: hit on identical query + unchanged data,
miss on changed literals, miss on rewritten input data, and the in-memory
safety rail (no inputFiles -> never cached)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from streamds_spark.io.resultcache import cached, plan_fingerprint

SF = "/root/testdata/sf0.001"


def _q(spark, path, prio="1-URGENT"):
    return (
        spark.read.parquet(path)
        .filter(F.col("o_orderpriority") == prio)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("cnt"))
    )


def test_hit_miss_and_invalidation(spark, tmp_path):
    cache = str(tmp_path / "cache")
    src = f"{SF}/orders.parquet"

    r1 = cached(_q(spark, src), cache)
    assert not r1.hit and r1.cacheable
    want = {(r["o_orderstatus"], r["cnt"]) for r in r1.df.collect()}

    # identical query from a FRESH DataFrame object: hit, same rows
    r2 = cached(_q(spark, src), cache)
    assert r2.hit and r2.fingerprint == r1.fingerprint
    assert {(r["o_orderstatus"], r["cnt"]) for r in r2.df.collect()} == want

    # a different literal is a different query
    r3 = cached(_q(spark, src, prio="5-LOW"), cache)
    assert not r3.hit and r3.fingerprint != r1.fingerprint

    # rewritten input data (same path, new mtime/size) invalidates
    local = str(tmp_path / "orders_copy.parquet")
    spark.read.parquet(src).write.mode("overwrite").parquet(local)
    a = cached(_q(spark, local), cache)
    assert not a.hit
    b = cached(_q(spark, local), cache)
    assert b.hit
    time.sleep(1.1)  # mtime granularity
    spark.read.parquet(src).limit(100).write.mode("overwrite").parquet(local)
    c = cached(_q(spark, local), cache)
    assert not c.hit and c.fingerprint != a.fingerprint


def test_in_memory_never_cached(spark, tmp_path):
    df = spark.createDataFrame([(1, "x")], "a int, b string").groupBy("b").count()
    fp, cacheable = plan_fingerprint(df)
    assert not cacheable
    r = cached(df, str(tmp_path / "cache"))
    assert not r.hit and not r.cacheable
    assert r.df.collect()[0]["count"] == 1
    # nothing was written
    import os

    assert not os.path.exists(str(tmp_path / "cache"))


def test_fingerprint_is_session_stable_and_column_sensitive(spark):
    src = f"{SF}/orders.parquet"
    fp1, _ = plan_fingerprint(_q(spark, src))
    fp2, _ = plan_fingerprint(_q(spark, src))
    assert fp1 == fp2
    other = spark.read.parquet(src).groupBy("o_orderstatus").agg(
        F.sum("o_totalprice").alias("cnt")
    )
    fp3, _ = plan_fingerprint(other)
    assert fp3 != fp1
