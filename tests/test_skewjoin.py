"""salted_join correctness (vs plain join) and skew-spreading behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamds_spark.operators.skewjoin import salted_join


def _skewed_fixture(spark):
    # one hot key (0) with 5000 rows, 50 cold keys with 10 each
    hot = spark.range(5000).select(
        F.lit(0).alias("k"), F.col("id").alias("payload")
    )
    cold = spark.range(500).select(
        (F.col("id") % 50 + 1).alias("k"), (F.col("id") + 10_000).alias("payload")
    )
    fact = hot.unionByName(cold)
    dim = spark.range(51).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    return fact, dim


def test_salted_inner_join_matches_plain_join(spark):
    fact, dim = _skewed_fixture(spark)
    plain = fact.join(dim, "k").select("k", "payload", "name")
    salted = salted_join(fact, dim, "k", n_salts=8).select("k", "payload", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_left_join_preserves_unmatched(spark):
    fact, dim = _skewed_fixture(spark)
    # add fact rows with a key missing from dim
    extra = spark.range(7).select(
        F.lit(999).alias("k"), (F.col("id") + 50_000).alias("payload")
    )
    fact = fact.unionByName(extra)
    plain = fact.join(dim, "k", "left").select("k", "payload", "name")
    salted = salted_join(fact, dim, "k", n_salts=8, how="left").select(
        "k", "payload", "name"
    )
    assert sorted(map(tuple, salted.collect(), )) == sorted(map(tuple, plain.collect()))


def test_salt_spreads_hot_key_across_buckets(spark):
    fact, dim = _skewed_fixture(spark)
    salted_fact = fact.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(8)).cast("int"),
    )
    dist = (
        salted_fact.filter(F.col("k") == 0)
        .groupBy("_salt")
        .count()
        .collect()
    )
    counts = {r["_salt"]: r["count"] for r in dist}
    assert len(counts) == 8, "hot key must hit every salt bucket"
    assert max(counts.values()) < 5000 * 0.25, "no salt bucket may keep most of the hot key"


def test_salted_join_rejects_right_joins(spark):
    fact, dim = _skewed_fixture(spark)
    import pytest

    with pytest.raises(ValueError):
        salted_join(fact, dim, "k", how="right")
