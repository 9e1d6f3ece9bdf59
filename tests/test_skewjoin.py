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


def test_skew_report_rule_matches_hand_computation(spark):
    """skew_report's decision rule, checked against a hand-built distribution:
    one hot key holding half the rows (must recommend salting with
    n >= ceil(its budget ratio)), many cold keys (must say hash-shuffle)."""
    import math

    from streamds_spark.operators.skewjoin import skew_report

    rows = [("hot",)] * 800 + [(f"cold{i}",) for i in range(800)]
    df = spark.createDataFrame(rows, "k string")
    n_parts = 16
    rep = {r["key_value"]: r for r in skew_report(df, "k", n_parts, top_k=5).collect()}
    total = 1600
    budget = total / n_parts  # 100
    hot = rep["hot"]
    assert hot["n_rows"] == 800
    assert hot["share"] == round(800 / total, 4)
    assert hot["budget_ratio"] == round(800 / budget, 4)  # 8.0
    assert hot["recommendation"] == f"salt:{math.ceil(800 / budget)}"
    cold = [r for k, r in rep.items() if k != "hot"]
    assert cold and all(r["recommendation"] == "hash-shuffle" for r in cold)


def test_skew_report_recommended_salts_balance_the_join(spark):
    """Closing the loop: applying salted_join with the salt count the report
    recommends splits the hot key's rows across that many reducers (no salt
    bucket keeps a dominant share)."""
    from streamds_spark.operators.skewjoin import skew_report

    fact, dim = _skewed_fixture(spark)
    rep = {
        r["key_value"]: r
        for r in skew_report(fact, "k", n_partitions=8, top_k=3).collect()
    }
    rec = rep[0]["recommendation"] if 0 in rep else rep["0"]["recommendation"]
    assert rec.startswith("salt:")
    n_salts = int(rec.split(":")[1])
    assert n_salts >= 2
    joined = salted_join(fact, dim, "k", n_salts=n_salts)
    # correctness unchanged by salting
    plain = fact.join(dim, "k").count()
    assert joined.count() == plain


def test_skew_aware_join_picks_salted_on_hot_key_and_matches_plain(spark):
    """Synthetic 50%-hot-key fact + a dim 'too big to broadcast': the rule
    must choose salting with ~ceil(0.5 * n_partitions) salts, and the salted
    result must equal the plain join row-for-row."""
    import math

    from streamds_spark.operators.skewjoin import skew_aware_join

    n = 20_000
    fact = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("val"),
    )
    dim = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("dval")
    )
    choice = skew_aware_join(
        fact, dim, "k", n_partitions=32, broadcast_threshold_rows=100
    )
    assert choice.strategy == "salted"
    assert choice.budget_ratio is not None and choice.budget_ratio > 1
    assert choice.n_salts == min(64, math.ceil(choice.budget_ratio))
    assert 10 <= choice.n_salts <= 20  # hot key holds ~50% -> ratio ~16
    got = sorted(
        (r["k"], r["val"], r["dval"]) for r in choice.df.collect()
    )
    want = sorted(
        (r["k"], r["val"], r["dval"]) for r in fact.join(dim, "k").collect()
    )
    assert got == want and len(got) > n // 2
    # plan-pinned: the salting hash is in the plan, the salt column is not
    # in the result
    plan = choice.df._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan
    assert "_salt" not in choice.df.columns


def test_skew_aware_join_broadcasts_small_dim(spark):
    from streamds_spark.operators.skewjoin import skew_aware_join

    fact = spark.range(5000).select((F.col("id") % 100).alias("k"), "id")
    dim = spark.range(100).select(F.col("id").alias("k"))
    choice = skew_aware_join(fact, dim, "k")  # default threshold: broadcast
    assert choice.strategy == "broadcast"
    assert choice.dim_rows == 100 and choice.budget_ratio is None
    plan = choice.df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert choice.df.count() == 5000


def test_skew_aware_join_plain_on_uniform_keys(spark):
    from streamds_spark.operators.skewjoin import skew_aware_join

    fact = spark.range(10_000).select(F.col("id").alias("k"), "id")
    dim = spark.range(10_000).select(F.col("id").alias("k"), (F.col("id") + 1).alias("d"))
    choice = skew_aware_join(
        fact, dim, "k", n_partitions=32, broadcast_threshold_rows=100
    )
    assert choice.strategy == "plain"  # every key is unique: ratio << 1
    assert choice.budget_ratio is not None and choice.budget_ratio <= 1
    plan = choice.df._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" not in plan  # no salting machinery in the plan
    assert choice.df.count() == 10_000


def test_skew_aware_join_left_preserves_unmatched(spark):
    from streamds_spark.operators.skewjoin import skew_aware_join

    fact = spark.range(1000).select(
        F.when(F.col("id") < 500, F.lit(1)).otherwise(F.col("id")).alias("k"), "id"
    )
    dim = spark.range(2).select(F.col("id").alias("k"), F.lit("x").alias("tag"))
    choice = skew_aware_join(
        fact, dim, "k", how="left", n_partitions=4, broadcast_threshold_rows=0
    )
    assert choice.strategy == "salted"
    rows = choice.df.collect()
    assert len(rows) == 1000  # left side fully preserved
    assert sum(1 for r in rows if r["tag"] is None) == 500  # unmatched keep NULL dim
