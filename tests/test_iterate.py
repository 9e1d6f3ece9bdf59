"""Stats-pinned checkpoint mechanism (operators/iterate.py).

Regression guard for the BigInteger size-estimate explosion: Catalyst
estimates joins as the PRODUCT of child sizeInBytes and checkpoint
snapshots that estimate into the LogicalRDD, so a loop whose carry-forward
join references the previous carry on both branches doubles the snapshot's
bit length every round — by round ~25 the driver spends minutes inside
BigInteger.multiply per checkpoint while the actual job stays milliseconds.
These tests drive exactly that adversarial loop shape and pin (a) that the
pinned checkpoint keeps the snapshot at the exact-cached-size scale and (b)
that the pin changes no values.
"""

import pytest
from pyspark.sql import functions as F

from streamds_spark.operators.iterate import StatsPinnedCheckpointer, leaf_stats_bits

pytestmark = pytest.mark.usefixtures("spark")


def _adversarial_round(cur, delta):
    """One carry-forward round referencing `cur` on BOTH join branches —
    the exponential-stats shape (kcore active branch / Bellman-Ford /
    pointer jumping all reduce to this)."""
    moved = (
        cur.alias("a")
        .join(delta, "k")
        .select("k", (F.col("v") + F.col("dv")).alias("v_new"))
    )
    return cur.join(moved, "k", "left").select(
        "k", F.coalesce("v_new", "v").cast("bigint").alias("v")
    )


def test_pinned_checkpoint_keeps_stats_exact_and_values_identical(spark):
    delta = spark.range(0, 50).select(
        F.col("id").alias("k"), F.lit(1).cast("bigint").alias("dv")
    )
    cur = spark.range(0, 200).select(
        F.col("id").alias("k"), F.lit(0).cast("bigint").alias("v")
    )
    with StatsPinnedCheckpointer(lag=2) as pin:
        for _ in range(10):
            cur = pin.checkpoint(_adversarial_round(cur, delta))
            # exact cached size of a 200-row table is a few KB; the broken
            # pattern is past 2**1000 by round 10
            assert leaf_stats_bits(cur) < 64
        rows = {r["k"]: r["v"] for r in cur.collect()}
    assert rows[0] == 10 and rows[49] == 10 and rows[50] == 0 and rows[199] == 0


def test_unpinned_loop_stats_compound_past_exact_scale(spark):
    # document the failure mode the pin exists for: the same loop with a
    # plain localCheckpoint compounds the size estimate multiplicatively
    # (stop at 6 rounds — far before the BigInt math gets expensive)
    delta = spark.range(0, 5).select(
        F.col("id").alias("k"), F.lit(1).cast("bigint").alias("dv")
    )
    cur = spark.range(0, 20).select(
        F.col("id").alias("k"), F.lit(0).cast("bigint").alias("v")
    )
    bits = []
    for _ in range(6):
        cur = _adversarial_round(cur, delta).localCheckpoint(eager=True)
        bits.append(leaf_stats_bits(cur))
    assert bits[-1] > 2 * bits[0], bits  # compounding, not flat
    assert bits[-1] > 64, bits  # already past any physical byte count


def test_release_unpersists_everything(spark):
    pin = StatsPinnedCheckpointer(lag=8)
    df = spark.range(0, 10).select(F.col("id").alias("k"), F.lit(0).alias("v"))
    out = pin.checkpoint(df.select("k", (F.col("v") + 1).alias("v")))
    assert len(pin._cached) == 1
    pin.release()
    assert pin._cached == []
    # the checkpointed result stays readable after release
    assert out.count() == 10
