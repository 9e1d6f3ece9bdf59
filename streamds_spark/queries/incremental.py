"""Incremental table maintenance: MERGE upsert and SCD2 history build.

The reference's storage layer is append/merge only (HyDFS appendFile /
mergeFile concatenate chunks; `misc/hydfs.go`) — row-level upsert and
slowly-changing-dimension tracking are the two maintenance patterns its users
would need next. Both are single-shuffle DataFrame plans here.

The MERGE test harness derives a deterministic changes set from `orders`
itself so both engines construct bit-identical inputs:
  - delete  where o_orderkey % 53 == 1
  - update  where o_orderkey % 37 == 0 (and not a delete key): price * 1.1
  - insert  where o_orderkey % 41 == 3: key shifted by +100_000_000
The three predicates are mutually exclusive per change row, so the merge sees
at most one change per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.operators.merge import merge_into
from streamds_spark.registry import query

_INSERT_SHIFT = 100_000_000


@query(
    "merge_upsert_orders",
    oracle=f"""
    WITH changes AS (
        SELECT o_orderkey AS k, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority, TRUE AS is_delete
        FROM orders WHERE o_orderkey % 53 = 1
        UNION ALL
        SELECT o_orderkey, o_custkey, 'U', o_totalprice * 1.1,
               o_orderdate, o_orderpriority, FALSE
        FROM orders WHERE o_orderkey % 37 = 0 AND o_orderkey % 53 <> 1
        UNION ALL
        SELECT o_orderkey + {_INSERT_SHIFT}, o_custkey, 'N', o_totalprice,
               o_orderdate, o_orderpriority, FALSE
        FROM orders WHERE o_orderkey % 41 = 3
    ),
    merged AS (
        SELECT coalesce(b.o_orderkey, c.k) AS o_orderkey,
               CASE WHEN b.o_orderkey IS NULL THEN c.o_custkey
                    ELSE b.o_custkey END AS o_custkey,
               CASE WHEN b.o_orderkey IS NULL THEN c.o_orderstatus
                    ELSE coalesce(c.o_orderstatus, b.o_orderstatus) END AS o_orderstatus,
               CASE WHEN b.o_orderkey IS NULL THEN c.o_totalprice
                    ELSE coalesce(c.o_totalprice, b.o_totalprice) END AS o_totalprice,
               CASE WHEN b.o_orderkey IS NULL THEN c.o_orderdate
                    ELSE b.o_orderdate END AS o_orderdate,
               CASE WHEN b.o_orderkey IS NULL THEN c.o_orderpriority
                    ELSE b.o_orderpriority END AS o_orderpriority
        FROM orders b FULL OUTER JOIN changes c ON b.o_orderkey = c.k
        WHERE coalesce(c.is_delete, FALSE) = FALSE
    )
    SELECT o_orderkey, o_custkey, o_orderstatus,
           round(o_totalprice, 4) + 0.0 AS o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o_orderpriority
    FROM merged
    """,
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO orders: deterministic delete/update/insert change set applied
    via operators.merge.merge_into (one full-outer shuffle on the key)."""
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    deletes = orders.filter(k % 53 == 1).withColumn("is_delete", F.lit(True))
    updates = (
        orders.filter((k % 37 == 0) & (k % 53 != 1))
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
        .withColumn("is_delete", F.lit(False))
    )
    inserts = (
        orders.filter(k % 41 == 3)
        .withColumn("o_orderkey", k + _INSERT_SHIFT)
        .withColumn("o_orderstatus", F.lit("N"))
        .withColumn("is_delete", F.lit(False))
    )
    changes = deletes.unionByName(updates).unionByName(inserts)
    merged = merge_into(
        orders,
        changes,
        key="o_orderkey",
        update_cols=("o_orderstatus", "o_totalprice"),
    )
    return merged.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        (F.round("o_totalprice", 4) + 0.0).alias("o_totalprice"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        "o_orderpriority",
    )


@query(
    "scd2_customer_history",
    oracle="""
    SELECT o_custkey AS custkey,
           o_orderkey AS version_key,
           strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
           coalesce(strftime(lead(o_orderdate)
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                    '%Y-%m-%d'), '9999-12-31') AS valid_to,
           (lead(o_orderkey)
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
            IS NULL) AS is_current
    FROM orders
    """,
)
def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 build: each order versions its customer; validity intervals
    come from lead() over (custkey, orderdate) — one shuffle on the dimension
    key, window over the per-key version chain only (bounded per key)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("version_key"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("valid_from"),
        F.coalesce(
            F.date_format(F.lead("o_orderdate").over(w), "yyyy-MM-dd"),
            F.lit("9999-12-31"),
        ).alias("valid_to"),
        F.lead("o_orderkey").over(w).isNull().alias("is_current"),
    )


@query(
    "snapshot_diff_orders",
    oracle=f"""
    WITH snap_b AS (
        SELECT o_orderkey, o_custkey,
               CASE WHEN o_orderkey % 37 = 0 THEN 'U' ELSE o_orderstatus END
                   AS o_orderstatus,
               CASE WHEN o_orderkey % 37 = 0
                    THEN round(o_totalprice * 1.1, 2) ELSE o_totalprice END
                   AS o_totalprice
        FROM orders WHERE o_orderkey % 53 <> 1
        UNION ALL
        SELECT o_orderkey + {_INSERT_SHIFT}, o_custkey, 'N', o_totalprice
        FROM orders WHERE o_orderkey % 41 = 3
    ),
    a AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders),
    d AS (
        SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
               CASE WHEN b.o_orderkey IS NULL THEN 'removed'
                    WHEN a.o_orderkey IS NULL THEN 'added'
                    WHEN (a.o_custkey IS DISTINCT FROM b.o_custkey
                          OR a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
                          OR a.o_totalprice IS DISTINCT FROM b.o_totalprice)
                         THEN 'changed' END AS change_type
        FROM a FULL OUTER JOIN snap_b b USING (o_orderkey)
    )
    SELECT o_orderkey, change_type FROM d WHERE change_type IS NOT NULL
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff two snapshots of orders (B derived deterministically from A with
    the same delete/update/insert recipe the MERGE harness uses) via
    operators/diff.table_diff — the recovered change set must be exactly the
    applied one, which the oracle reconstructs independently with a FULL
    OUTER JOIN + IS DISTINCT FROM. One key-partitioned shuffle; unchanged
    rows never leave the join."""
    from streamds_spark.operators.diff import table_diff

    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    a = load_table(spark, sf_dir, "orders").select(*cols)
    base = a.filter(F.col("o_orderkey") % 53 != 1)
    updated = base.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 37 == 0, F.lit("U")).otherwise(
            F.col("o_orderstatus")
        ),
    ).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 37 == 0, F.round(F.col("o_totalprice") * 1.1, 2)
        ).otherwise(F.col("o_totalprice")),
    )
    inserted = (
        a.filter(F.col("o_orderkey") % 41 == 3)
        .withColumn("o_orderkey", F.col("o_orderkey") + _INSERT_SHIFT)
        .withColumn("o_orderstatus", F.lit("N"))
    )
    snap_b = updated.unionByName(inserted)
    return table_diff(a, snap_b, keys=["o_orderkey"])
