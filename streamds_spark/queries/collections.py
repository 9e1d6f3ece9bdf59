"""Collection/binning operators: grouped collection, histograms, calendar
grouping, ntile quartiles — rounding out the aggregate surface."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.registry import query


@query(
    "collect_event_types",
    oracle="""
    SELECT user_id,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types,
           count(*) AS n_events
    FROM events GROUP BY user_id
    """,
)
def collect_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped collection (collect_set) rendered as a deterministic sorted
    string — the portable form of array-valued aggregation."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("event_type"))).alias("types"),
        F.count("*").alias("n_events"),
    )


@query(
    "value_histogram",
    oracle="""
    SELECT CAST(floor(value / 10.0) AS BIGINT) AS bin, count(*) AS cnt
    FROM events GROUP BY 1
    """,
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram binning — the scalable profile pass (single
    partial-agg shuffle keyed by bin)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.floor(F.col("value") / 10.0).cast("bigint").alias("bin"))
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "orders_by_dow",
    oracle="""
    SELECT CAST(strftime(o_orderdate, '%w') AS INT) AS dow,
           count(*) AS cnt,
           round(sum(o_totalprice), 4) AS total
    FROM orders GROUP BY 1
    """,
)
def orders_by_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar grouping: orders per day-of-week (0=Sunday, matching strftime
    %w; Spark's dayofweek is 1-based → minus 1)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy((F.dayofweek("o_orderdate") - 1).alias("dow"))
        .agg(F.count("*").alias("cnt"), F.round(F.sum("o_totalprice"), 4).alias("total"))
    )


@query(
    "ntile_customers",
    oracle="""
    SELECT quartile, count(*) AS n_customers,
           round(min(c_acctbal), 4) AS min_bal, round(max(c_acctbal), 4) AS max_bal
    FROM (
        SELECT c_acctbal,
               ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
        FROM customer
    ) GROUP BY quartile
    """,
)
def ntile_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile quartiles over a global order — the ranking-window bucketing op.
    (A global ntile implies a single-partition sort; at 100 TB use approx
    percentile cutoffs + a broadcast range join instead — percentiles_lineitem
    shows the sketch-friendly path.)"""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return (
        cust.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("quartile")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.min("c_acctbal"), 4).alias("min_bal"),
            F.round(F.max("c_acctbal"), 4).alias("max_bal"),
        )
    )
