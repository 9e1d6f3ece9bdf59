"""Full analytic surface on the TPC-H-ish TESTDATA: joins, aggregations, window
functions, grouping sets, set ops, sorts/limits, JSON extraction.

The reference implements NO joins, windows, or set ops (SURVEY.md §2.3/2.5/2.7)
— this module is the "full engine" capability layer on top of parity, all
expressed declaratively so Catalyst owns the physical strategy.

Scale posture per query class:
  - dim joins (region/nation/customer/supplier/part) are broadcast — at 100 TB
    the fact side (lineitem/orders) never shuffles for them; the explicit
    F.broadcast hints make that deterministic rather than threshold-dependent.
  - fact-fact joins (orders⋈lineitem) shuffle on the join key once; AQE
    coalesces/splits skewed partitions at runtime.
  - aggregates are partial (map-side combine) before the exchange.
  - all float aggregates rounded to 4 decimals on both engines (FP-sum noise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.registry import query


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           round(sum(l_extendedprice), 4) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: scan → pushed filter → 6-way agg on a 6-group key.
    Single shuffle; partial aggregation map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(charge), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: broadcast(customer-filter) ⋈ orders ⋈ lineitem → agg → top-10.
    Customer side is broadcast (dim-sized after the segment filter); the
    orders⋈lineitem join shuffles once on the orderkey. Deterministic tie-break
    on l_orderkey for the LIMIT."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way join; every dim side broadcast, single fact-fact shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure pushed-filter scan → scalar agg. The whole predicate
    reaches the parquet reader (PushedFilters)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"))


@query(
    "broadcast_join_agg",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_orders, round(avg(o_totalprice), 4) AS avg_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def broadcast_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast-hash-join: fact (orders) never shuffles for the dim join;
    only the 5-row group key exchange remains."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"), F.round(F.avg("o_totalprice"), 4).alias("avg_price"))
    )


@query(
    "semi_join_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
)
def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers with ≥1 open order."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "anti_join_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
)
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no pending orders."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "union_sides",
    oracle="""
    SELECT side, nationkey, count(*) AS cnt FROM (
        SELECT 'customer' AS side, c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT 'supplier' AS side, s_nationkey AS nationkey FROM supplier
    ) GROUP BY side, nationkey
    """,
)
def union_sides(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL + group (the MP1 gather is an implicit union of per-node results;
    reference core_process.go:259-349)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("side"), F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("side"), F.col("s_nationkey").alias("nationkey")
    )
    return cust.unionByName(supp).groupBy("side", "nationkey").agg(F.count("*").alias("cnt"))


@query(
    "intersect_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT set op: nations having both customers and suppliers."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(supp)


@query(
    "except_custkeys",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def except_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT set op: customers who ordered but have no pending orders."""
    orders = load_table(spark, sf_dir, "orders")
    all_keys = orders.select(F.col("o_custkey").alias("custkey"))
    pending = orders.filter(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("custkey")
    )
    return all_keys.subtract(pending)


@query(
    "window_rank_orders",
    oracle="""
    SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS totalprice, rk FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rk
        FROM orders
    ) WHERE rk <= 3
    """,
)
def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: top-3 orders per customer. Single shuffle on the partition
    key; deterministic tie-break on o_orderkey."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "o_custkey", "o_orderkey", F.round("o_totalprice", 4).alias("totalprice"), "rk"
        )
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
               AS running_total
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic frame window: per-customer running revenue."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 4).alias("running_total"),
    )


@query(
    "rollup_orders",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS cnt,
           round(sum(o_totalprice), 4) AS total
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
)
def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (absent in the reference; SURVEY.md §2.4 gap list)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("o_totalprice"), 4).alias("total"))
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "cnt",
            "total",
        )
    )


@query(
    "cube_events",
    oracle="""
    SELECT coalesce(event_type, 'ALL') AS etype,
           coalesce(strftime(date_trunc('day', ts), '%Y-%m-%d'), 'ALL') AS day,
           count(*) AS cnt
    FROM events
    GROUP BY CUBE(event_type, date_trunc('day', ts))
    """,
)
def cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over type × day."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn("day", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd"))
        .cube("event_type", "day")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.coalesce(F.col("event_type"), F.lit("ALL")).alias("etype"),
            F.coalesce(F.col("day"), F.lit("ALL")).alias("day"),
            "cnt",
        )
    )


@query(
    "topk_parts",
    oracle="""
    SELECT p_partkey, p_name, round(p_retailprice, 4) AS price
    FROM part
    ORDER BY p_retailprice DESC, p_partkey
    LIMIT 20
    """,
)
def topk_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT: Spark plans TakeOrderedAndProject — per-partition top-k
    then a single k-row merge at the driver; no global sort at 100 TB."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
        .limit(20)
        .select("p_partkey", "p_name", F.round("p_retailprice", 4).alias("price"))
    )


@query(
    "agg_stats_lineitem",
    oracle="""
    SELECT l_returnflag,
           count(*) AS cnt,
           count(DISTINCT l_partkey) AS n_parts,
           round(min(l_extendedprice), 4) AS min_price,
           round(max(l_extendedprice), 4) AS max_price,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(stddev_samp(l_extendedprice), 4) AS sd_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scalar-agg battery incl. exact COUNT DISTINCT (expands to a two-phase
    agg; partials keep the shuffle narrow)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("cnt"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.round(F.min("l_extendedprice"), 4).alias("min_price"),
        F.round(F.max("l_extendedprice"), 4).alias("max_price"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
    )


@query(
    "time_bucket_events",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket,
           event_type,
           count(*) AS cnt,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def time_bucket_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling-window aggregation, batch form (the streaming twin in
    streamds_spark.streaming uses window()+watermark; reference has no event time
    at all — SURVEY.md §2.9 ST10)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn(
            "hour_bucket", F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
        )
        .groupBy("hour_bucket", "event_type")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


@query(
    "brand_revenue",
    oracle="""
    SELECT p_brand, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim with broadcast + agg on a dim attribute."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "events_json_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, count(*) AS cnt
    FROM events
    GROUP BY 1
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON column extraction (reference ships JSON everywhere —
    operator I/O, buffers — core_process_utils.go json.Marshal; here it's a
    first-class expression)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(F.get_json_object("props", "$.k").cast("bigint").alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("cnt"))
    )
