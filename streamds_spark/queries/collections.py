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


@query(
    "moving_average",
    oracle="""
    SELECT event_id, user_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS ma3
    FROM events
    """,
)
def moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-frame moving average (last 3 events per user)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return events.select(
        "event_id", "user_id", F.round(F.avg("value").over(w), 4).alias("ma3")
    )


@query(
    "rank_variants",
    oracle="""
    SELECT o_orderkey,
           dense_rank() OVER w AS drk,
           rank() OVER w AS rk,
           round(percent_rank() OVER w, 4) AS prk
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def rank_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dense_rank / rank / percent_rank in one window."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        F.dense_rank().over(w).alias("drk"),
        F.rank().over(w).alias("rk"),
        F.round(F.percent_rank().over(w), 4).alias("prk"),
    )


@query(
    "first_last_value",
    oracle="""
    SELECT DISTINCT user_id,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND UNBOUNDED FOLLOWING) AS last_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value over full-partition frames: each user's first and
    last event type."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return events.select(
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
    ).distinct()


@query(
    "tumbling_window_counts",
    oracle="""
    SELECT strftime(to_timestamp((epoch_us(ts) // 2700000000) * 2700),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS cnt
    FROM events GROUP BY 1, 2
    """,
)
def tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native F.window tumbling aggregation with a NON-hour-aligned width
    (45 min) — proves epoch-aligned window assignment, not just date_trunc.
    The streaming twin is identical minus the watermark."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "45 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "cnt",
        )
    )


@query(
    "hopping_window_counts",
    oracle="""
    WITH assigned AS (
        SELECT event_type,
               unnest([ (epoch_us(ts) // 1800000000) * 1800,
                        (epoch_us(ts) // 1800000000) * 1800 - 1800 ]) AS ws,
               epoch_us(ts) // 1000000 AS es
        FROM events
    )
    SELECT strftime(to_timestamp(ws), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS cnt
    FROM assigned
    WHERE es >= ws AND es < ws + 3600
    GROUP BY 1, 2
    """,
)
def hopping_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) windows: 60-min windows every 30 min — each event
    lands in 2 windows (F.window with a slide duration; the oracle assigns
    windows by epoch arithmetic)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "60 minutes", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "cnt",
        )
    )


@query(
    "rolling_median_value",
    oracle="""
    SELECT event_id, user_id,
           round(quantile_cont(CAST(value AS DOUBLE), 0.5)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 19 PRECEDING AND CURRENT ROW), 4)
               AS rolling_median
    FROM events
    """,
)
def rolling_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median (exact, interpolated) of each user's value over their
    last 20 events — the robust-smoothing primitive outlier-heavy telemetry
    needs where a rolling mean lies.

    One shuffle on user_id; the frame percentile sorts only the 20-row frame
    per step. At very large frames switch to approx_percentile (sketch
    partials); the plan shape is identical."""
    events = load_table(spark, sf_dir, "events")
    return events.selectExpr(
        "event_id",
        "user_id",
        """round(percentile(CAST(value AS DOUBLE), 0.5)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 19 PRECEDING AND CURRENT ROW), 4)
           AS rolling_median""",
    )


@query(
    "basket_brand_lift",
    oracle=r"""
    WITH ob AS (
        SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    n AS (SELECT count(DISTINCT okey) AS n_orders FROM ob),
    bc AS (SELECT brand, count(*) AS c FROM ob GROUP BY brand),
    pairs AS (
        SELECT a.brand AS brand_a, b.brand AS brand_b, count(*) AS together
        FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
        GROUP BY a.brand, b.brand
    )
    SELECT p.brand_a, p.brand_b, CAST(p.together AS BIGINT) AS together,
           round(CAST(p.together AS DOUBLE) * n.n_orders / (ca.c * cb.c), 4) AS lift
    FROM pairs p
    JOIN bc ca ON ca.brand = p.brand_a
    JOIN bc cb ON cb.brand = p.brand_b
    CROSS JOIN n
    WHERE p.together >= 5
    """,
)
def basket_brand_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket brand co-occurrence with lift — the association-rule
    screen. The per-order brand set is built ONCE (collect_set: one shuffle on
    orderkey, dedup inside the aggregate); pairs are then generated LOCALLY
    from the sorted array (fan-out bounded by per-order brand count, no
    self-join), and the brand marginals and order count consume the SAME
    aggregated subtree — Spark plans ReusedExchange, so lineitem is scanned
    once for all three. A together>=5 support floor keeps the output stable."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    sets = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("l_orderkey").alias("okey"))
        .agg(F.array_sort(F.collect_set("p_brand")).alias("brands"))
    )
    # ONE explode emits pair rows, marginal rows (brand_b NULL), and an
    # order-count marker row (both NULL), so pair counts, brand marginals,
    # and n_orders all come out of a single downstream aggregate — one
    # lineitem scan, one okey shuffle, one small agg. (Separate consumers of
    # `sets` would each re-plan the whole subtree: column pruning makes them
    # non-identical, defeating exchange reuse — the q11/q15 lesson.) The
    # brand²-sized result is localCheckpoint'd so its three readers below
    # reuse the materialized rows.
    combined = sets.select(
        F.explode(
            F.expr(
                """
                concat(
                  CASE WHEN size(brands) >= 2 THEN
                    flatten(transform(sequence(1, size(brands) - 1),
                      i -> transform(sequence(0, i - 1),
                        j -> struct(brands[j] AS brand_a, brands[i] AS brand_b))))
                  ELSE array() END,
                  transform(brands, b -> struct(b AS brand_a, CAST(NULL AS STRING) AS brand_b)),
                  array(struct(CAST(NULL AS STRING) AS brand_a, CAST(NULL AS STRING) AS brand_b))
                )
                """
            )
        ).alias("p")
    )
    agg = (
        combined.groupBy(F.col("p.brand_a").alias("ba"), F.col("p.brand_b").alias("bb"))
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint()
    )
    n = agg.filter(F.col("ba").isNull()).select(F.col("cnt").alias("n_orders"))
    bc = agg.filter(F.col("ba").isNotNull() & F.col("bb").isNull()).select(
        F.col("ba").alias("brand"), F.col("cnt").alias("c")
    )
    pairs = agg.filter(
        F.col("ba").isNotNull() & F.col("bb").isNotNull() & (F.col("cnt") >= 5)
    ).select(
        F.col("ba").alias("brand_a"), F.col("bb").alias("brand_b"), F.col("cnt").alias("together")
    )
    ca = F.broadcast(bc.select(F.col("brand").alias("brand_a"), F.col("c").alias("ca")))
    cb = F.broadcast(bc.select(F.col("brand").alias("brand_b"), F.col("c").alias("cb")))
    return (
        pairs.join(ca, "brand_a")
        .join(cb, "brand_b")
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            "together",
            F.round(
                F.col("together").cast("double") * F.col("n_orders") / (F.col("ca") * F.col("cb")), 4
            ).alias("lift"),
        )
    )
