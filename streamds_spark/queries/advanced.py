"""Advanced operators beyond the reference's surface: as-of join, range join,
sessionization, exact percentiles, approximate distinct, n-gram mining.

These are the operators Spark lacks as single primitives but that compose from
DataFrame ops (SURVEY build-plan stance: composition first, Pandas UDF only
when semantics demand it — none here do).

Scale posture:
  - sessionize / as-of: one shuffle on the partition key (user_id); windows run
    sorted within partitions. Skewed users are AQE's problem (skew-join split
    doesn't apply to windows, so a pathological single-user stream would need
    salted pre-aggregation — documented in ARCHITECTURE.md).
  - range join: the band table is tiny → broadcast nested-loop, fact side
    never shuffles.
  - percentiles: exact percentile is a full sort per group key — fine for
    bounded groups; at 100 TB unbounded-cardinality groups should use
    approx_percentile (HLL-sketch cousin, see approx_distinct_parts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.registry import query

SESSION_GAP_MIN = 30


@query(
    "sessionize_events",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_MIN * 60 * 1000000}
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts,
               CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
        FROM ordered
    )
    SELECT user_id, session_no, count(*) AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
    FROM sess GROUP BY user_id, session_no
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (gap > 30 min starts a new session): lag → flag → running
    sum → session aggregate. The batch twin of streaming session windows."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    flagged = events.withColumn(
        "new_sess",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > gap_us),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_no",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
    )


@query(
    "asof_last_click",
    oracle="""
    WITH ce AS (
        SELECT event_id, user_id, ts, event_type FROM events
        WHERE event_type IN ('click', 'error')
    ),
    w AS (
        SELECT event_id, user_id, ts, event_type,
               max(CASE WHEN event_type = 'click' THEN ts END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click
        FROM ce
    )
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS error_ts,
           strftime(last_click, '%Y-%m-%d %H:%M:%S') AS last_click_ts
    FROM w WHERE event_type = 'error'
    """,
)
def asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join within a stream: for every error event, the most recent prior
    click by the same user. Expressed as a running max over a CASE — one
    shuffle on user_id, no self-join blow-up. (max(ts ROWS ≤ current) is the
    as-of backward lookup; NULL = no prior click.)"""
    events = load_table(spark, sf_dir, "events")
    ce = events.filter(F.col("event_type").isin("click", "error")).select(
        "event_id", "user_id", "ts", "event_type"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    withclick = ce.withColumn(
        "last_click", F.max(F.when(F.col("event_type") == "click", F.col("ts"))).over(w)
    )
    return withclick.filter(F.col("event_type") == "error").select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("error_ts"),
        F.date_format("last_click", "yyyy-MM-dd HH:mm:ss").alias("last_click_ts"),
    )


_BANDS = [(i, 900.0 + 20.0 * i, 900.0 + 20.0 * (i + 1)) for i in range(5)]  # p_retailprice ∈ [900, 1000)


@query(
    "range_join_price_bands",
    oracle=f"""
    WITH bands(band_id, lo, hi) AS (VALUES {", ".join(f"({b}, {lo}, {hi})" for b, lo, hi in _BANDS)})
    SELECT band_id, count(*) AS n_parts, round(avg(p_retailprice), 4) AS avg_price
    FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
    GROUP BY band_id
    """,
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join: non-equi join against a tiny interval table →
    broadcast nested loop; the part scan never shuffles."""
    part = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(_BANDS, ["band_id", "lo", "hi"])
    return (
        part.join(
            F.broadcast(bands),
            (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
        )
        .groupBy("band_id")
        .agg(F.count("*").alias("n_parts"), F.round(F.avg("p_retailprice"), 4).alias("avg_price"))
    )


@query(
    "percentiles_lineitem",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
    FROM lineitem GROUP BY l_returnflag
    """,
)
def percentiles_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (interpolated) percentiles per group. At unbounded scale switch to
    approx_percentile — same plan shape, sketch-mergeable partials."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("l_extendedprice", F.lit(0.50)), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.75)), 4).alias("p75"),
        F.round(F.percentile("l_extendedprice", F.lit(0.95)), 4).alias("p95"),
    )


@query("approx_distinct_parts", oracle=None)  # HLL sketch ≠ DuckDB's sketch; bounded-error test in pytest
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the 100 TB cardinality path —
    fixed-size mergeable sketches instead of the exact distinct's full shuffle.
    tests/test_advanced.py bounds the error vs the exact count."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.count("*").alias("cnt"),
    )


@query(
    "bigram_counts",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS t
        FROM documents
    ),
    bg AS (
        SELECT unnest(CASE WHEN len(t) >= 2
               THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
               ELSE [] END) AS bigram
        FROM toks
    )
    SELECT bigram, count(*) AS cnt FROM bg GROUP BY bigram HAVING count(*) > 1
    """,
)
def bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram mining (bigrams) over the corpus — explode + partial-agg count;
    the building block for phrase-dedup and contamination checks."""
    from streamds_spark.functions.text import shingles_expr, tokens

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(tokens(F.col("text")).alias("toks"))
        .select(F.explode(shingles_expr("toks", 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 1)
    )


@query(
    "session_window_native",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_MIN * 60 * 1000000}
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS session_no
        FROM ordered
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events
    FROM sess GROUP BY user_id, session_no
    """,
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's built-in session_window (gap-close sessions) in batch mode —
    must agree with the hand-rolled lag/cumsum sessionization (the oracle is
    that formulation). One shuffle; state-store-backed in streaming."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("sw"), F.col("user_id")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("sw.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


@query(
    "time_spine_gap_fill",
    oracle="""
    WITH spine AS (
        SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                      TIMESTAMP '2024-01-30 23:00:00',
                                      INTERVAL 1 HOUR)) AS hr
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    observed AS (
        -- exact integer micro-units: a double mean rounds differently across
        -- engines at half boundaries (Spark rounds the shortest decimal
        -- string, DuckDB the binary value — observed at sf0.1), so the mean
        -- is carried as (Σvalue in 1e-6 units, count) and rounded half-up in
        -- pure BIGINT arithmetic after the forward fill
        SELECT date_trunc('hour', ts) AS hr, event_type,
               count(*) AS c,
               CAST(sum(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS t
        FROM events GROUP BY 1, 2
    ),
    joined AS (
        SELECT s.hr, ty.event_type, o.c, o.t
        FROM spine s CROSS JOIN types ty
        LEFT JOIN observed o ON o.hr = s.hr AND o.event_type = ty.event_type
    ),
    filled AS (
        SELECT hr, event_type, c,
               last_value(t IGNORE NULLS)
                   OVER (PARTITION BY event_type ORDER BY hr
                         ROWS UNBOUNDED PRECEDING) AS ff_t,
               last_value(c IGNORE NULLS)
                   OVER (PARTITION BY event_type ORDER BY hr
                         ROWS UNBOUNDED PRECEDING) AS ff_c
        FROM joined
    )
    SELECT strftime(hr, '%Y-%m-%d %H:%M:%S') AS hour,
           event_type,
           CAST(coalesce(c, 0) AS BIGINT) AS n_events,
           -- half-up to 4 decimals in integer math (values are >= 0):
           -- floor((2t + d) / 2d) with d = 100*c, result in 1e-4 units
           CAST((2 * ff_t + 100 * ff_c) // (200 * ff_c) AS DOUBLE) / 10000.0
               AS avg_value_ff,
           (c IS NULL) AS is_gap
    FROM filled
    """,
)
def time_spine_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: a dense hourly spine per event_type, left-joined
    with observed hourly aggregates; empty hours get count 0 and a
    forward-filled value (last non-null, IGNORE NULLS window) — the
    resample+ffill primitive Spark lacks.

    Scale posture: the spine is generated (sequence+explode, no scan) and the
    window runs over the AGGREGATED series (one row per hour×type), partitioned
    by the series key — never over raw events. A year of hourly data per key is
    ~9k rows per window partition regardless of corpus size."""
    events = load_table(spark, sf_dir, "events")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01 00:00:00").cast("timestamp"),
                F.lit("2024-01-30 23:00:00").cast("timestamp"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hr")
    )
    types = events.select("event_type").distinct()
    observed = events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("ohr"),
        F.col("event_type").alias("otype"),
    ).agg(
        F.count("*").alias("c"),
        # exact micro-unit sum; rounding happens in BIGINT math after the
        # fill (see oracle comment — engine round() modes differ on doubles)
        (F.sum(F.col("value").cast("decimal(18,6)")) * 1000000)
        .cast("long")
        .alias("t"),
    )
    joined = (
        spine.crossJoin(F.broadcast(types))
        .join(
            observed,
            (F.col("ohr") == F.col("hr")) & (F.col("otype") == F.col("event_type")),
            "left",
        )
    )
    w = Window.partitionBy("event_type").orderBy("hr").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    filled = joined.select(
        "hr",
        "event_type",
        "c",
        F.last("t", ignorenulls=True).over(w).alias("ff_t"),
        F.last("c", ignorenulls=True).over(w).alias("ff_c"),
    )
    # half-up to 4 decimals in integer math: floor((2t + d) / 2d), d = 100*c
    q = F.expr("(2 * ff_t + 100 * ff_c) DIV (200 * ff_c)")
    return filled.select(
        F.date_format("hr", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "event_type",
        F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("n_events"),
        (q.cast("double") / F.lit(10000.0)).alias("avg_value_ff"),
        F.col("c").isNull().alias("is_gap"),
    )


@query(
    "winsorized_stats_lineitem",
    oracle="""
    WITH bounds AS (
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.05) AS lo,
               quantile_cont(l_extendedprice, 0.95) AS hi
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           round(b.lo, 4) AS p05,
           round(b.hi, 4) AS p95,
           round(CAST(sum(CAST(greatest(b.lo, least(b.hi, l.l_extendedprice))
                               AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) + 0.0
               AS winsorized_mean,
           round(CAST(sum(CASE WHEN l.l_extendedprice BETWEEN b.lo AND b.hi
                               THEN CAST(l.l_extendedprice AS DECIMAL(18,6))
                               ELSE 0 END) AS DOUBLE)
                 / sum(CASE WHEN l.l_extendedprice BETWEEN b.lo AND b.hi
                            THEN 1 ELSE 0 END), 4) + 0.0 AS trimmed_mean,
           CAST(sum(CASE WHEN l.l_extendedprice < b.lo THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clip_low,
           CAST(sum(CASE WHEN l.l_extendedprice > b.hi THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clip_high
    FROM lineitem l JOIN bounds b USING (l_returnflag)
    GROUP BY l.l_returnflag, b.lo, b.hi
    """,
)
def winsorized_stats_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group statistics: winsorized mean (values clamped to
    [p05, p95]) and trimmed mean (values outside dropped), plus clip counts.
    Bounds come from an exact-percentile aggregate over the same table,
    broadcast back (few groups, 2 doubles each); means carry DECIMAL(18,6)
    sums so partial-agg order cannot perturb the rounded result (registry
    contract). Two column-pruned scans + one broadcast join at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.05)).alias("lo"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("hi"),
    )
    j = li.join(F.broadcast(bounds), "l_returnflag")
    clamped = F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("l_extendedprice")))
    inb = F.col("l_extendedprice").between(F.col("lo"), F.col("hi"))
    return (
        j.groupBy("l_returnflag", "lo", "hi")
        .agg(
            F.count("*").alias("n"),
            F.sum(clamped.cast("decimal(18,6)")).cast("double").alias("wsum"),
            F.sum(
                F.when(inb, F.col("l_extendedprice").cast("decimal(18,6)")).otherwise(
                    F.lit(0).cast("decimal(18,6)")
                )
            )
            .cast("double")
            .alias("tsum"),
            F.sum(inb.cast("long")).alias("tn"),
            F.sum((F.col("l_extendedprice") < F.col("lo")).cast("long")).alias(
                "n_clip_low"
            ),
            F.sum((F.col("l_extendedprice") > F.col("hi")).cast("long")).alias(
                "n_clip_high"
            ),
        )
        .select(
            "l_returnflag",
            "n",
            F.round("lo", 4).alias("p05"),
            F.round("hi", 4).alias("p95"),
            (F.round(F.col("wsum") / F.col("n"), 4) + 0.0).alias("winsorized_mean"),
            (F.round(F.col("tsum") / F.col("tn"), 4) + 0.0).alias("trimmed_mean"),
            "n_clip_low",
            "n_clip_high",
        )
    )


@query(
    "interval_overlap_pairs",
    oracle=r"""
    WITH o AS (
        SELECT o_orderkey AS k, o_custkey AS c,
               datediff('day', DATE '1970-01-01', o_orderdate) AS s
        FROM orders
    )
    SELECT a.c AS o_custkey, CAST(count(*) AS BIGINT) AS n_pairs
    FROM o a JOIN o b
      ON a.c = b.c AND a.k < b.k AND a.s <= b.s + 7 AND b.s <= a.s + 7
    GROUP BY a.c
    """,
)
def interval_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided interval join: per customer, pairs of their orders whose
    7-day fulfillment windows [orderdate, orderdate+7d] overlap
    (o_custkey, n_pairs) — the concurrency-detection query shape.

    Plan: operators/interval_join.overlap_join — each window explodes to at
    most two 8-day bins, the join is a pure (bin, custkey) equi-join with the
    overlap + responsibility predicates as post-conditions (NO nested-loop
    join; each overlapping pair emitted exactly once by the bin holding the
    overlap start). The a.key < b.key filter dedupes the symmetric pair and
    drops self-matches. Scales as a normal keyed equi-join: skewed customers
    or hot weeks are AQE-splittable."""
    from streamds_spark.operators.interval_join import overlap_join

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).alias("s"),
    )
    a = o.select(
        F.col("o_orderkey").alias("a_key"),
        "o_custkey",
        F.col("s").alias("a_s"),
        (F.col("s") + 7).alias("a_e"),
    )
    b = o.select(
        F.col("o_orderkey").alias("b_key"),
        "o_custkey",
        F.col("s").alias("b_s"),
        (F.col("s") + 7).alias("b_e"),
    )
    pairs = overlap_join(
        a, b, "a_s", "a_e", "b_s", "b_e", bin_size=8, keys=["o_custkey"]
    ).filter(F.col("a_key") < F.col("b_key"))
    return pairs.groupBy("o_custkey").agg(
        F.count("*").cast("bigint").alias("n_pairs")
    )


JOURNEY_LEN = 5
JOURNEY_TOPK = 20


@query(
    "top_user_journeys",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_MIN * 60 * 1000000}
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts, event_id, event_type,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_no
        FROM ordered
    ),
    paths AS (
        SELECT user_id, session_no,
               array_to_string(
                   list_slice(list(event_type ORDER BY ts, event_id),
                              1, {JOURNEY_LEN}), '>') AS journey
        FROM sess GROUP BY user_id, session_no
    )
    SELECT journey, CAST(count(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY journey
    ORDER BY n_sessions DESC, journey LIMIT {JOURNEY_TOPK}
    """,
)
def top_user_journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey mining: the top-{JOURNEY_TOPK} most common session-opening
    event paths (first {JOURNEY_LEN} event types of each 30-min-gap session,
    joined with '>'). Path assembly is an ORDERED collect per session —
    sort_array over (ts, event_id, type) structs makes the sequence
    deterministic (a bare collect_list is not), so the path STRINGS are
    hash-exact across engines.

    Plan: the same user-partitioned lag/flag/cumsum as sessionize_events,
    then one (user, session) aggregate whose value is a bounded prefix (the
    per-session state is min({JOURNEY_LEN}, session length) types after the
    slice), and a TakeOrdered {JOURNEY_TOPK}-row tail. At 100 TB sessions
    are user-bounded; no global window, no corpus-sized collect."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    flagged = events.withColumn(
        "new_sess",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > gap_us),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_no",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    paths = (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("evs")
        )
        .select(
            F.array_join(
                F.slice(
                    F.transform(F.col("evs"), lambda x: x["event_type"]),
                    1,
                    JOURNEY_LEN,
                ),
                ">",
            ).alias("journey")
        )
    )
    return (
        paths.groupBy("journey")
        .agg(F.count("*").cast("bigint").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "journey")
        .limit(JOURNEY_TOPK)
    )
