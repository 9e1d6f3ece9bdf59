"""Second analytics wave: pivot, arg-max selection, correlation/covariance,
lag/lead deltas, conditional aggregation, string extraction — rounding out the
scalar/aggregate function surface (all absent in the reference; SURVEY.md §2.8
lists its entire scalar repertoire as split/contains/concat/cast)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.registry import query

_ETYPES = ["click", "view", "purchase", "signup", "error"]


@query(
    "pivot_events",
    oracle=f"""
    SELECT user_id,
           {", ".join(f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS {t}" for t in _ETYPES)}
    FROM events GROUP BY user_id
    """,
)
def pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide): per-user event-type counts as columns. Fixed pivot
    values keep it a single-pass agg (no distinct-values pre-query)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .pivot("event_type", _ETYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _ETYPES)
    )


@query(
    "dedup_keep_best",
    oracle="""
    SELECT lang,
           arg_max(doc_id, n_chars ORDER BY n_chars DESC, doc_id) AS best_doc_id,
           max(n_chars) AS best_n_chars,
           count(*) AS group_size
    FROM documents GROUP BY lang
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-selection dedup: keep the 'best' doc per group (arg-max by
    quality proxy, ties → lowest doc_id). The struct-max trick: one partial-agg
    shuffle, no window, no self-join — THE pattern for keep-one-per-cluster at
    scale (cluster id from LSH replaces lang in production)."""
    docs = load_table(spark, sf_dir, "documents")
    # max over (n_chars, -doc_id) struct = arg_max with deterministic ties
    best = F.max(F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg_id"))).alias("b")
    return (
        docs.groupBy("lang")
        .agg(best, F.count("*").alias("group_size"))
        .select(
            "lang",
            (-F.col("b.neg_id")).cast("bigint").alias("best_doc_id"),
            F.col("b.n_chars").alias("best_n_chars"),
            "group_size",
        )
    )


@query(
    "corr_value_hour",
    oracle="""
    SELECT event_type,
           round(corr(value, CAST(hour(ts) AS DOUBLE)), 4) AS corr_vh,
           round(covar_samp(value, CAST(hour(ts) AS DOUBLE)), 4) AS covar_vh
    FROM events GROUP BY event_type
    """,
)
def corr_value_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: correlation/covariance (mergeable moments —
    partial-agg friendly at any scale)."""
    events = load_table(spark, sf_dir, "events")
    h = F.hour("ts").cast("double")
    return events.groupBy("event_type").agg(
        F.round(F.corr("value", h), 4).alias("corr_vh"),
        F.round(F.covar_samp("value", h), 4).alias("covar_vh"),
    )


@query(
    "lag_lead_deltas",
    oracle="""
    SELECT event_id, user_id,
           round(value - lag(value) OVER w, 4) AS delta_prev,
           round(lead(value) OVER w - value, 4) AS delta_next
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def lag_lead_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytic functions: per-user value deltas in event order."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta_prev"),
        F.round(F.lead("value").over(w) - F.col("value"), 4).alias("delta_next"),
    )


@query(
    "conditional_agg_orders",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
           round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 4) AS finished_value
    FROM orders GROUP BY o_orderpriority
    """,
)
def conditional_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (FILTER/CASE): several metrics in ONE scan+shuffle
    instead of N filtered sub-queries."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        F.round(
            F.sum(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))), 4
        ).alias("finished_value"),
    )


@query(
    "regex_extract_parts",
    oracle="""
    SELECT regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           count(*) AS cnt,
           CAST(sum(p_size) AS BIGINT) AS total_size
    FROM part GROUP BY 1
    """,
)
def regex_extract_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract as a grouping key — string-function surface check."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy(F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"))
        .agg(F.count("*").alias("cnt"), F.sum("p_size").alias("total_size"))
    )


@query(
    "scalar_subquery_above_avg",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 4) AS totalprice
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    """,
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders above the global average price (two-pass:
    1-row agg broadcast into the filter)."""
    orders = load_table(spark, sf_dir, "orders")
    avg_price = orders.agg(F.avg("o_totalprice").alias("a"))
    return (
        orders.crossJoin(F.broadcast(avg_price))
        .filter(F.col("o_totalprice") > F.col("a"))
        .select("o_orderkey", F.round("o_totalprice", 4).alias("totalprice"))
    )


@query(
    "group_zscore",
    oracle="""
    SELECT event_id, event_type,
           round((value - avg(value) OVER (PARTITION BY event_type)) /
                 stddev_samp(value) OVER (PARTITION BY event_type), 4) AS zscore
    FROM events
    """,
)
def group_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group normalization via applyInPandas (grouped-map Arrow batches) —
    the batch UDAF/transform escape hatch, oracle-checked against the pure-SQL
    window formulation. Use this path only when the logic genuinely needs
    pandas (here it demonstrably doesn't — the SQL twin IS the oracle — but
    the plumbing contract is what's under test at scale: one shuffle on the
    group key, one Python worker pass per group batch)."""
    import pandas as pd

    from streamds_spark.catalog import load_table as _lt

    events = _lt(spark, sf_dir, "events").select("event_id", "event_type", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["value"].mean()
        sd = pdf["value"].std(ddof=1)
        out = pdf[["event_id", "event_type"]].copy()
        out["zscore"] = ((pdf["value"] - mu) / sd).round(4)
        return out

    return events.groupBy("event_type").applyInPandas(
        zscore, schema="event_id bigint, event_type string, zscore double"
    )


@query(
    "skewproof_user_counts",
    oracle="""
    SELECT user_id, count(*) AS n_events
    FROM events GROUP BY user_id
    """,
)
def skewproof_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed count via the two-phase SALTED plan: partial count per
    (key, salt in 0..15), then final sum per key. Result is identical to a
    plain groupBy-count (the oracle), but a pathological hot key — one user
    with billions of events — shuffles as 16 sub-keys instead of one
    straggler partition. The second exchange carries ≤16 rows per hot key.
    (For ordinary skew, AQE's skew-split handles joins; salting is the
    aggregation-side discipline, applied here explicitly so its plan shape is
    pinned and driver-verified.)"""
    from streamds_spark.io.sinks import salted_count

    events = load_table(spark, sf_dir, "events")
    return salted_count(events.select("user_id"), "user_id", n_salts=16).select(
        "user_id", F.col("cnt").alias("n_events")
    )


@query(
    "value_outliers_mad",
    oracle=r"""
    WITH med AS (
        SELECT event_type, median(value) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, median(adev) AS mad FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN d.adev > 3.0 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers,
           round(any_value(d.med), 4) AS med,
           round(m.mad, 4) AS mad
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type, m.mad
    """,
)
def value_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: |value - median| > 3·MAD per event_type.

    Two grouped exact medians (event_type cardinality is tiny, so the median
    buffers are small) + two BROADCAST joins of the per-type scalars back onto
    the fact — the events table itself is scanned twice but never shuffled.
    At 100 TB swap median→approx_percentile(0.5) to keep the agg buffers
    bounded; the plan shape is unchanged."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.median("adev").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "mad")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("adev") > 3.0 * F.col("mad"), 1).otherwise(0)).alias(
                "n_outliers"
            ),
            F.round(F.any_value("med"), 4).alias("med"),
        )
        .select(
            "event_type", "n", "n_outliers", "med", F.round("mad", 4).alias("mad")
        )
    )


@query(
    "retention_cohorts",
    oracle=r"""
    WITH first_seen AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               CAST(datediff('day', f.cohort_week, date_trunc('week', e.ts)) / 7 AS INT)
                   AS week_no
        FROM events e JOIN first_seen f USING (user_id)
    )
    SELECT CAST(cohort_week AS VARCHAR) AS cohort_week, week_no,
           CAST(count(*) AS BIGINT) AS n_active
    FROM activity GROUP BY cohort_week, week_no
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: users bucketed by first-seen week, counted
    distinct in each subsequent week. Two shuffles on user_id (first-seen agg
    + the equi-join back onto events — co-partitioned, so AQE coalesces into
    one logical exchange pair) and a final small aggregate; the cohort matrix
    is weeks² rows."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_ts")
    )
    activity = (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            F.col("cohort_ts").cast("date").alias("cohort_week"),
            (
                F.datediff(F.date_trunc("week", F.col("ts")).cast("date"), F.col("cohort_ts").cast("date"))
                / 7
            )
            .cast("int")
            .alias("week_no"),
        )
        .distinct()
    )
    return activity.groupBy(
        F.col("cohort_week").cast("string").alias("cohort_week"), "week_no"
    ).agg(F.count("*").alias("n_active"))


@query(
    "rfm_scores",
    oracle=r"""
    WITH mx AS (SELECT max(o_orderdate) AS maxd FROM orders),
    base AS (
        SELECT o_custkey AS custkey,
               datediff('day', max(o_orderdate), any_value(mx.maxd)) AS recency_days,
               count(*) AS frequency,
               round(sum(o_totalprice), 4) AS monetary
        FROM orders CROSS JOIN mx
        GROUP BY o_custkey
    )
    SELECT custkey, CAST(recency_days AS INT) AS recency_days,
           CAST(frequency AS BIGINT) AS frequency, monetary,
           CAST(6 - ntile(5) OVER (ORDER BY recency_days, custkey) AS INT) AS r_score,
           CAST(ntile(5) OVER (ORDER BY frequency, custkey) AS INT) AS f_score,
           CAST(ntile(5) OVER (ORDER BY monetary, custkey) AS INT) AS m_score
    FROM base
    """,
)
def rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency/frequency/monetary with quintile
    scores (recency inverted so 5 = most recent). The corpus-wide max date is
    a broadcast 1-row aggregate; the per-customer rollup is one shuffle. The
    quintiles are EXACT ntile values (oracle hash-identical) computed
    distributed: per-dimension bucketed global rank (operators/ranking.py —
    approxQuantile boundary literals + per-bucket row_number + broadcast
    offsets) and closed-form ANSI ntile arithmetic — no
    `WindowExec: No Partition Defined` single-partition sort anywhere, so the
    per-customer output survives a 100× customer count."""
    from streamds_spark.operators.ranking import ntile_from_rank, with_global_ranks

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    mx = orders.agg(F.max("o_orderdate").alias("maxd"))
    base = (
        orders.crossJoin(F.broadcast(mx))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.datediff(F.any_value("maxd"), F.max("o_orderdate")).alias("recency_days"),
            F.count("*").alias("frequency"),
            F.round(F.sum("o_totalprice"), 4).alias("monetary"),
        )
    )
    # the rank passes re-read this per-customer aggregate several times —
    # truncate lineage so each pass is a scan, not a re-aggregation of orders
    # (at cluster scale this would be a checkpoint/staging table)
    base = base.localCheckpoint()
    n_total = F.lit(base.count())

    # one batched rank pass (2 driver jobs for all three metrics instead of
    # 2 each — guide §1.3) adds the three rank columns in place, so the three
    # per-metric join-backs on custkey disappear too: custkey is unique here
    # (groupBy key), so the joined result was row-identical to this select
    ranked = with_global_ranks(
        base,
        [
            (["recency_days", "custkey"], "_rk_r"),
            (["frequency", "custkey"], "_rk_f"),
            (["monetary", "custkey"], "_rk_m"),
        ],
    )

    def score(rk: str, invert: bool) -> Column:
        bucket = ntile_from_rank(F.col(rk), n_total, 5)
        return ((6 - bucket) if invert else bucket).cast("int")

    return ranked.select(
        "custkey",
        F.col("recency_days").cast("int").alias("recency_days"),
        "frequency",
        "monetary",
        score("_rk_r", invert=True).alias("r_score"),
        score("_rk_f", invert=False).alias("f_score"),
        score("_rk_m", invert=False).alias("m_score"),
    )


@query(
    "event_transition_matrix",
    oracle=r"""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS next_type
        FROM events
    ),
    trans AS (
        SELECT event_type AS from_type, next_type AS to_type, count(*) AS c
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    ),
    tot AS (
        SELECT from_type, CAST(sum(c) AS BIGINT) AS n FROM trans GROUP BY from_type
    )
    SELECT t.from_type, t.to_type, CAST(t.c AS BIGINT) AS c,
           CAST((2 * t.c * 10000 + tot.n) // (2 * tot.n) AS DOUBLE) / 10000.0
               AS p
    FROM trans t JOIN tot USING (from_type)
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition estimate between consecutive event types
    per user: one window over the user's time-ordered stream (same shuffle a
    sessionization pays), then an event-type²-sized aggregate; row totals
    derive from that aggregate and broadcast. The probability rounds half-up
    in integer math (c/n lands on exact 4-decimal halves for round counts —
    the registry contract's engine-round divergence)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("next_type", F.lead("event_type").over(w))
    trans = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type"))
        .agg(F.count("*").alias("c"))
    )
    tot = trans.groupBy("from_type").agg(F.sum("c").alias("n"))
    return (
        trans.join(F.broadcast(tot), "from_type")
        .select(
            "from_type",
            "to_type",
            "c",
            (
                F.expr("(2 * c * 10000 + n) DIV (2 * n)").cast("double") / F.lit(10000.0)
            ).alias("p"),
        )
    )


@query(
    "cumulative_distinct_users",
    oracle=r"""
    WITH firsts AS (
        SELECT user_id, min(date_trunc('hour', ts)) AS h FROM events GROUP BY user_id
    ),
    per_hour AS (SELECT h, count(*) AS new_users FROM firsts GROUP BY h)
    SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
           CAST(new_users AS BIGINT) AS new_users,
           CAST(sum(new_users) OVER (ORDER BY h) AS BIGINT) AS cum_users
    FROM per_hour
    """,
)
def cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users to date, per day — via the first-occurrence rewrite:
    cumulative COUNT(DISTINCT) equals a running SUM of first-seen flags. The
    naive windowed collect_set/count_distinct materializes the full user set
    per output row (quadratic, unbounded window state); this is one user_id
    aggregate + a date-sized running sum."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min(F.date_trunc("hour", F.col("ts"))).alias("h"))
    per_hour = firsts.groupBy("h").agg(F.count("*").alias("new_users"))
    w = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return per_hour.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )


PCTL_ACCURACY = 100  # percentile_approx accuracy ⇒ rank error ≤ n/accuracy


@query(
    "approx_percentile_audit",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           round(quantile_cont(l_extendedprice, 0.50), 4) AS exact_p50,
           TRUE AS sketch_within_bound
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_percentile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch QA for the 100 TB percentile path: percentile_approx (GK
    sketch, mergeable partials — the only viable percentile at unbounded
    scale) audited against its own rank-error guarantee. The sketch's median
    estimate must sit at a rank within n/accuracy of n/2; the flag is
    computed from actual rank counts of the estimate, so the row
    hash-verifies only if the guarantee held. exact_p50 rides along as the
    directly-comparable column."""
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.percentile("l_extendedprice", F.lit(0.50)).alias("exact_p50"),
        F.percentile_approx(
            "l_extendedprice", F.lit(0.50), F.lit(PCTL_ACCURACY)
        ).alias("approx_p50"),
    )
    ranked = li.join(F.broadcast(stats), "l_returnflag").groupBy(
        "l_returnflag", "n", "exact_p50", "approx_p50"
    ).agg(
        F.sum((F.col("l_extendedprice") < F.col("approx_p50")).cast("long")).alias(
            "n_below"
        ),
        F.sum((F.col("l_extendedprice") <= F.col("approx_p50")).cast("long")).alias(
            "n_at_or_below"
        ),
    )
    eps = F.col("n").cast("double") / PCTL_ACCURACY
    half = F.col("n").cast("double") / 2
    within = (F.col("n_below") <= half + eps) & (
        F.col("n_at_or_below") >= half - eps
    )
    return ranked.select(
        "l_returnflag",
        "n",
        F.round("exact_p50", 4).alias("exact_p50"),
        within.alias("sketch_within_bound"),
    )


@query(
    "equidepth_histogram_price",
    oracle=r"""
    WITH r AS (
        SELECT l_extendedprice AS p,
               ntile(16) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber)
                   AS bucket
        FROM lineitem
    )
    SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
           round(min(p), 4) + 0.0 AS lo, round(max(p), 4) + 0.0 AS hi
    FROM r GROUP BY bucket
    """,
)
def equidepth_histogram_price(
    spark: SparkSession, sf_dir: str, exact: bool = True
) -> DataFrame:
    """ANALYZE-style equi-depth histogram of l_extendedprice: 16 buckets of
    (near-)equal row count with their value ranges (bucket, n_rows, lo, hi) —
    the optimizer-statistics primitive for selectivity estimation, and the
    equal-mass complement of the equal-width value_histogram.

    Plan: the distributed exact global rank (approxQuantile pre-bucketing +
    per-bucket row_number + broadcast offsets — no single-partition
    WindowExec) feeds the closed-form ANSI ntile arithmetic, then a 16-row
    aggregate. The ranked relation is localCheckpoint'd (staging table at
    cluster scale) so the 1-row n_total aggregate doesn't re-run the rank
    pipeline. Ties at bucket boundaries are broken by (orderkey, linenumber)
    so both engines split them identically."""
    from streamds_spark.operators.ranking import (
        approx_equidepth_buckets,
        ntile_from_rank,
        with_global_rank,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("p"), "l_orderkey", "l_linenumber"
    )
    if not exact:
        # sketch path (exact=False): ONE percentile_approx aggregate for the
        # 15 inner edges + a broadcast map-side assignment — no rank, no
        # B-way sort; depths off by ≤2N/accuracy (bound audited by
        # equidepth_approx_audit and the paired divergence test)
        return (
            approx_equidepth_buckets(li.select("p"), "p", 16)
            .groupBy("bucket")
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                (F.round(F.min("p"), 4) + F.lit(0.0)).alias("lo"),
                (F.round(F.max("p"), 4) + F.lit(0.0)).alias("hi"),
            )
        )
    ranked = with_global_rank(
        li, ["p", "l_orderkey", "l_linenumber"], "_rk"
    ).localCheckpoint()
    tot = ranked.agg(F.max("_rk").alias("n_total"))
    bucket = ntile_from_rank(F.col("_rk"), F.col("n_total"), 16)
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select("p", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            (F.round(F.min("p"), 4) + F.lit(0.0)).alias("lo"),
            (F.round(F.max("p"), 4) + F.lit(0.0)).alias("hi"),
        )
    )


@query(
    "equidepth_approx_audit",
    oracle=r"""
    SELECT CAST(i AS INT) AS edge_idx, TRUE AS within_bound
    FROM generate_series(1, 15) t(i)
    """,
)
def equidepth_approx_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-error audit for the approximate equi-depth histogram path
    (equidepth_histogram_price(exact=False)): each of the 15 sketch edges
    must sit at a true rank within N/accuracy of its k·N/16 target — the GK
    guarantee, checked against EXACT rank counts (tie-proof form: an edge
    inside a tie group is in-bound iff the group's rank span intersects the
    tolerance window). The oracle row is literal TRUE×15, so the query
    hash-verifies only if the sketch honored its bound on this data.

    Plan: one percentile_approx aggregate (1 row, broadcast) + ONE map-side
    pass computing all 30 exact rank counts as conditional sums — no window,
    no join, no rank machinery; this audit shape is exactly what a 100 TB
    deployment runs as a canary next to the sketch path."""
    from streamds_spark.operators.ranking import approx_equidepth_buckets  # noqa: F401

    n_b = 16
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("p")
    )
    pcts = F.array(*[F.lit(k / n_b) for k in range(1, n_b)])
    edges = li.agg(
        F.percentile_approx("p", pcts, F.lit(PCTL_ACCURACY)).alias("_edges")
    )
    aggs = [F.count("*").alias("n")]
    for k in range(1, n_b):
        e = F.element_at("_edges", k)
        aggs.append(F.sum((F.col("p") < e).cast("long")).alias(f"below_{k}"))
        aggs.append(F.sum((F.col("p") <= e).cast("long")).alias(f"ate_{k}"))
    row = li.crossJoin(F.broadcast(edges)).agg(*aggs)
    eps = F.col("n").cast("double") / PCTL_ACCURACY
    checks = []
    for k in range(1, n_b):
        target = F.col("n").cast("double") * (k / n_b)
        ok = (F.col(f"below_{k}") <= target + eps) & (
            F.col(f"ate_{k}") >= target - eps
        )
        checks.append(F.struct(F.lit(k).alias("edge_idx"), ok.alias("within_bound")))
    return row.select(
        F.explode(F.array(*checks)).alias("c")
    ).select(F.col("c.edge_idx").cast("int").alias("edge_idx"), "c.within_bound")


EWMA_ALPHA = 0.2


@query(
    "ewma_daily_orders",
    oracle=f"""
    WITH RECURSIVE daily AS (
        SELECT o_orderdate AS day, CAST(count(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1
    ),
    seq AS (
        SELECT day, n_orders, row_number() OVER (ORDER BY day) AS i FROM daily
    ),
    -- the same left-fold the Spark side runs: s_1 = x_1,
    -- s_t = a*x_t + (1-a)*s_(t-1), one day per recursion step
    ew(i, day, n_orders, s) AS (
        SELECT i, day, n_orders, CAST(n_orders AS DOUBLE) FROM seq WHERE i = 1
      UNION ALL
        SELECT seq.i, seq.day, seq.n_orders,
               {EWMA_ALPHA} * seq.n_orders + {1 - EWMA_ALPHA} * ew.s
        FROM ew JOIN seq ON seq.i = ew.i + 1
    )
    SELECT day, n_orders, round(s, 4) + 0.0 AS ewma FROM ew ORDER BY day
    """,
)
def ewma_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of the daily order count
    (alpha={A}) — the time-series smoothing dial dashboards put next to raw
    counts. EWMA is a sequential recurrence (s_t depends on s_(t-1)), which
    neither engine has as a builtin and which a prefix-sum trick cannot
    compute STABLY (the closed form needs (1-a)^(-t), which overflows by
    t~1000), so both engines run the IDENTICAL left-fold: Spark as one
    `F.aggregate` over the date-sorted (day, count) array — the corpus
    collapses to a DATE-DOMAIN-bounded relation (~2.4k rows at any SF)
    before the fold, no window anywhere — and DuckDB as a recursive CTE
    advancing one day per step. Same multiply/add order per step -> the
    doubles agree bit-for-bit, hash-exact after round(4).

    At 100 TB: the only corpus-sized work is the map-side-combined daily
    count; the fold itself is O(date domain) on one task, the right place
    for an inherently sequential recurrence."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.count("*").cast("bigint").alias("n_orders")
    )
    pairs = daily.agg(
        F.sort_array(F.collect_list(F.struct(F.col("day"), F.col("n_orders")))).alias("xs")
    )
    ew = F.aggregate(
        F.col("xs"),
        F.expr("CAST(array() AS ARRAY<DOUBLE>)"),
        lambda acc, x: F.concat(
            acc,
            F.array(
                F.when(F.size(acc) == 0, x["n_orders"].cast("double")).otherwise(
                    F.lit(EWMA_ALPHA) * x["n_orders"].cast("double")
                    + F.lit(1 - EWMA_ALPHA) * F.element_at(acc, -1)
                )
            ),
        ),
    ).alias("s")
    z = pairs.select(F.posexplode(F.arrays_zip(F.col("xs"), ew)).alias("i", "z"))
    return z.select(
        F.col("z.xs.day").alias("day"),
        F.col("z.xs.n_orders").alias("n_orders"),
        (F.round(F.col("z.s"), 4) + F.lit(0.0)).alias("ewma"),
    ).orderBy("day")


@query(
    "funnel_conversion",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1
    )
    SELECT (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events) AS n_users,
           (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_viewed,
           (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_clicked,
           (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchased,
           round(CAST((SELECT count(*) FROM c) AS DOUBLE)
                 / NULLIF((SELECT count(*) FROM v), 0), 4) + 0.0 AS view_to_click,
           round(CAST((SELECT count(*) FROM p) AS DOUBLE)
                 / NULLIF((SELECT count(*) FROM c), 0), 4) + 0.0 AS click_to_purchase,
           round(CAST((SELECT count(*) FROM p) AS DOUBLE)
                 / NULLIF((SELECT count(*) FROM v), 0), 4) + 0.0 AS overall_conversion
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: a user counts at
    each stage only if the stage's FIRST qualifying event happens strictly
    after the previous stage's (min-timestamp staging, the standard funnel
    semantics — an early purchase before any view does not convert).

    Plan: three user-keyed aggregates chained by joins ON THE SAME KEY —
    every shuffle hashes user_id, so AQE/exchange reuse keeps it one
    partitioning end to end; the final census is 1-row crossJoins of
    broadcast aggregates. At 100 TB: per-stage state is one row per
    SURVIVING user, monotonically shrinking down the funnel."""
    events = load_table(spark, sf_dir, "events")
    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    counts = (
        events.agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
        .crossJoin(F.broadcast(v.agg(F.count("*").cast("bigint").alias("n_viewed"))))
        .crossJoin(F.broadcast(c.agg(F.count("*").cast("bigint").alias("n_clicked"))))
        .crossJoin(F.broadcast(p.agg(F.count("*").cast("bigint").alias("n_purchased"))))
    )

    def rate(num, den):
        return (
            F.round(
                num.cast("double") / F.nullif(den.cast("double"), F.lit(0.0)), 4
            )
            + F.lit(0.0)
        )

    return counts.select(
        "n_users",
        "n_viewed",
        "n_clicked",
        "n_purchased",
        rate(F.col("n_clicked"), F.col("n_viewed")).alias("view_to_click"),
        rate(F.col("n_purchased"), F.col("n_clicked")).alias("click_to_purchase"),
        rate(F.col("n_purchased"), F.col("n_viewed")).alias("overall_conversion"),
    )


@query(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_w
        FROM events GROUP BY 1
    ),
    act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events)
    SELECT strftime(f.cohort_w, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', CAST(f.cohort_w AS DATE), CAST(a.w AS DATE)) / 7
                AS INT) AS week_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM act a JOIN firsts f USING (user_id)
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention over the event stream: users cohorted by the
    week of their first event; n_active = distinct cohort members active in
    cohort week + offset. The classic retention triangle.

    Plan: one per-user min (shuffle on user_id), one distinct on
    (user, week) — WEEK-domain bounded fan-in — then a user-keyed join and a
    (cohort, offset)-keyed count. Every relation after the first aggregate
    is bounded by users x weeks, not events."""
    events = load_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_w")
    )
    act = events.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("w")
    ).distinct()
    return (
        act.join(firsts, "user_id")
        .groupBy(
            F.date_format("cohort_w", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.col("w").cast("date"), F.col("cohort_w").cast("date")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


BASKET_MIN_SUPPORT = 3


@query(
    "basket_lift_pairs",
    oracle=f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    n AS (SELECT CAST(count(DISTINCT o) AS DOUBLE) AS n_orders FROM items),
    cnt AS (SELECT p, CAST(count(*) AS DOUBLE) AS c FROM items GROUP BY 1),
    pairs AS (
        SELECT a.p AS u, b.p AS v, CAST(count(*) AS BIGINT) AS pair_cnt
        FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2 HAVING count(*) >= {BASKET_MIN_SUPPORT}
    )
    SELECT u, v, pair_cnt,
           round(pair_cnt / cu.c, 4) + 0.0 AS confidence,
           round(n.n_orders * pair_cnt / (cu.c * cv.c), 4) + 0.0 AS lift
    FROM pairs
    JOIN cnt cu ON cu.p = pairs.u
    JOIN cnt cv ON cv.p = pairs.v
    CROSS JOIN n
    ORDER BY round(n.n_orders * pair_cnt / (cu.c * cv.c), 6) DESC, u, v
    LIMIT 20
    """,
)
def basket_lift_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining: the 20 part pairs with the highest
    lift (co-purchase rate vs independence) at support >= {MIN_SUP} orders,
    with confidence P(v|u). The copurchase-edge build reused as a statistics
    source rather than a graph.

    Plan: order-keyed self-join bounded by per-order basket size, pair-keyed
    count with a HAVING floor that prunes the long tail BEFORE the stats
    joins, part-keyed count table joins (vocabulary-sized), broadcast 1-row
    total, TakeOrdered 20. The support floor is what keeps the pair relation
    from tracking the quadratic tail at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    n = items.agg(F.countDistinct("o").cast("double").alias("n_orders"))
    cnt = items.groupBy("p").agg(F.count("*").cast("double").alias("c"))
    pairs = (
        items.toDF("o", "u")
        .join(items.toDF("o", "v"), "o")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").cast("bigint").alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= BASKET_MIN_SUPPORT)
    )
    lift = F.col("n_orders") * F.col("pair_cnt") / (F.col("cu") * F.col("cv"))
    return (
        pairs.join(cnt.toDF("u", "cu"), "u")
        .join(cnt.toDF("v", "cv"), "v")
        .crossJoin(F.broadcast(n))
        .select(
            "u",
            "v",
            "pair_cnt",
            (F.round(F.col("pair_cnt") / F.col("cu"), 4) + F.lit(0.0)).alias(
                "confidence"
            ),
            (F.round(lift, 4) + F.lit(0.0)).alias("lift"),
            F.round(lift, 6).alias("_ord"),
        )
        .orderBy(F.desc("_ord"), "u", "v")
        .limit(20)
        .drop("_ord")
    )


@query(
    "rfm_segments",
    oracle="""
    WITH custagg AS (
        SELECT o_custkey AS c,
               date_diff('day', CAST(max(o_orderdate) AS DATE),
                         (SELECT CAST(max(o_orderdate) AS DATE) FROM orders))
                   AS recency_days,
               CAST(count(*) AS BIGINT) AS frequency,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
        FROM orders GROUP BY 1
    ),
    q AS (
        SELECT c, monetary,
               ntile(4) OVER (ORDER BY recency_days, c) AS r_q,
               ntile(4) OVER (ORDER BY frequency, c) AS f_q,
               ntile(4) OVER (ORDER BY CAST(monetary AS DOUBLE), c) AS m_q
        FROM custagg
    )
    SELECT r_q, f_q, m_q,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(CAST(sum(monetary) AS DOUBLE) / count(*), 4) + 0.0 AS avg_monetary
    FROM q GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — recency/frequency/monetary quartiles
    (quartile 1 = most recent / fewest orders / lowest spend under ascending
    order; ties broken by customer key so the cut is a total order) and the
    64-cell segment census marketing actually reads.

    The three quartile assignments are exact global ntiles WITHOUT a global
    window: operators/ranking.with_global_rank (range-bucketed distributed
    row numbers) + closed-form ntile_from_rank per metric, on the
    CUSTOMER-sized relation. Monetary is summed as DECIMAL (exact, so
    cross-engine order agrees) and ORDERED as double in both engines (ulp
    ties then fall to the customer-key tie-break identically). Oracle uses
    DuckDB's native ntile over the same total orders — proving the
    distributed rank arithmetic against the engine builtin three times in
    one query."""
    from streamds_spark.operators.ranking import ntile_from_rank, with_global_ranks

    orders = load_table(spark, sf_dir, "orders")
    maxd = orders.agg(F.max(F.col("o_orderdate").cast("date")).alias("_maxd"))
    cust = (
        orders.groupBy(F.col("o_custkey").alias("c"))
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("_last"),
            F.count("*").cast("bigint").alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
        )
        .crossJoin(F.broadcast(maxd))
        .withColumn(
            "recency_days", F.datediff(F.col("_maxd"), F.col("_last")).cast("int")
        )
        .withColumn("monetary_d", F.col("monetary").cast("double"))
        .localCheckpoint(eager=False)  # the rank pass + the total read it
    )
    # one batched rank pass: 2 driver jobs for all three metrics instead of
    # 2 each (guide §1.3); rank values identical to the sequential calls
    ranked = with_global_ranks(
        cust,
        [
            (["recency_days", "c"], "r_rank"),
            (["frequency", "c"], "f_rank"),
            (["monetary_d", "c"], "m_rank"),
        ],
    )
    total = cust.agg(F.count("*").cast("bigint").alias("_n"))
    seg = ranked.crossJoin(F.broadcast(total)).select(
        ntile_from_rank(F.col("r_rank"), F.col("_n"), 4).alias("r_q"),
        ntile_from_rank(F.col("f_rank"), F.col("_n"), 4).alias("f_q"),
        ntile_from_rank(F.col("m_rank"), F.col("_n"), 4).alias("m_q"),
        "monetary",
    )
    return (
        seg.groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            (
                F.round(
                    F.sum("monetary").cast("double") / F.count("*"), 4
                )
                + F.lit(0.0)
            ).alias("avg_monetary"),
        )
        .orderBy("r_q", "f_q", "m_q")
    )


@query(
    "event_type_runs",
    oracle="""
    WITH runs AS (
        SELECT user_id, event_type,
               sum(new_run) OVER (PARTITION BY user_id ORDER BY rowid_ord
                                  ROWS UNBOUNDED PRECEDING) AS run_id
        FROM (
            SELECT user_id, event_type, new_run,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rowid_ord
            FROM (
                SELECT user_id, event_type, ts, event_id,
                       CASE WHEN lag(event_type) OVER
                                 (PARTITION BY user_id ORDER BY ts, event_id)
                                 IS DISTINCT FROM event_type
                            THEN 1 ELSE 0 END AS new_run
                FROM events
            )
        )
    ),
    per_run AS (
        SELECT user_id, event_type, run_id, CAST(count(*) AS BIGINT) AS run_len
        FROM runs GROUP BY 1, 2, 3
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_runs,
           CAST(max(run_len) AS BIGINT) AS longest_run,
           CAST(max(CASE WHEN run_len >= 2 THEN run_len ELSE 0 END) AS BIGINT)
               AS longest_repeat
    FROM per_run GROUP BY 1
    ORDER BY 1
    """,
)
def event_type_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over each user's event stream: consecutive
    same-event-type runs (lag-flag -> running-sum island ids), then per-user
    run census (count, longest run, longest repeated run). The classic
    island construction every warehouse interview asks for, distributed the
    obvious way: all windows are PARTITIONED BY user_id — per-user sequences
    sort locally after one hash exchange, never a global sort."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.withColumn(
        "new_run",
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        ).otherwise(0),
    )
    runs = flagged.withColumn(
        "run_id",
        F.sum("new_run").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_run = runs.groupBy("user_id", "event_type", "run_id").agg(
        F.count("*").cast("bigint").alias("run_len")
    )
    return (
        per_run.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_runs"),
            F.max("run_len").cast("bigint").alias("longest_run"),
            F.max(
                F.when(F.col("run_len") >= 2, F.col("run_len")).otherwise(0)
            )
            .cast("bigint")
            .alias("longest_repeat"),
        )
        .orderBy("user_id")
    )


@query(
    "weekly_trend_by_event_type",
    oracle="""
    WITH weekly AS (
        SELECT event_type,
               CAST(date_diff('day',
                    (SELECT date_trunc('week', min(ts)) FROM events),
                    date_trunc('week', ts)) / 7 AS BIGINT) AS wk,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    s AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(wk) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(wk * y) AS BIGINT) AS sxy,
               CAST(sum(wk * wk) AS BIGINT) AS sxx
        FROM weekly GROUP BY 1
    )
    SELECT event_type, n AS n_weeks, sy AS total_events,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / NULLIF(n * sxx - sx * sx, 0), 4) + 0.0 AS slope_per_week
    FROM s ORDER BY event_type
    """,
)
def weekly_trend_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type linear trend of weekly volumes: least-squares slope
    from the closed form (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2). Week indexes and
    counts are INTEGERS, so every sum is exact BIGINT arithmetic in both
    engines and the slope is one IEEE division of identical integers —
    hash-exact with no float-ordering caveats. Shape: one map-side-combined
    weekly rollup, then a 5-sum aggregate per group over the week-domain-
    bounded relation."""
    events = load_table(spark, sf_dir, "events")
    week0 = events.agg(
        F.date_trunc("week", F.min("ts")).alias("_w0")
    )
    weekly = (
        events.crossJoin(F.broadcast(week0))
        .groupBy(
            "event_type",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("_w0").cast("date"),
                )
                / 7
            )
            .cast("bigint")
            .alias("wk"),
        )
        .agg(F.count("*").cast("bigint").alias("y"))
    )
    s = weekly.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("wk").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("wk") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("wk") * F.col("wk")).cast("bigint").alias("sxx"),
    )
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        "event_type",
        F.col("n").alias("n_weeks"),
        F.col("sy").alias("total_events"),
        (
            F.round(
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                    "double"
                )
                / F.nullif(denom.cast("double"), F.lit(0.0)),
                4,
            )
            + F.lit(0.0)
        ).alias("slope_per_week"),
    ).orderBy("event_type")


@query(
    "attribution_multi_touch",
    oracle="""
    WITH conv AS (
        SELECT user_id, event_id AS conv_id, ts AS conv_ts
        FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
        SELECT user_id, event_id AS touch_id, event_type AS touch_type,
               ts AS touch_ts
        FROM events WHERE event_type IN ('click', 'view', 'signup')
    ),
    j AS (
        SELECT c.conv_id, t.touch_type, t.touch_ts, t.touch_id
        FROM conv c JOIN touch t ON c.user_id = t.user_id
        WHERE t.touch_ts <= c.conv_ts
          AND t.touch_ts > c.conv_ts - INTERVAL 7 DAY
    ),
    ranked AS (
        SELECT touch_type,
               row_number() OVER (PARTITION BY conv_id
                                  ORDER BY touch_ts, touch_id) AS rn_first,
               row_number() OVER (PARTITION BY conv_id
                                  ORDER BY touch_ts DESC, touch_id DESC)
                   AS rn_last,
               count(*) OVER (PARTITION BY conv_id) AS n_total
        FROM j
    )
    SELECT touch_type,
           CAST(count(*) FILTER (WHERE rn_first = 1) AS BIGINT) AS first_touch,
           CAST(count(*) FILTER (WHERE rn_last = 1) AS BIGINT) AS last_touch,
           CAST(sum(1000000 // n_total) AS BIGINT) AS linear_micro,
           CAST(count(*) AS BIGINT) AS n_touches
    FROM ranked GROUP BY touch_type ORDER BY touch_type
    """,
)
def attribution_multi_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch marketing attribution: every purchase is a conversion, and
    the user's click/view/signup events in the 7 days up to it are its touch
    path. Three credit models side by side per touch type — first-touch and
    last-touch as exact conversion counts (ties broken by event_id), and
    linear credit in integer MICRO-UNITS (1000000 div n_touches per touch,
    integer division) so every output column is BIGINT and the whole report
    is hash-exact — fractional-credit double sums would be partial-agg-order
    sensitive at the half-ulp, truncated micro-credits are not.

    Plan: conversions join touches on user_id (one equi-shuffle; the time
    range is a post-join filter on co-located rows), then windows PARTITIONED
    by conversion id — per-conversion paths are short (a user's week), so
    state per window is the path, never the stream. At 100 TB: the join
    hashes user_id on both sides, skew follows user activity (salting rule
    applies if a bot user dominates), and the final aggregate is 3 rows."""
    events = load_table(spark, sf_dir, "events")
    conv = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("conv_id"),
        F.col("ts").alias("conv_ts"),
    )
    touch = events.filter(
        F.col("event_type").isin("click", "view", "signup")
    ).select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("touch_type"),
        F.col("ts").alias("touch_ts"),
    )
    j = conv.join(touch, "user_id").where(
        (F.col("touch_ts") <= F.col("conv_ts"))
        & (F.col("touch_ts") > F.col("conv_ts") - F.expr("INTERVAL 7 DAY"))
    )
    w = Window.partitionBy("conv_id")
    ranked = j.select(
        "touch_type",
        F.row_number()
        .over(w.orderBy("touch_ts", "touch_id"))
        .alias("rn_first"),
        F.row_number()
        .over(w.orderBy(F.col("touch_ts").desc(), F.col("touch_id").desc()))
        .alias("rn_last"),
        F.count("*").over(w).alias("n_total"),
    )
    return (
        ranked.groupBy("touch_type")
        .agg(
            F.sum(F.when(F.col("rn_first") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("first_touch"),
            F.sum(F.when(F.col("rn_last") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("last_touch"),
            F.sum(F.expr("1000000 div n_total")).cast("bigint").alias("linear_micro"),
            F.count("*").cast("bigint").alias("n_touches"),
        )
        .orderBy("touch_type")
    )


@query(
    "hourly_burst_anomalies",
    oracle="""
    WITH hourly AS (
        SELECT event_type,
               strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ),
    base AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_hours,
               CAST(sum(cnt) AS BIGINT) AS total
        FROM hourly GROUP BY 1
    )
    SELECT h.event_type, h.hour_bucket, h.cnt, b.n_hours, b.total
    FROM hourly h JOIN base b ON h.event_type = b.event_type
    WHERE h.cnt * b.n_hours > 2 * b.total
    ORDER BY h.event_type, h.hour_bucket
    """,
)
def hourly_burst_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-burst anomaly detection: hours where an event type's count
    exceeds 2x its own per-hour mean across observed hours. The comparison
    is the INTEGER cross-multiplication cnt * n_hours > 2 * total — no
    division, no doubles — so the flag set is hash-exact by construction
    (the mean-based formulation would hinge on float rounding at the
    boundary).

    Plan: one map-side-combined hourly rollup (time-domain bounded), a
    per-type 5-row baseline broadcast back onto it, and a filter. At 100 TB
    the only corpus-sized work is the first rollup; everything after lives
    on the (type x hour) domain."""
    events = load_table(spark, sf_dir, "events")
    hourly = (
        events.withColumn(
            "hour_bucket",
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss"),
        )
        .groupBy("event_type", "hour_bucket")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    base = hourly.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_hours"),
        F.sum("cnt").cast("bigint").alias("total"),
    )
    return (
        hourly.join(F.broadcast(base), "event_type")
        .where(F.col("cnt") * F.col("n_hours") > 2 * F.col("total"))
        .select("event_type", "hour_bucket", "cnt", "n_hours", "total")
        .orderBy("event_type", "hour_bucket")
    )


@query(
    "revenue_concentration",
    oracle="""
    WITH cust AS (
        SELECT o_custkey,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1
    ),
    ranked AS (
        SELECT cents,
               row_number() OVER (ORDER BY cents, o_custkey) AS rank
        FROM cust
    ),
    base AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS total_cents,
               CAST(sum(rank * cents) AS BIGINT) AS weighted_cents
        FROM ranked
    ),
    topk AS (
        SELECT CAST(sum(r.cents) AS BIGINT) AS top_decile_cents
        FROM ranked r, base b
        WHERE r.rank > b.n - CAST(ceil(b.n / 10.0) AS BIGINT)
    )
    SELECT b.n, b.total_cents, b.weighted_cents, t.top_decile_cents,
           round(2.0 * b.weighted_cents / (b.n * b.total_cents)
                 - (b.n + 1.0) / b.n, 4) + 0.0 AS gini_r,
           round(CAST(t.top_decile_cents AS DOUBLE) / b.total_cents, 4) + 0.0
               AS top_decile_share_r
    FROM base b, topk t
    """,
)
def revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration census: the Gini coefficient of per-customer
    revenue plus the top-decile share — the inequality dials a marketplace
    dashboard pairs with RFM. Every numerator is an EXACT BIGINT (revenue
    in half-up cents, ranks from the distributed exact-rank machinery —
    operators/ranking.py, no global window on the Spark side), so the two
    rounded ratios divide identical integers in both engines and the whole
    row is hash-exact.

    Plan: one customer aggregate (map-side combined), the bucketed rank
    pass (approxQuantile boundaries + per-bucket row_number — the same
    no-global-window discipline as rfm_scores), then two 1-row aggregates.
    At 100 TB nothing beyond the customer rollup is corpus-sized."""
    from streamds_spark.operators.ranking import with_global_rank

    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.sum(
            F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
        ).cast("bigint").alias("cents")
    )
    ranked = with_global_rank(cust, ["cents", "o_custkey"], rank_col="rank")
    base = ranked.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.sum(F.col("rank") * F.col("cents")).cast("bigint").alias("weighted_cents"),
    )
    topk = (
        ranked.crossJoin(F.broadcast(base.select("n")))
        .where(F.col("rank") > F.col("n") - F.ceil(F.col("n") / 10.0))
        .agg(F.sum("cents").cast("bigint").alias("top_decile_cents"))
    )
    return (
        base.crossJoin(F.broadcast(topk))
        .selectExpr(
            "n",
            "total_cents",
            "weighted_cents",
            "top_decile_cents",
            "round(CAST(2 AS DOUBLE) * weighted_cents / (n * total_cents)"
            " - (CAST(n AS DOUBLE) + 1) / n, 4) + 0.0 AS gini_r",
            "round(CAST(top_decile_cents AS DOUBLE) / total_cents, 4) + 0.0"
            " AS top_decile_share_r",
        )
    )


@query(
    "weekday_seasonality_uniformity",
    oracle="""
    WITH dow AS (
        SELECT event_type, CAST(strftime(ts, '%w') AS INT) AS dow,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ),
    base AS (
        SELECT event_type, CAST(sum(cnt) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS n_dows
        FROM dow GROUP BY 1
    )
    SELECT d.event_type,
           b.total,
           b.n_dows,
           CAST(sum((7 * d.cnt - b.total) * (7 * d.cnt - b.total)) AS BIGINT)
               AS sq_dev_x49,
           CAST(max(d.cnt) AS BIGINT) AS peak_cnt,
           CAST(min(d.cnt) AS BIGINT) AS trough_cnt
    FROM dow d JOIN base b ON d.event_type = b.event_type
    GROUP BY d.event_type, b.total, b.n_dows
    ORDER BY d.event_type
    """,
)
def weekday_seasonality_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonality census per event type: day-of-week counts reduced
    to a uniformity statistic whose numerator is EXACT — sq_dev_x49 =
    Σ(7·observed − total)², which is 49·Σ(observed − total/7)², i.e. the
    chi-square numerator scaled by 49·expected so no division (and no float)
    ever happens. Callers derive chi2 = sq_dev_x49 / (49 · total/7) =
    sq_dev_x49 / (7 · total) when they want the classical statistic; peak
    and trough counts give the human-readable seasonality span.

    Plan: one map-side-combined (type × dow) rollup — ≤ 35 groups here,
    always |types|·7 — then arithmetic on that bounded relation. At 100 TB
    the only corpus-sized work is the first aggregate."""
    events = load_table(spark, sf_dir, "events")
    dow = (
        events.groupBy(
            "event_type", (F.dayofweek("ts") - 1).alias("dow")
        )
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    base = dow.groupBy("event_type").agg(
        F.sum("cnt").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("n_dows"),
    )
    return (
        dow.join(F.broadcast(base), "event_type")
        .groupBy("event_type", "total", "n_dows")
        .agg(
            F.sum(
                (7 * F.col("cnt") - F.col("total"))
                * (7 * F.col("cnt") - F.col("total"))
            )
            .cast("bigint")
            .alias("sq_dev_x49"),
            F.max("cnt").cast("bigint").alias("peak_cnt"),
            F.min("cnt").cast("bigint").alias("trough_cnt"),
        )
        .orderBy("event_type")
    )


@query(
    "decayed_event_type_scores",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ),
    anchor AS (SELECT max(day) AS d0 FROM daily),
    scored AS (
        SELECT d.event_type,
               d.cnt * (1000000 >> least(CAST(a.d0 - d.day AS BIGINT), 62))
                   AS w_cnt,
               d.cnt
        FROM daily d, anchor a
    )
    SELECT event_type,
           CAST(sum(w_cnt) AS BIGINT) AS decayed_score_micro,
           CAST(sum(cnt) AS BIGINT) AS total_cnt
    FROM scored GROUP BY event_type
    ORDER BY decayed_score_micro DESC, event_type
    """,
)
def decayed_event_type_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed activity score per event type — the "what's hot
    NOW" recency dial: each day's count is weighted by 2^-age (age in days
    from the newest day in the table), realized as the INTEGER weight
    1000000 >> age, so the score is an exact BIGINT (weights hit 0 past 20
    days — the natural cutoff a half-life of one day implies at micro
    resolution) and the ranking is hash-exact with no float anywhere.

    This is the batch form of a decayed-counter state: per-day (type, cnt)
    partials are mergeable (sum), and re-anchoring to a new "now" only
    re-weights the day-domain-bounded rollup — at 100 TB yesterday's daily
    counts never recompute, the same posture as the rolling-MAU registers."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").cast("bigint").alias("cnt"))
    anchor = daily.agg(F.max("day").alias("d0"))
    scored = daily.crossJoin(F.broadcast(anchor)).selectExpr(
        "event_type",
        "cnt",
        "cnt * shiftright(1000000, CAST(least(datediff(d0, day), 62) AS INT))"
        " AS w_cnt",
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.sum("w_cnt").cast("bigint").alias("decayed_score_micro"),
            F.sum("cnt").cast("bigint").alias("total_cnt"),
        )
        .orderBy(F.col("decayed_score_micro").desc(), "event_type")
    )
