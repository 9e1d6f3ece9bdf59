"""Time-series smoothing: exponentially weighted moving average (EWMA) over
the hourly per-event-type series.

EWMA is recursive (y_t = α·x_t + (1-α)·y_{t-1}) and therefore not directly a
window aggregate. The distributed-safe rewrite used here truncates the
expansion at K lags: y_t ≈ Σ_{j<K} (1-α)^j·x_{t-j} / Σ_{j<K} (1-α)^j, whose
truncation error is (1-α)^K ≈ 2e-4 of the oldest mass at K=24, α=0.3 — below
the 4-decimal rounding the result carries. Both engines evaluate the SAME
left-associated 24-term expression over identical lag values, so the float
result is bit-identical (fixed IEEE op order, no parallel reduction).

Scale posture: the window runs over the AGGREGATED hourly series (one row per
hour × type), partitioned by the series key — a year of hourly data is ~9k
rows per key regardless of raw event volume; raw events only feed one
partial-agg shuffle. Hourly sums go through DECIMAL(18,6) so partial-agg
order cannot perturb the float (registry contract).
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.registry import query

ALPHA = 0.3
K_LAGS = 24
_W = [(1.0 - ALPHA) ** j for j in range(K_LAGS)]


def _oracle() -> str:
    num = " + ".join(
        f"CASE WHEN lag(x, {j}) OVER w IS NULL THEN 0.0 "
        f"ELSE {w!r} * lag(x, {j}) OVER w END"
        for j, w in enumerate(_W)
    )
    den = " + ".join(
        f"CASE WHEN lag(x, {j}) OVER w IS NULL THEN 0.0 ELSE {w!r} END"
        for j, w in enumerate(_W)
    )
    return f"""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hr,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS x,
               count(*) AS n_events
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, strftime(hr, '%Y-%m-%d %H:%M:%S') AS hour, n_events,
           round(({num}) / ({den}), 4) + 0.0 AS ewma_value
    FROM hourly
    WINDOW w AS (PARTITION BY event_type ORDER BY hr)
    """


@query("ewma_hourly_value", oracle=_oracle())
def ewma_hourly_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated-EWMA smoothing of the hourly value sum per event type (the
    streaming-dashboard primitive: trend with exponential decay)."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("x"),
        F.count("*").alias("n_events"),
    )
    w = Window.partitionBy("event_type").orderBy("hr")
    lags = [F.lag("x", j).over(w) for j in range(K_LAGS)]
    num = reduce(
        add,
        [
            F.when(lag.isNull(), F.lit(0.0)).otherwise(F.lit(wj) * lag)
            for lag, wj in zip(lags, _W)
        ],
    )
    den = reduce(
        add,
        [
            F.when(lag.isNull(), F.lit(0.0)).otherwise(F.lit(wj))
            for lag, wj in zip(lags, _W)
        ],
    )
    return hourly.select(
        "event_type",
        F.date_format("hr", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "n_events",
        (F.round(num / den, 4) + 0.0).alias("ewma_value"),
    )


ACF_MAX_LAG = 12


def _acf_oracle() -> str:
    pairs = ", ".join(f"{k}, lag(n, {k}) OVER w" for k in range(1, ACF_MAX_LAG + 1))
    return f"""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hr,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    with_lags AS (
        SELECT event_type, n,
               {", ".join(f"lag(n, {k}) OVER w AS y{k}" for k in range(1, ACF_MAX_LAG + 1))}
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY hr)
    ),
    lagged AS (
        SELECT event_type, n,
               unnest([{", ".join("{'lag': " + str(k) + ", 'y': y" + str(k) + "}" for k in range(1, ACF_MAX_LAG + 1))}]) AS p
        FROM with_lags
    ),
    suff AS (
        SELECT event_type, p.lag AS lag,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(n) AS BIGINT) AS sx, CAST(sum(p.y) AS BIGINT) AS sy,
               CAST(sum(n * p.y) AS BIGINT) AS sxy,
               CAST(sum(n * n) AS BIGINT) AS sxx, CAST(sum(p.y * p.y) AS BIGINT) AS syy
        FROM lagged WHERE p.y IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT event_type, lag,
           CASE WHEN (cnt*sxx - sx*sx) * (cnt*syy - sy*sy) > 0
                THEN round((cnt*sxy - sx*sy) /
                           sqrt(CAST(cnt*sxx - sx*sx AS DOUBLE) * CAST(cnt*syy - sy*sy AS DOUBLE)), 4) + 0.0
                ELSE NULL END AS acf
    FROM suff
    """


@query("acf_hourly_counts", oracle=_acf_oracle())
def acf_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the hourly event-count series per event
    type, lags 1..{K}: Pearson correlation of the series with its row-lagged
    self, computed from EXACT integer sufficient stats (n, Σx, Σy, Σxy, Σx²,
    Σy² are BIGINT) so both engines evaluate the identical closed form —
    no float-accumulation-order hazard.

    Scale posture: raw events collapse in one partial-agg shuffle to the
    hourly series (~9k rows/key/year); the lag window and the per-lag corr
    run over that tiny series, partitioned by event_type."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy("hr")
    with_lags = hourly.select(
        "event_type",
        "n",
        *[
            F.lag("n", k).over(w).alias(f"y{k}")
            for k in range(1, ACF_MAX_LAG + 1)
        ],
    )
    lagged = with_lags.select(
        "event_type",
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(k).alias("lag"), F.col(f"y{k}").alias("y"))
                    for k in range(1, ACF_MAX_LAG + 1)
                ]
            )
        ).alias("p"),
    ).select("event_type", "n", "p.lag", "p.y").filter(F.col("y").isNotNull())
    suff = lagged.groupBy("event_type", "lag").agg(
        F.count("*").alias("cnt"),
        F.sum("n").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("n") * F.col("y")).alias("sxy"),
        F.sum(F.col("n") * F.col("n")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    var_x = F.col("cnt") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("cnt") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("cnt") * F.col("sxy") - F.col("sx") * F.col("sy")
    return suff.select(
        "event_type",
        "lag",
        F.when(
            var_x * var_y > 0,
            F.round(cov / F.sqrt(var_x.cast("double") * var_y.cast("double")), 4)
            + 0.0,
        ).alias("acf"),
    )
