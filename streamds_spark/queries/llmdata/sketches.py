"""Mergeable sketch operators. First entry: a Count-Min sketch over corpus
term frequencies (Cormode & Muthukrishnan 2005 — public algorithm, re-derived)
whose hash functions are md5-derived, so the ENTIRE sketch is bit-identical
across engines and the estimate query is hash-checked against the DuckDB
oracle — unlike HLL (approx_distinct_parts), whose engine-internal sketch
can only get a rows-only check.

Why a sketch when groupBy(term) is exact? At 100 TB the exact vocabulary is
billions of keys; the CMS collapses the aggregation state to D×W counters
(here 4×512 = 2 KiB of longs). The groupBy below has only D·W distinct keys,
so Spark's partial (map-side) aggregation reduces each task's output to ≤2048
rows before the exchange — the shuffle is kilobytes regardless of corpus
size, and sketches from any two corpus shards merge by cell-wise addition
(the property streaming/incremental ingest needs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.functions.hashing import duckdb_md5_int, md5_int60
from streamds_spark.functions.text import tokens
from streamds_spark.operators.hll import ALPHA as _HLL_ALPHA
from streamds_spark.operators.hll import (
    duckdb_hll_sql,
    hll_estimate,
    hll_merge,
    hll_registers,
)
from streamds_spark.registry import query

HLL_M = 256
HLL_ALPHA_M2 = _HLL_ALPHA * 256 * 256
HEX = "0123456789abcdef"

CMS_DEPTH = 4  # independent hash rows; P(overestimate by >2eN) <= 2^-D
CMS_WIDTH = 512  # counters per row
CMS_TOPK = 20


def cms_cell(term, j: int):
    """Row-j counter index for a term (identical in the DuckDB oracle)."""
    return md5_int60(F.concat(F.lit(f"cms{j}:"), term)) % CMS_WIDTH


def build_cms(term_counts: DataFrame) -> DataFrame:
    """(j, cell, cellsum) sketch rows from a (term, c) frequency relation.
    One explode to D rows per term + a 2048-key groupBy (map-side combined)."""
    rows = term_counts.select(
        "c",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), cms_cell(F.col("term"), j).alias("cell")
                    )
                    for j in range(CMS_DEPTH)
                ]
            )
        ).alias("jc"),
    )
    return rows.groupBy(F.col("jc.j").alias("j"), F.col("jc.cell").alias("cell")).agg(
        F.sum("c").alias("cellsum")
    )


@query(
    "cms_term_estimates",
    oracle=rf"""
    WITH toks AS (
        SELECT unnest(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) AS term
        FROM documents
    ),
    counts AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
    sketch AS (
        SELECT j, {duckdb_md5_int("'cms' || j || ':' || term")} % {CMS_WIDTH} AS cell,
               sum(c) AS cellsum
        FROM counts CROSS JOIN range(0, {CMS_DEPTH}) t(j)
        GROUP BY 1, 2
    ),
    top AS (SELECT term, c FROM counts ORDER BY c DESC, term LIMIT {CMS_TOPK}),
    probes AS (
        SELECT term, c, j,
               {duckdb_md5_int("'cms' || j || ':' || term")} % {CMS_WIDTH} AS cell
        FROM top CROSS JOIN range(0, {CMS_DEPTH}) t(j)
    )
    SELECT p.term,
           CAST(p.c AS BIGINT) AS exact_count,
           CAST(min(s.cellsum) AS BIGINT) AS cms_estimate,
           CAST(min(s.cellsum) - p.c AS BIGINT) AS overestimate
    FROM probes p JOIN sketch s ON p.j = s.j AND p.cell = s.cell
    GROUP BY p.term, p.c
    """,
)
def cms_term_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min estimates for the top-{CMS_TOPK} corpus terms, alongside the
    exact counts: estimate = min over the D rows of the hashed cell's sum, so
    overestimate >= 0 always (the CMS guarantee) and is hash-checked exactly
    because the md5 cell hashes agree across engines.

    Plan: one exact term-count aggregate feeds both the sketch build (2048-key
    groupBy, fully map-side combined) and the probe side; the probe joins the
    2 KiB sketch broadcast. At 100 TB the exact `counts` CTE disappears — the
    sketch builds directly from exploded tokens at the same 2048-key shuffle
    cost, and exact counts exist only for whatever probe set you verify."""
    docs = load_table(spark, sf_dir, "documents")
    term_counts = (
        docs.select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    sketch = build_cms(term_counts)
    top = term_counts.orderBy(F.col("c").desc(), "term").limit(CMS_TOPK)
    probes = top.select(
        "term",
        "c",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), cms_cell(F.col("term"), j).alias("cell")
                    )
                    for j in range(CMS_DEPTH)
                ]
            )
        ).alias("jc"),
    ).select("term", "c", F.col("jc.j").alias("j"), F.col("jc.cell").alias("cell"))
    est = (
        probes.join(F.broadcast(sketch), ["j", "cell"])
        .groupBy("term", "c")
        .agg(F.min("cellsum").alias("cms_estimate"))
    )
    return est.select(
        "term",
        F.col("c").cast("bigint").alias("exact_count"),
        F.col("cms_estimate").cast("bigint").alias("cms_estimate"),
        (F.col("cms_estimate") - F.col("c")).cast("bigint").alias("overestimate"),
    )


@query(
    "hll_distinct_parts",
    oracle=f"""
    WITH hll AS ({duckdb_hll_sql("lineitem", "l_partkey").strip()}),
    exact AS (SELECT count(DISTINCT l_partkey) AS exact_distinct FROM lineitem)
    SELECT CAST(hll.n_registers AS BIGINT) AS n_registers,
           round(hll.est, 4) + 0.0 AS est_r,
           CAST(exact.exact_distinct AS BIGINT) AS exact_distinct,
           round(abs(hll.est - exact.exact_distinct)
                 / exact.exact_distinct, 4) + 0.0 AS rel_err_r
    FROM hll, exact
    """,
)
def hll_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-part estimate from the REGISTER-TABLE sketch
    (operators/hll.py) next to the exact count — the auditable twin of
    `approx_distinct_parts` (whose HLL++ buffer is opaque and therefore
    rows-only). Here the sketch is a 256-row relation built from
    deterministic md5 bit arithmetic DuckDB replays character for
    character, so the ESTIMATE ITSELF is hash-checked, and the same
    register relation is what the streaming store persists and merges
    (union + max — see tests/test_hll.py for the mergeability proof).

    Plan: one map-only hash pass + a 256-group aggregate (map-side
    combined) for the sketch; the exact count is its own distinct shuffle,
    present only because the report compares the two. At 100 TB you run
    the sketch side alone: the shuffle payload is <=256 rows per partition
    forever."""
    li = load_table(spark, sf_dir, "lineitem")
    est = hll_estimate(hll_registers(li, "l_partkey"))
    exact = li.agg(F.countDistinct("l_partkey").alias("exact_distinct"))
    return (
        est.crossJoin(F.broadcast(exact))
        .select(
            F.col("n_registers").cast("bigint").alias("n_registers"),
            (F.round("est", 4) + F.lit(0.0)).alias("est_r"),
            F.col("exact_distinct").cast("bigint").alias("exact_distinct"),
            (
                F.round(
                    F.abs(F.col("est") - F.col("exact_distinct"))
                    / F.col("exact_distinct"),
                    4,
                )
                + F.lit(0.0)
            ).alias("rel_err_r"),
        )
    )


def _cms_cell_sql(keyexpr: str) -> str:
    """DuckDB twin of cms_cell with j supplied by a VALUES join."""
    return (
        f"((('0x' || substr(md5('cms' || j || ':' || CAST({keyexpr} AS VARCHAR))"
        f", 1, 15))::BIGINT) % {CMS_WIDTH})"
    )


@query(
    "cms_join_size_estimate",
    oracle=f"""
    WITH fa AS (
        SELECT user_id AS k, count(*) AS c FROM events GROUP BY user_id
    ),
    fb AS (
        SELECT user_id AS k, count(*) AS c FROM events
        WHERE event_type = 'purchase' GROUP BY user_id
    ),
    cmsa AS (
        SELECT j, {_cms_cell_sql('k')} AS cell, sum(c) AS cs
        FROM fa, (VALUES (0), (1), (2), (3)) js(j)
        GROUP BY j, cell
    ),
    cmsb AS (
        SELECT j, {_cms_cell_sql('k')} AS cell, sum(c) AS cs
        FROM fb, (VALUES (0), (1), (2), (3)) js(j)
        GROUP BY j, cell
    ),
    est_self AS (
        SELECT min(s) AS est FROM (
            SELECT j, sum(cs * cs) AS s FROM cmsa GROUP BY j
        )
    ),
    est_cross AS (
        SELECT min(s) AS est FROM (
            SELECT a.j AS j, sum(a.cs * b.cs) AS s
            FROM cmsa a JOIN cmsb b ON a.j = b.j AND a.cell = b.cell
            GROUP BY a.j
        )
    ),
    ex_self AS (SELECT sum(c * c) AS x FROM fa),
    ex_cross AS (
        SELECT sum(fa.c * fb.c) AS x FROM fa JOIN fb ON fa.k = fb.k
    )
    SELECT 'events_selfjoin' AS pair,
           CAST(ex_self.x AS BIGINT) AS exact_rows,
           CAST(est_self.est AS BIGINT) AS est_rows,
           round(CAST(est_self.est AS DOUBLE) / ex_self.x, 4) + 0.0
               AS over_ratio_r
    FROM ex_self, est_self
    UNION ALL
    SELECT 'events_x_purchases',
           CAST(ex_cross.x AS BIGINT),
           CAST(est_cross.est AS BIGINT),
           round(CAST(est_cross.est AS DOUBLE) / ex_cross.x, 4) + 0.0
    FROM ex_cross, est_cross
    """,
)
def cms_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation from Count-Min inner products (the AGMS/CMS
    planner primitive: Alon-Gilbert-Matias-Szegedy F2 / Cormode-Muthukrishnan
    §4.3): |A join B on k| = sum_k fA(k)*fB(k), estimated as the MIN over
    the D hash rows of the sketch inner product sum_cell csA*csB — an upper
    bound that never under-estimates (collisions only add mass; proven as a
    property test in tests/test_sketches_joinsize.py). Reported for the
    events self-join (F2 — the shuffle-blowup number for a skewed key) and
    events x purchases, next to the exact answers.

    Why it matters at 100 TB: the estimate needs ONE pass per side into a
    {CMS_DEPTH}x{CMS_WIDTH} sketch (map-side combined, KB-sized, mergeable
    across partitions/batches) — the join itself would shuffle terabytes to
    discover the same number. The exact sides here exist only because the
    report audits the estimate."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    fa = ev.groupBy(F.col("user_id").alias("term")).agg(F.count("*").alias("c"))
    fb = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("term"))
        .agg(F.count("*").alias("c"))
    )
    # each frequency relation feeds its sketch AND an exact side
    fa = fa.localCheckpoint(eager=False)
    fb = fb.localCheckpoint(eager=False)
    cmsa = build_cms(fa).withColumnRenamed("cellsum", "ca")
    cmsa = cmsa.localCheckpoint(eager=False)  # feeds self + cross products
    cmsb = build_cms(fb).withColumnRenamed("cellsum", "cb")
    est_self = (
        cmsa.groupBy("j")
        .agg(F.sum(F.col("ca") * F.col("ca")).alias("s"))
        .agg(F.min("s").alias("est"))
    )
    est_cross = (
        cmsa.join(cmsb, ["j", "cell"])
        .groupBy("j")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("s"))
        .agg(F.min("s").alias("est"))
    )
    ex_self = fa.agg(F.sum(F.col("c") * F.col("c")).alias("x"))
    fb_r = fb.withColumnRenamed("c", "c_b")
    ex_cross = (
        fa.join(fb_r, "term")
        .agg(F.sum(F.col("c") * F.col("c_b")).alias("x"))
    )

    def report(pair: str, ex: DataFrame, est: DataFrame) -> DataFrame:
        return ex.crossJoin(F.broadcast(est)).select(
            F.lit(pair).alias("pair"),
            F.col("x").cast("bigint").alias("exact_rows"),
            F.col("est").cast("bigint").alias("est_rows"),
            (
                F.round(F.col("est").cast("double") / F.col("x"), 4) + F.lit(0.0)
            ).alias("over_ratio_r"),
        )

    return report("events_selfjoin", ex_self, est_self).unionByName(
        report("events_x_purchases", ex_cross, est_cross)
    )


SETOP_SPLIT = "1998-01-01"  # lineitem ship-date split for the two key sets


@query(
    "hll_set_ops_parts",
    oracle=f"""
    WITH est_a AS ({duckdb_hll_sql(
        f"(SELECT l_partkey FROM lineitem WHERE l_shipdate < TIMESTAMP '{SETOP_SPLIT}') ta",
        "l_partkey").strip()}),
    est_b AS ({duckdb_hll_sql(
        f"(SELECT l_partkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '{SETOP_SPLIT}') tb",
        "l_partkey").strip()}),
    est_u AS ({duckdb_hll_sql("lineitem", "l_partkey").strip()}),
    exact AS (
        SELECT count(DISTINCT CASE WHEN l_shipdate < TIMESTAMP '{SETOP_SPLIT}'
                                   THEN l_partkey END) AS a,
               count(DISTINCT CASE WHEN l_shipdate >= TIMESTAMP '{SETOP_SPLIT}'
                                   THEN l_partkey END) AS b,
               count(DISTINCT l_partkey) AS u
        FROM lineitem
    )
    SELECT CAST(exact.a AS BIGINT) AS a_exact,
           CAST(exact.b AS BIGINT) AS b_exact,
           CAST(exact.u AS BIGINT) AS union_exact,
           CAST(exact.a + exact.b - exact.u AS BIGINT) AS inter_exact,
           round(est_a.est, 4) + 0.0 AS a_est_r,
           round(est_b.est, 4) + 0.0 AS b_est_r,
           round(est_u.est, 4) + 0.0 AS union_est_r,
           round(est_a.est + est_b.est - est_u.est, 4) + 0.0 AS inter_est_r
    FROM exact, est_a, est_b, est_u
    """,
)
def hll_set_ops_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL SET ALGEBRA: distinct parts shipped before/after {SETOP_SPLIT},
    their union (= the MERGED register tables — sketch union is lossless,
    the HLL property an engine exploits to parallelize and incrementalize),
    and the intersection by inclusion-exclusion est_a + est_b - est_union
    (the standard estimator; noisier than the parts, which is why the exact
    columns sit beside it). Every estimate is deterministic register
    arithmetic — hash-exact against DuckDB.

    Plan: ONE scan builds both period sketches (conditional projections),
    each a 256-row relation; union registers come from merging those two —
    no third scan in the Spark plan (the oracle recomputes it from the
    table, which is numerically identical because merge is lossless)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_shipdate")
    before = li.filter(F.col("l_shipdate") < SETOP_SPLIT)
    after = li.filter(F.col("l_shipdate") >= SETOP_SPLIT)
    regs_a = hll_registers(before, "l_partkey").localCheckpoint(eager=False)
    regs_b = hll_registers(after, "l_partkey").localCheckpoint(eager=False)
    regs_u = hll_merge(regs_a, regs_b)
    est_a = hll_estimate(regs_a).select(F.col("est").alias("ea"))
    est_b = hll_estimate(regs_b).select(F.col("est").alias("eb"))
    est_u = hll_estimate(regs_u).select(F.col("est").alias("eu"))
    exact = li.agg(
        F.countDistinct(
            F.when(F.col("l_shipdate") < SETOP_SPLIT, F.col("l_partkey"))
        ).alias("a"),
        F.countDistinct(
            F.when(F.col("l_shipdate") >= SETOP_SPLIT, F.col("l_partkey"))
        ).alias("b"),
        F.countDistinct("l_partkey").alias("u"),
    )
    return (
        exact.crossJoin(F.broadcast(est_a))
        .crossJoin(F.broadcast(est_b))
        .crossJoin(F.broadcast(est_u))
        .select(
            F.col("a").cast("bigint").alias("a_exact"),
            F.col("b").cast("bigint").alias("b_exact"),
            F.col("u").cast("bigint").alias("union_exact"),
            (F.col("a") + F.col("b") - F.col("u")).cast("bigint").alias("inter_exact"),
            (F.round("ea", 4) + F.lit(0.0)).alias("a_est_r"),
            (F.round("eb", 4) + F.lit(0.0)).alias("b_est_r"),
            (F.round("eu", 4) + F.lit(0.0)).alias("union_est_r"),
            (
                F.round(F.col("ea") + F.col("eb") - F.col("eu"), 4) + F.lit(0.0)
            ).alias("inter_est_r"),
        )
    )


@query(
    "hll_distinct_terms_by_source",
    oracle=f"""
    WITH keyed AS (
        SELECT source,
               md5(CAST(unnest(list_filter(string_split_regex(text, '\\s+'),
                                           w -> w <> '')) AS VARCHAR)) AS h
        FROM documents
    ),
    bits AS (
        SELECT source,
               (instr('{HEX}', substr(h, 1, 1)) - 1) * 16
               + instr('{HEX}', substr(h, 2, 1)) - 1 AS bucket,
               regexp_replace(substr(h, 3, 15), '^0+', '') AS t
        FROM keyed
    ),
    regs AS (
        SELECT source, bucket,
               max(CASE WHEN length(t) = 0 THEN 61
                        ELSE (15 - length(t)) * 4 + 4
                             - CAST(floor(log2(instr('{HEX}', substr(t, 1, 1)) - 1))
                                    AS INTEGER)
                   END) AS max_rho
        FROM bits GROUP BY source, bucket
    ),
    agg AS (
        SELECT source, count(*) AS n_registers,
               sum(pow(2.0, -max_rho)) AS s_seen
        FROM regs GROUP BY source
    ),
    est AS (
        SELECT source,
               CASE WHEN {HLL_ALPHA_M2} / (({HLL_M} - n_registers) + s_seen)
                         <= {2.5 * 256} AND {HLL_M} - n_registers > 0
                    THEN {256.0} * ln({256.0} / ({HLL_M} - n_registers))
                    ELSE {HLL_ALPHA_M2} / (({HLL_M} - n_registers) + s_seen)
               END AS e
        FROM agg
    ),
    exact AS (
        SELECT source, count(DISTINCT term) AS x FROM (
            SELECT source,
                   unnest(list_filter(string_split_regex(text, '\\s+'),
                                      w -> w <> '')) AS term
            FROM documents
        ) GROUP BY source
    )
    SELECT est.source AS source,
           round(est.e, 4) + 0.0 AS est_r,
           CAST(exact.x AS BIGINT) AS exact_distinct
    FROM est JOIN exact ON est.source = exact.source
    ORDER BY source
    """,
)
def hll_distinct_terms_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-WISE HyperLogLog — the pattern production counters actually run
    (distinct users per day, distinct tokens per source): ONE pass builds a
    256-register sketch PER GROUP (`groupBy(source, bucket).max(rho)` —
    shuffle payload <= groups x m rows regardless of input size), and each
    group's estimate is deterministic register arithmetic, hash-exact vs
    DuckDB next to the exact count. This is what the register-table design
    buys over the opaque HLL++ buffer: per-group sketches are plain rows
    you can persist, merge across days, and re-aggregate to coarser groups
    (source -> corpus) without rescanning."""
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("term")
    )
    keyed = terms.select("source", F.md5(F.col("term").cast("string")).alias("h"))
    bits = keyed.select(
        "source",
        F.expr(
            f"(instr('{HEX}', substring(h, 1, 1)) - 1) * 16"
            f" + instr('{HEX}', substring(h, 2, 1)) - 1"
        ).cast("int").alias("bucket"),
        F.expr("regexp_replace(substring(h, 3, 15), '^0+', '')").alias("t"),
    )
    rhos = bits.select(
        "source",
        "bucket",
        F.expr(
            "CASE WHEN length(t) = 0 THEN 61"
            " ELSE (15 - length(t)) * 4 + 4"
            f" - CAST(floor(log2(instr('{HEX}', substring(t, 1, 1)) - 1)) AS INT)"
            " END"
        ).cast("int").alias("rho"),
    )
    regs = rhos.groupBy("source", "bucket").agg(F.max("rho").alias("max_rho"))
    agg = regs.groupBy("source").agg(
        F.count("*").alias("n_registers"),
        F.coalesce(
            F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))), F.lit(0.0)
        ).alias("s_seen"),
    )
    m = 256
    alpha_m2 = HLL_ALPHA_M2
    s = (F.lit(m) - F.col("n_registers")).cast("double") + F.col("s_seen")
    e_raw = F.lit(alpha_m2) / s
    v_zero = F.lit(m) - F.col("n_registers")
    est = F.when(
        (e_raw <= 2.5 * m) & (v_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero.cast("double")),
    ).otherwise(e_raw)
    exact = terms.groupBy("source").agg(
        F.countDistinct("term").alias("exact_distinct")
    )
    return (
        agg.select("source", (F.round(est, 4) + F.lit(0.0)).alias("est_r"))
        .join(exact, "source")
        .select(
            "source",
            "est_r",
            F.col("exact_distinct").cast("bigint").alias("exact_distinct"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# HDR-style log-linear quantile sketch (operators/hdr.py): the mergeable,
# fixed-size quantile state — the third quantile path next to exact
# distributed ranks and the GK approx twins. Pure integer bucketing makes
# registers AND extracted quantiles hash-exact across engines.
# ---------------------------------------------------------------------------

from streamds_spark.operators.hdr import (  # noqa: E402
    bucket_expr_duckdb,
    duckdb_hdr_quantiles_by_sql,
    duckdb_hdr_quantiles_sql,
    hdr_merge,
    hdr_quantiles,
    hdr_quantiles_by,
    hdr_registers,
)

_HDR_BUCKET_V = bucket_expr_duckdb("v")

HDR_QS = {"p50": 0.5, "p90": 0.9, "p99": 0.99}


@query(
    "hdr_doclen_quantiles",
    oracle=duckdb_hdr_quantiles_sql("documents", "n_chars", HDR_QS)
    + " ORDER BY tag",
)
def hdr_doclen_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length p50/p90/p99 from the log-linear register sketch
    (operators/hdr.py; HdrHistogram/DDSketch family, integer bucketing) —
    every output column is BIGINT, so bucket choice, value bounds, and the
    midpoint estimate are all hash-checked against the DuckDB twin.

    Plan: one map-only bucket pass + a <=1888-key aggregate (map-side
    combined: the shuffle is kilobytes at any corpus size), then the
    cumulative window over the REGISTER TABLE — bounded by construction,
    never the data (allowlisted in tests/test_plans.py). At 100 TB this is
    the latency-dashboard shape: per-shard sketches merge by summing
    counts; only the fixed-size state crosses the wire."""
    docs = load_table(spark, sf_dir, "documents")
    regs = hdr_registers(docs, "n_chars")
    return hdr_quantiles(regs, HDR_QS).orderBy("tag")


@query(
    "hdr_value_quantiles_by_type",
    oracle=duckdb_hdr_quantiles_by_sql(
        "events", "floor(value * 100)", ["event_type"], HDR_QS
    )
    + " ORDER BY event_type, tag",
)
def hdr_value_quantiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value quantiles (centi-units: floor(value*100) — an
    exact IEEE double product both engines share, then integer bucketing).
    The grouped variant of hdr_doclen_quantiles: registers carry the group
    key, and the cumulative window is PARTITIONED by event_type, so
    extraction distributes across groups with no global window at all.

    The 100 TB read: this is per-endpoint latency percentiles — grouped
    register tables are (group × <=1888) rows regardless of event volume,
    and the per-group window input stays sketch-sized forever."""
    ev = load_table(spark, sf_dir, "events")
    regs = hdr_registers(ev, "floor(value * 100)", by=["event_type"])
    return hdr_quantiles_by(regs, ["event_type"], HDR_QS).orderBy(
        "event_type", "tag"
    )


@query(
    "hdr_merge_audit_sources",
    oracle=f"""
    WITH raw AS (
        SELECT source, CAST(n_chars AS BIGINT) AS v FROM documents
    ),
    vals AS (SELECT * FROM raw WHERE v IS NOT NULL AND v >= 0),
    persrc AS (
        SELECT source, {{bucket}} AS bucket, count(*) AS cnt
        FROM vals GROUP BY ALL
    ),
    merged AS (SELECT bucket, SUM(cnt) AS cnt FROM persrc GROUP BY bucket),
    direct AS (
        SELECT {{bucket}} AS bucket, count(*) AS cnt FROM vals GROUP BY 1
    ),
    joined AS (
        SELECT coalesce(m.bucket, d.bucket) AS bucket,
               coalesce(m.cnt, -1) AS mc, coalesce(d.cnt, -1) AS dc
        FROM merged m FULL OUTER JOIN direct d ON m.bucket = d.bucket
    )
    SELECT CAST((SELECT count(DISTINCT source) FROM vals) AS BIGINT)
               AS n_sources,
           CAST((SELECT count(*) FROM merged) AS BIGINT) AS merged_buckets,
           CAST((SELECT count(*) FROM direct) AS BIGINT) AS direct_buckets,
           CAST((SELECT count(*) FROM joined WHERE mc <> dc) AS BIGINT)
               AS mismatched_buckets,
           CAST((SELECT SUM(cnt) FROM merged) AS BIGINT) AS merged_total,
           CAST((SELECT SUM(cnt) FROM direct) AS BIGINT) AS direct_total
    """.replace("{bucket}", _HDR_BUCKET_V),
)
def hdr_merge_audit_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability proof as a query: per-source sketches combined with
    hdr_merge (union + sum per bucket) must equal the sketch built over the
    whole corpus in one pass — bucket-for-bucket, count-for-count
    (mismatched_buckets = 0). This is the invariant that lets a streaming
    ingest keep per-batch register tables and fold them at read time, and
    the oracle replays BOTH paths in DuckDB, so the equality itself is
    hash-checked.

    Plan: two bounded aggregates over one scan each plus a full outer join
    of two <=1888-row relations — report-shaped end to end."""
    docs = load_table(spark, sf_dir, "documents")
    per_src = hdr_registers(docs, "n_chars", by=["source"])
    merged = hdr_merge(per_src.select("bucket", "cnt"))
    direct = hdr_registers(docs, "n_chars")
    joined = merged.alias("m").join(
        direct.alias("d"), F.col("m.bucket") == F.col("d.bucket"), "full_outer"
    ).select(
        F.coalesce(F.col("m.cnt"), F.lit(-1)).alias("mc"),
        F.coalesce(F.col("d.cnt"), F.lit(-1)).alias("dc"),
    )
    n_sources = docs.where("n_chars IS NOT NULL AND n_chars >= 0").agg(
        F.countDistinct("source").alias("n_sources")
    )
    stats = joined.agg(
        F.sum(F.when(F.col("mc") != F.col("dc"), 1).otherwise(0)).alias(
            "mismatched_buckets"
        )
    )
    counts = (
        merged.agg(
            F.count("*").alias("merged_buckets"),
            F.sum("cnt").alias("merged_total"),
        )
        .crossJoin(
            F.broadcast(
                direct.agg(
                    F.count("*").alias("direct_buckets"),
                    F.sum("cnt").alias("direct_total"),
                )
            )
        )
    )
    return (
        F.broadcast(n_sources)
        .crossJoin(F.broadcast(counts))
        .crossJoin(F.broadcast(stats))
        .select(
            F.col("n_sources").cast("bigint").alias("n_sources"),
            F.col("merged_buckets").cast("bigint").alias("merged_buckets"),
            F.col("direct_buckets").cast("bigint").alias("direct_buckets"),
            F.col("mismatched_buckets").cast("bigint").alias("mismatched_buckets"),
            F.col("merged_total").cast("bigint").alias("merged_total"),
            F.col("direct_total").cast("bigint").alias("direct_total"),
        )
    )


@query(
    "doclen_percentile_feature",
    oracle=f"""
    WITH raw AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS v FROM documents),
    vals AS (SELECT * FROM raw WHERE v IS NOT NULL AND v >= 0),
    regs AS (
        SELECT {{bucket}} AS bucket, count(*) AS cnt FROM vals GROUP BY 1
    ),
    cum AS (
        SELECT bucket,
               SUM(cnt) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum,
               (SELECT SUM(cnt) FROM regs) AS n
        FROM regs
    )
    SELECT d.doc_id, d.v AS n_chars,
           CAST(c.bucket AS BIGINT) AS bucket,
           CAST((1000 * c.cum) // c.n AS BIGINT) AS pct_permille
    FROM (SELECT doc_id, v, {{bucket}} AS bucket FROM vals) d
    JOIN cum c ON c.bucket = d.bucket
    ORDER BY d.doc_id
    """.replace("{bucket}", _HDR_BUCKET_V),
)
def doclen_percentile_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-rank feature normalization WITHOUT a global rank: each
    document's length maps to its approximate percentile (integer per-mille,
    (1000*cum) div n — exact integer arithmetic, granularity bounded by the
    sketch's <1/32 relative error) via the HDR register table used as a
    broadcast lookup. The exact alternative is a corpus-wide rank — a global
    sort/window over every row; here the corpus-sized work is one map-only
    bucket pass plus a broadcast join against the <=1888-row cumulative
    table, the standard quantile-transform shape for trillion-row feature
    pipelines. Cumsum runs over the REGISTER table only (allowlisted)."""
    from streamds_spark.operators.hdr import bucket_expr_spark

    docs = load_table(spark, sf_dir, "documents")
    vals = docs.selectExpr("doc_id", "CAST(n_chars AS BIGINT) AS v").where(
        "v IS NOT NULL AND v >= 0"
    )
    regs = hdr_registers(docs, "n_chars")
    w_cum = (
        "SUM(cnt) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING"
        " AND CURRENT ROW)"
    )
    cum = regs.selectExpr("bucket", f"{w_cum} AS cum").crossJoin(
        F.broadcast(regs.agg(F.sum("cnt").alias("n")))
    )
    d = vals.selectExpr("doc_id", "v", f"{bucket_expr_spark('v')} AS bucket")
    return (
        d.join(F.broadcast(cum), "bucket")
        .selectExpr(
            "doc_id",
            "v AS n_chars",
            "CAST(bucket AS BIGINT) AS bucket",
            "CAST((1000 * cum) div n AS BIGINT) AS pct_permille",
        )
        .orderBy("doc_id")
    )


@query(
    "time_to_convert_quantiles",
    oracle=duckdb_hdr_quantiles_sql(
        """(
        WITH v AS (
            SELECT user_id, min(ts) AS t_view FROM events
            WHERE event_type = 'view' GROUP BY 1
        ),
        p AS (
            SELECT e.user_id, min(e.ts) AS t_purchase
            FROM events e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'purchase' AND e.ts > v.t_view GROUP BY 1
        )
        SELECT (epoch_us(p.t_purchase) - epoch_us(v.t_view)) // 1000000 AS delta_s
        FROM p JOIN v ON p.user_id = v.user_id
    ) t""",
        "delta_s",
        HDR_QS,
    )
    + " ORDER BY tag",
)
def time_to_convert_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution: seconds from a user's first view to
    their first subsequent purchase, summarized as p50/p90/p99 through the
    HDR register sketch (integer seconds -> integer buckets -> BIGINT
    quantile rows, hash-exact end to end). The funnel tells you WHO
    converts; this tells you HOW LONG conversion takes — the companion
    latency dial, and at 100 TB the same mergeable-sketch posture: the
    per-user delta relation is user-bounded, the sketch state is <=1888
    rows regardless, and per-shard sketches union+sum."""
    events = load_table(spark, sf_dir, "events")
    v = (
        events.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    p = (
        events.where(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    deltas = p.join(v, "user_id").selectExpr(
        "(unix_micros(t_purchase) - unix_micros(t_view)) div 1000000 AS delta_s"
    )
    from streamds_spark.operators.hdr import hdr_quantiles as _hq
    from streamds_spark.operators.hdr import hdr_registers as _hr

    return _hq(_hr(deltas, "delta_s"), HDR_QS).orderBy("tag")


@query(
    "rolling_mau_hll",
    oracle=f"""
    WITH dsu AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM dsu),
    keyed AS (SELECT day, md5(CAST(user_id AS VARCHAR)) AS h FROM dsu),
    bits AS (
        SELECT day,
               (instr('{HEX}', substr(h, 1, 1)) - 1) * 16
               + instr('{HEX}', substr(h, 2, 1)) - 1 AS bucket,
               regexp_replace(substr(h, 3, 15), '^0+', '') AS t
        FROM keyed
    ),
    dregs AS (
        SELECT day, bucket,
               max(CASE WHEN length(t) = 0 THEN 61
                        ELSE (15 - length(t)) * 4 + 4
                             - CAST(floor(log2(instr('{HEX}', substr(t, 1, 1)) - 1))
                                    AS INTEGER)
                   END) AS max_rho
        FROM bits GROUP BY day, bucket
    ),
    wregs AS (
        SELECT d.day, r.bucket, max(r.max_rho) AS max_rho
        FROM days d JOIN dregs r
          ON r.day BETWEEN d.day - 29 AND d.day
        GROUP BY d.day, r.bucket
    ),
    agg AS (
        SELECT day, count(*) AS n_registers,
               sum(pow(2.0, -max_rho)) AS s_seen
        FROM wregs GROUP BY day
    ),
    est AS (
        SELECT day,
               CASE WHEN {HLL_ALPHA_M2} / (({HLL_M} - n_registers) + s_seen)
                         <= {2.5 * 256} AND {HLL_M} - n_registers > 0
                    THEN {256.0} * ln({256.0} / ({HLL_M} - n_registers))
                    ELSE {HLL_ALPHA_M2} / (({HLL_M} - n_registers) + s_seen)
               END AS e,
               n_registers
        FROM agg
    ),
    exact AS (
        SELECT d.day, count(DISTINCT s.user_id) AS x
        FROM days d JOIN dsu s ON s.day BETWEEN d.day - 29 AND d.day
        GROUP BY d.day
    )
    SELECT strftime(est.day, '%Y-%m-%d') AS day_s,
           CAST(est.n_registers AS BIGINT) AS n_registers,
           round(est.e, 4) + 0.0 AS est_r,
           CAST(exact.x AS BIGINT) AS exact_mau,
           round(abs(est.e - exact.x) / exact.x, 4) + 0.0 AS rel_err_r
    FROM est JOIN exact ON est.day = exact.day
    ORDER BY day_s
    """,
)
def rolling_mau_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 30-day active users (MAU) per day from DAILY HLL register
    tables — the canonical production use of a mergeable sketch: keep one
    256-row register relation per day, and any window's distinct count is a
    union+max over the window's days, never a re-scan of raw events. The
    register bit arithmetic is the md5 construction of operators/hll.py, so
    the per-day windowed ESTIMATES are hash-checked against DuckDB next to
    the exact windowed MAU and the realized relative error.

    Plan: one (day, user) distinct (the only corpus-sized shuffle), a
    (day x 256)-bounded register aggregate, then a day-range join over the
    DATE DOMAIN (~90 x 30 x 256 rows here; always day-domain bounded — at
    100 TB this report never touches events again). The exact side exists
    only for the audit; production keeps the sketch path alone, and
    yesterday's registers never recompute."""
    ev = load_table(spark, sf_dir, "events")
    dsu = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    days = dsu.select("day").distinct()
    keyed = dsu.select("day", F.md5(F.col("user_id").cast("string")).alias("h"))
    bits = keyed.select(
        "day",
        F.expr(
            f"(instr('{HEX}', substring(h, 1, 1)) - 1) * 16"
            f" + instr('{HEX}', substring(h, 2, 1)) - 1"
        ).cast("int").alias("bucket"),
        F.expr("regexp_replace(substring(h, 3, 15), '^0+', '')").alias("t"),
    )
    dregs = bits.select(
        "day",
        "bucket",
        F.expr(
            "CASE WHEN length(t) = 0 THEN 61"
            " ELSE (15 - length(t)) * 4 + 4"
            f" - CAST(floor(log2(instr('{HEX}', substring(t, 1, 1)) - 1)) AS INT)"
            " END"
        ).cast("int").alias("rho"),
    ).groupBy("day", "bucket").agg(F.max("rho").alias("max_rho"))
    wregs = (
        days.alias("d")
        .join(
            dregs.alias("r"),
            F.col("r.day").between(F.date_sub(F.col("d.day"), 29), F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"), F.col("r.bucket").alias("bucket"))
        .agg(F.max("r.max_rho").alias("max_rho"))
    )
    agg = wregs.groupBy("day").agg(
        F.count("*").alias("n_registers"),
        F.coalesce(
            F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))), F.lit(0.0)
        ).alias("s_seen"),
    )
    m = HLL_M
    s = (F.lit(m) - F.col("n_registers")).cast("double") + F.col("s_seen")
    e_raw = F.lit(HLL_ALPHA_M2) / s
    v_zero = F.lit(m) - F.col("n_registers")
    est = F.when(
        (e_raw <= 2.5 * m) & (v_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero.cast("double")),
    ).otherwise(e_raw)
    est_df = agg.select("day", "n_registers", est.alias("e"))
    exact = (
        days.alias("d")
        .join(
            dsu.alias("s"),
            F.col("s.day").between(F.date_sub(F.col("d.day"), 29), F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("s.user_id").alias("x"))
    )
    return (
        est_df.join(exact, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day_s"),
            F.col("n_registers").cast("bigint").alias("n_registers"),
            (F.round("e", 4) + F.lit(0.0)).alias("est_r"),
            F.col("x").cast("bigint").alias("exact_mau"),
            (F.round(F.abs(F.col("e") - F.col("x")) / F.col("x"), 4) + F.lit(0.0)).alias(
                "rel_err_r"
            ),
        )
        .orderBy("day_s")
    )


# ---------------------------------------------------------------------------
# Signed-value HDR sketch (round 8): general metric columns — deltas, P&L,
# z-scored values — mirror negatives into negative bucket ids (monotone,
# pure-integer, register bound 2 x 1888). Same mergeable state, same
# hash-exact discipline.
# ---------------------------------------------------------------------------

from streamds_spark.operators.hdr import (  # noqa: E402
    duckdb_hdr_quantiles_signed_sql,
    hdr_registers_signed,
    signed_bucket_expr,
)

# centi-unit deviation from a 100.00 reference price: roughly half the events
# land negative, so both bucket mirrors carry real mass
_SIGNED_EXPR = "CAST(floor(value * 100) AS BIGINT) - 10000"
_SIGNED_QS = {"p01": 0.01, "p25": 0.25, "p50": 0.5, "p75": 0.75, "p99": 0.99}


@query(
    "hdr_signed_delta_quantiles",
    oracle=duckdb_hdr_quantiles_signed_sql("events", _SIGNED_EXPR, _SIGNED_QS)
    + " ORDER BY tag",
)
def hdr_signed_delta_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles of a SIGNED metric (centi-unit price deviation from 100.00)
    through the signed HDR sketch: negatives mirror into negative bucket ids
    via -1 - bucket(-(v + 1)) — monotone over the whole BIGINT range, so the
    cumulative-rank extraction runs unchanged on bucket order, and every
    output stays a BIGINT the DuckDB twin reproduces bit-for-bit.

    Plan shape is identical to the non-negative sketch: one map-only bucket
    pass + a <= 2x1888-key aggregate + the register-table cumsum — nothing
    corpus-sized ever shuffles, which is what a 100 TB P&L/latency-delta
    dashboard keeps per shard."""
    ev = load_table(spark, sf_dir, "events")
    regs = hdr_registers_signed(ev, _SIGNED_EXPR)
    return hdr_quantiles(regs, _SIGNED_QS, signed=True).orderBy("tag")


@query(
    "hdr_signed_merge_audit_types",
    oracle=f"""
    WITH raw AS (
        SELECT event_type, CAST({_SIGNED_EXPR} AS BIGINT) AS v FROM events
    ),
    vals AS (SELECT * FROM raw WHERE v IS NOT NULL),
    pertype AS (
        SELECT event_type, {signed_bucket_expr('v', 'duckdb')} AS bucket,
               count(*) AS cnt
        FROM vals GROUP BY ALL
    ),
    merged AS (SELECT bucket, SUM(cnt) AS cnt FROM pertype GROUP BY bucket),
    direct AS (
        SELECT {signed_bucket_expr('v', 'duckdb')} AS bucket, count(*) AS cnt
        FROM vals GROUP BY 1
    ),
    joined AS (
        SELECT coalesce(m.bucket, d.bucket) AS bucket,
               coalesce(m.cnt, -1) AS mc, coalesce(d.cnt, -1) AS dc
        FROM merged m FULL OUTER JOIN direct d ON m.bucket = d.bucket
    )
    SELECT CAST((SELECT count(DISTINCT event_type) FROM vals) AS BIGINT)
               AS n_types,
           CAST((SELECT count(*) FROM merged) AS BIGINT) AS merged_buckets,
           CAST((SELECT count(*) FROM merged WHERE bucket < 0) AS BIGINT)
               AS negative_buckets,
           CAST((SELECT count(*) FROM direct) AS BIGINT) AS direct_buckets,
           CAST((SELECT count(*) FROM joined WHERE mc <> dc) AS BIGINT)
               AS mismatched_buckets,
           CAST((SELECT SUM(cnt) FROM merged) AS BIGINT) AS merged_total,
           CAST((SELECT SUM(cnt) FROM direct) AS BIGINT) AS direct_total
    """,
)
def hdr_signed_merge_audit_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability proof for the SIGNED sketch: per-event-type signed
    register tables combined with hdr_merge (union + sum per bucket) must
    equal the whole-table one-pass sketch bucket-for-bucket
    (mismatched_buckets = 0), and negative_buckets > 0 proves the mirror
    side actually carries mass in this data. Oracle replays both paths, so
    the equality itself is hash-checked. Plan: two bounded aggregates +
    a full outer join of two sketch-sized relations."""
    ev = load_table(spark, sf_dir, "events")
    per_type = hdr_registers_signed(ev, _SIGNED_EXPR, by=["event_type"])
    merged = hdr_merge(per_type.select("bucket", "cnt"))
    direct = hdr_registers_signed(ev, _SIGNED_EXPR)
    joined = merged.alias("m").join(
        direct.alias("d"), F.col("m.bucket") == F.col("d.bucket"), "full_outer"
    ).select(
        F.coalesce(F.col("m.bucket"), F.col("d.bucket")).alias("bucket"),
        F.coalesce(F.col("m.cnt"), F.lit(-1)).alias("mc"),
        F.coalesce(F.col("d.cnt"), F.lit(-1)).alias("dc"),
    )
    n_types = ev.selectExpr(f"CAST({_SIGNED_EXPR} AS BIGINT) AS v", "event_type").where(
        "v IS NOT NULL"
    ).agg(F.countDistinct("event_type").cast("bigint").alias("n_types"))
    return (
        n_types.crossJoin(
            merged.agg(
                F.count("*").cast("bigint").alias("merged_buckets"),
                F.sum((F.col("bucket") < 0).cast("bigint")).alias(
                    "negative_buckets"
                ),
                F.sum("cnt").cast("bigint").alias("merged_total"),
            )
        )
        .crossJoin(
            direct.agg(
                F.count("*").cast("bigint").alias("direct_buckets"),
                F.sum("cnt").cast("bigint").alias("direct_total"),
            )
        )
        .crossJoin(
            joined.agg(
                F.sum((F.col("mc") != F.col("dc")).cast("bigint")).alias(
                    "mismatched_buckets"
                )
            )
        )
        .selectExpr(
            "n_types",
            "merged_buckets",
            "negative_buckets",
            "direct_buckets",
            "mismatched_buckets",
            "merged_total",
            "direct_total",
        )
    )


KMV_K = 256  # k-minimum-values per source; pairs fold 2k rows each


@query(
    "kmv_vocab_jaccard_audit",
    oracle=rf"""
    WITH tok AS (
        SELECT DISTINCT source,
               unnest(list_filter(string_split_regex(text, '\s+'), w -> w <> '')) AS term
        FROM documents
    ),
    hashed AS (
        SELECT source, term,
               ('0x' || substr(md5(term), 1, 15))::BIGINT AS h
        FROM tok
    ),
    sk AS (
        SELECT source, h FROM (
            SELECT source, h,
                   row_number() OVER (PARTITION BY source ORDER BY h) AS rn
            FROM hashed
        ) WHERE rn <= {KMV_K}
    ),
    srcs AS (SELECT DISTINCT source FROM tok),
    pairs AS (
        SELECT a.source AS ga, b.source AS gb
        FROM srcs a JOIN srcs b ON a.source < b.source
    ),
    member AS (
        SELECT ga, gb, h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
            SELECT p.ga, p.gb, s.h, 1 AS in_a, 0 AS in_b
            FROM sk s JOIN pairs p ON s.source = p.ga
            UNION ALL
            SELECT p.ga, p.gb, s.h, 0, 1
            FROM sk s JOIN pairs p ON s.source = p.gb
        ) GROUP BY ga, gb, h
    ),
    union_k AS (
        SELECT ga, gb, in_a, in_b FROM (
            SELECT ga, gb, in_a, in_b,
                   row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rn
            FROM member
        ) WHERE rn <= {KMV_K}
    ),
    est AS (
        SELECT ga, gb,
               CAST(count(*) AS BIGINT) AS k_union,
               CAST(sum(in_a * in_b) AS BIGINT) AS kmv_matches,
               round(CAST(sum(in_a * in_b) AS DOUBLE) / count(*), 4) AS jaccard_est
        FROM union_k GROUP BY ga, gb
    ),
    vsize AS (SELECT source, count(*) AS vocab FROM tok GROUP BY source),
    inter AS (
        SELECT a.source AS ga, b.source AS gb, count(*) AS n_shared
        FROM tok a JOIN tok b USING (term)
        WHERE a.source < b.source
        GROUP BY 1, 2
    )
    SELECT e.ga AS source_a, e.gb AS source_b,
           e.k_union, e.kmv_matches, e.jaccard_est,
           CAST(i.n_shared AS BIGINT) AS n_inter_exact,
           CAST(va.vocab + vb.vocab - i.n_shared AS BIGINT) AS n_union_exact,
           round(CAST(i.n_shared AS DOUBLE)
                 / (va.vocab + vb.vocab - i.n_shared), 4) AS jaccard_exact
    FROM est e
    JOIN inter i ON i.ga = e.ga AND i.gb = e.gb
    JOIN vsize va ON va.source = e.ga
    JOIN vsize vb ON vb.source = e.gb
    """,
)
def kmv_vocab_jaccard_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-vocabulary overlap estimated from KMV sketches
    (operators/kmv.py — k smallest md5 hashes of the distinct terms per
    source, the INTERSECTABLE distinct-count sketch HLL cannot be), audited
    in the same row against the exact intersection/union/Jaccard from the
    full vocabulary (the source_vocab_overlap machinery). The minwise
    estimate |L ∩ both| / |L| over the union's bottom k is deterministic —
    md5-derived order, integer counts, one IEEE division — so ALL columns,
    estimate included, are hash-exact cross-engine at every SF.

    Scale: the exact twin rescans the vocabulary per question; the sketch
    answers every pairwise overlap from k·sources rows of state. 190 pairs
    here; at 100 TB the corpus scan happens once and the pair sweep costs
    pairs × 2k rows, independent of corpus size."""
    from streamds_spark.operators.kmv import kmv_pair_jaccard, kmv_sketch

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("term")
    ).distinct()
    sk = kmv_sketch(tok, "source", "term", KMV_K, pre_distinct=True)
    srcs = tok.select("source").distinct()
    pairs = (
        srcs.toDF("group_a")
        .join(srcs.toDF("group_b"), F.col("group_a") < F.col("group_b"))
    )
    est = kmv_pair_jaccard(sk, pairs, KMV_K)
    vsize = tok.groupBy("source").agg(F.count("*").alias("vocab"))
    a, b = tok.alias("a"), tok.alias("b")
    inter = (
        a.join(b, "term")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("group_a"), F.col("b.source").alias("group_b")
        )
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        est.join(inter, ["group_a", "group_b"])
        .join(vsize.toDF("group_a", "va"), "group_a")
        .join(vsize.toDF("group_b", "vb"), "group_b")
        .select(
            F.col("group_a").alias("source_a"),
            F.col("group_b").alias("source_b"),
            "k_union",
            "kmv_matches",
            "jaccard_est",
            F.col("n_shared").cast("bigint").alias("n_inter_exact"),
            (F.col("va") + F.col("vb") - F.col("n_shared"))
            .cast("bigint")
            .alias("n_union_exact"),
            F.round(
                F.col("n_shared")
                / (F.col("va") + F.col("vb") - F.col("n_shared")).cast("double"),
                4,
            ).alias("jaccard_exact"),
        )
    )


def _ams_oracle_users(k: int) -> str:
    """Replay the AMS counters, estimator, and per-type fold in DuckDB."""
    from streamds_spark.operators.ams import duckdb_ams_counter_sql

    val = "CAST(user_id AS VARCHAR)"
    whole = ",\n               ".join(
        f"{duckdb_ams_counter_sql(val, j)} AS c{j}" for j in range(k)
    )
    fold = ",\n               ".join(f"CAST(sum(c{j}) AS BIGINT) AS c{j}" for j in range(k))
    sq = " + ".join(f"c{j} * c{j}" for j in range(k))
    eq = " AND ".join(f"w.c{j} = f.c{j}" for j in range(k))
    return f"""
    WITH whole AS (
        SELECT {whole}
        FROM events WHERE user_id IS NOT NULL
    ),
    pertype AS (
        SELECT event_type, {whole}
        FROM events WHERE user_id IS NOT NULL GROUP BY event_type
    ),
    fold AS (
        SELECT {fold} FROM pertype
    ),
    exact AS (
        SELECT CAST(sum(f * f) AS BIGINT) AS f2_exact
        FROM (SELECT count(*) AS f FROM events
              WHERE user_id IS NOT NULL GROUP BY user_id)
    )
    SELECT CAST({k} AS BIGINT) AS n_counters,
           CAST({sq} AS BIGINT) AS sum_c_sq,
           (SELECT f2_exact FROM exact) AS f2_exact,
           round(CAST({sq} AS DOUBLE) / CAST({k} AS DOUBLE), 4) + 0.0
               AS f2_estimate,
           (SELECT {eq} FROM whole w, fold f) AS merged_equals_whole
    FROM whole
    """


@query("ams_f2_users_audit", oracle=_ams_oracle_users(32))
def ams_f2_users_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS tug-of-war F2 sketch audit on events.user_id — the SELF-JOIN
    SIZE estimate (sum of per-user frequency squared): 32 integer counters
    computed in ONE scan with no frequency table (the sign sum telescopes
    the frequencies), the mean-of-squares estimate beside the exact F2,
    and the mergeability proof: per-event_type shard counters folded by
    addition equal the whole-input counters EXACTLY (linear state).
    Counters sign off md5 bits, so every column up to the one IEEE
    division is engine-identical — hash-exact, not approximately close.
    At 100 TB: per-shard state is 32 BIGINTs forever; the join-size
    answer costs k integers per shard instead of the exact groupBy's
    key-space shuffle. operators/ams.py."""
    from streamds_spark.operators.ams import (
        ams_counters,
        ams_f2_estimate,
        ams_merge,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    whole = ams_counters(ev, "user_id", k=32).localCheckpoint(eager=False)
    est = ams_f2_estimate(whole)
    fold = ams_merge(ams_counters(ev, "user_id", k=32, group_cols=("event_type",)))
    eq = (
        fold.join(whole.withColumnRenamed("c", "cw"), "j")
        .agg(
            F.expr(
                "min(CASE WHEN c = cw THEN 1 ELSE 0 END) = 1"
            ).alias("merged_equals_whole")
        )
    )
    exact = (
        ev.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count("*").alias("f"))
        .agg(F.sum(F.col("f") * F.col("f")).cast("bigint").alias("f2_exact"))
    )
    return (
        est.crossJoin(exact)
        .crossJoin(eq)
        .select("n_counters", "sum_c_sq", "f2_exact", "f2_estimate", "merged_equals_whole")
    )


@query(
    "view_approx_distinct_audit_sources",
    oracle="""
    WITH hashed AS (
        SELECT DISTINCT source, doc_id % 3 AS b,
               ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
        FROM documents
    ),
    -- per-trigger KMV partials (the viewstore's stored array, exploded):
    -- k smallest hashes of the batch's distinct values per key
    bsk AS (
        SELECT source, b, h FROM (
            SELECT source, b, h,
                   row_number() OVER (PARTITION BY source, b ORDER BY h) AS rn
            FROM hashed
        ) WHERE rn <= 256
    ),
    -- read-time fold: bottom-k of the per-trigger bottom-ks...
    fold AS (
        SELECT source, h FROM (
            SELECT source, h,
                   row_number() OVER (PARTITION BY source ORDER BY h) AS rn
            FROM (SELECT DISTINCT source, h FROM bsk)
        ) WHERE rn <= 256
    ),
    -- ...which must equal the whole-data sketch (kmv_merge's theorem)
    whole AS (
        SELECT source, h FROM (
            SELECT source, h,
                   row_number() OVER (PARTITION BY source ORDER BY h) AS rn
            FROM (SELECT DISTINCT source, h FROM hashed)
        ) WHERE rn <= 256
    ),
    fstat AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_kmv,
               CAST(max(h) AS BIGINT) AS max_hash,
               list_sort(list(h)) AS arr
        FROM fold GROUP BY source
    ),
    wstat AS (SELECT source, list_sort(list(h)) AS arr FROM whole GROUP BY source),
    exact AS (
        SELECT source, CAST(count(DISTINCT text) AS BIGINT) AS n_exact
        FROM documents GROUP BY source
    )
    SELECT f.source, f.n_kmv, f.max_hash,
           CAST(CASE WHEN f.arr = w.arr THEN 1 ELSE 0 END AS BIGINT)
               AS fold_equals_whole,
           e.n_exact,
           CASE WHEN f.n_kmv < 256 THEN CAST(f.n_kmv AS DOUBLE)
                ELSE 255.0 * 1152921504606846976.0 / CAST(f.max_hash AS DOUBLE)
           END AS dv_est
    FROM fstat f
    JOIN wstat w USING (source)
    JOIN exact e USING (source)
    ORDER BY source
    """,
)
def view_approx_distinct_audit_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability audit for the viewstore's opt-in approx_distinct
    aggregate (streaming/viewstore.py, round 10): per source, three
    simulated triggers (doc_id % 3) each store a KMV partial of the batch's
    distinct texts; the read-time fold (bottom-k of the per-trigger
    bottom-ks) must equal the whole-data sketch ARRAY-EXACTLY
    (fold_equals_whole = 1 — kmv_merge's theorem carried into the view
    partials), served beside the exact distinct count.

    Every column is exact integer state except dv_est, which is the Beyer
    et al. DV estimator as ONE raw IEEE expression (255.0 * 2^60 /
    max_hash) — deliberately UNROUNDED: 255.0 * 2^60 is exactly
    representable (8-bit mantissa), the BIGINT->DOUBLE cast rounds
    to-nearest identically in both engines, and one division is bit-exact,
    so the row set is hash-exact at every SF without the round()
    shortest-decimal-string hazard. The view surface's rounded estimate is
    covered by the stream==batch pytest. Scale: the fold reads k rows per
    (key, trigger dir), never the corpus."""
    from streamds_spark.streaming.viewstore import (
        ViewSpec,
        view_batch_state,
    )

    docs = load_table(spark, sf_dir, "documents")
    spec = ViewSpec(keys=("source",), aggs={"dv": ("approx_distinct", "text")})
    k = spec.kmv_k
    parts = [
        view_batch_state(docs.filter(F.col("doc_id") % 3 == b), spec)
        for b in range(3)
    ]
    store = parts[0]
    for p in parts[1:]:
        store = store.unionByName(p)
    fold = store.groupBy("source").agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("dv__kmv")))),
            1,
            k,
        ).alias("fold_arr")
    )
    whole = view_batch_state(docs, spec).select(
        "source", F.col("dv__kmv").alias("whole_arr")
    )
    exact = (
        docs.select("source", "text")
        .distinct()
        .groupBy("source")
        .agg(F.count("*").cast("bigint").alias("n_exact"))
    )
    n = F.size("fold_arr")
    mx = F.element_at(F.col("fold_arr"), n).cast("bigint")
    return (
        fold.join(whole, "source")
        .join(exact, "source")
        .select(
            "source",
            n.cast("bigint").alias("n_kmv"),
            mx.alias("max_hash"),
            (F.col("fold_arr") == F.col("whole_arr"))
            .cast("int")
            .cast("bigint")
            .alias("fold_equals_whole"),
            "n_exact",
            F.when(n < k, n.cast("double"))
            .otherwise(
                F.lit(255.0) * F.lit(1152921504606846976.0) / mx.cast("double")
            )
            .alias("dv_est"),
        )
        .orderBy("source")
    )


def _pq_oracle() -> str:
    from streamds_spark.operators.hdr import bounds_exprs, bucket_expr_duckdb

    lo, hi, mid = bounds_exprs("b")
    return f"""
    WITH vals AS (
        SELECT source, doc_id % 3 AS bt, CAST(n_chars AS BIGINT) AS v
        FROM documents WHERE n_chars IS NOT NULL AND n_chars >= 0
    ),
    -- per-trigger HDR histogram partials (the viewstore's stored arrays,
    -- exploded): per-bucket counts of the batch's values
    bh AS (
        SELECT source, bt, {bucket_expr_duckdb('v')} AS b,
               CAST(count(*) AS BIGINT) AS c
        FROM vals GROUP BY 1, 2, 3
    ),
    -- read-time fold: per-bucket SUM across triggers...
    fold AS (
        SELECT source, b, CAST(sum(c) AS BIGINT) AS c FROM bh GROUP BY 1, 2
    ),
    -- ...which must equal the whole-data registers (additivity)
    whole AS (
        SELECT source, {bucket_expr_duckdb('v')} AS b,
               CAST(count(*) AS BIGINT) AS c
        FROM vals GROUP BY 1, 2
    ),
    fstat AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_buckets,
               list_sort(list([b, c])) AS arr
        FROM fold GROUP BY source
    ),
    wstat AS (
        SELECT source, list_sort(list([b, c])) AS arr FROM whole GROUP BY source
    ),
    ranked AS (
        SELECT source, b, c,
               sum(c) OVER (PARTITION BY source ORDER BY b
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum,
               sum(c) OVER (PARTITION BY source) AS n
        FROM fold
    ),
    p50 AS (
        SELECT source, CAST(min(b) AS BIGINT) AS b,
               CAST(max(n) AS BIGINT) AS n
        FROM ranked
        WHERE cum >= greatest(1, CAST(ceil(0.5 * n) AS BIGINT))
        GROUP BY source
    ),
    p99 AS (
        SELECT source, CAST(min(b) AS BIGINT) AS b
        FROM ranked
        WHERE cum >= greatest(1, CAST(ceil(0.99 * n) AS BIGINT))
        GROUP BY source
    ),
    exact50 AS (
        SELECT source, CAST(min(v) AS BIGINT) AS x FROM (
            SELECT source, v,
                   row_number() OVER (PARTITION BY source ORDER BY v) AS rn,
                   count(*) OVER (PARTITION BY source) AS n
            FROM vals
        ) WHERE rn = greatest(1, CAST(ceil(0.5 * n) AS BIGINT))
        GROUP BY source
    )
    SELECT f.source, f.n_buckets,
           CAST(CASE WHEN f.arr = w.arr THEN 1 ELSE 0 END AS BIGINT)
               AS fold_equals_whole,
           p50.n AS n_vals,
           (SELECT CAST({mid} AS BIGINT) FROM (SELECT p50.b AS b)) AS p50_mid,
           (SELECT CAST({mid} AS BIGINT) FROM (SELECT p99.b AS b)) AS p99_mid,
           CAST(CASE WHEN e.x BETWEEN
                    (SELECT CAST({lo} AS BIGINT) FROM (SELECT p50.b AS b))
                AND (SELECT CAST({hi} AS BIGINT) FROM (SELECT p50.b AS b))
                THEN 1 ELSE 0 END AS BIGINT) AS p50_contains_exact
    FROM fstat f
    JOIN wstat w USING (source)
    JOIN p50 USING (source)
    JOIN p99 USING (source)
    JOIN exact50 e USING (source)
    ORDER BY f.source
    """


@query("view_pquantile_audit_sources", oracle=_pq_oracle())
def view_pquantile_audit_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability + containment audit for the viewstore's pNN quantile
    aggregates (streaming/viewstore.py, round 10): per source, three
    simulated triggers (doc_id % 3) each store an HDR histogram partial of
    the batch's n_chars; the read-time fold (per-bucket SUM) must equal the
    whole-data registers ARRAY-EXACTLY (additivity — the property that also
    makes these the one takedown-SUBTRACTABLE sketch), the extracted
    p50/p99 follow hdr_quantiles' exact rank convention, and the p50
    bucket's [lo, hi] must CONTAIN the true median (the sketch's < 1/32
    relative-error contract, emitted as an integer flag). Every column is
    exact BIGINT arithmetic over the shared pure-integer bucket map, so the
    row set is hash-exact at every SF."""
    from pyspark.sql import Window

    from streamds_spark.operators.hdr import bounds_exprs, bucket_expr_spark
    from streamds_spark.streaming.viewstore import ViewSpec, view_batch_state

    docs = load_table(spark, sf_dir, "documents")
    spec = ViewSpec(
        keys=("source",), aggs={"med": ("p50", "n_chars"), "tail": ("p99", "n_chars")}
    )
    parts = [
        view_batch_state(docs.filter(F.col("doc_id") % 3 == b), spec)
        for b in range(3)
    ]
    store = parts[0]
    for p in parts[1:]:
        store = store.unionByName(p)
    fold = (
        store.select("source", F.explode("med__hdr").alias("e"))
        .groupBy("source", F.col("e.b").alias("b"))
        .agg(F.sum("e.c").cast("bigint").alias("c"))
    )
    vals = docs.selectExpr(
        "source", "CAST(n_chars AS BIGINT) AS v"
    ).where("v IS NOT NULL AND v >= 0")
    whole = (
        vals.selectExpr("source", f"{bucket_expr_spark('v')} AS b")
        .groupBy("source", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )

    def _arr(df):
        return df.groupBy("source").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
            F.array_sort(
                F.collect_list(F.array(F.col("b").cast("bigint"), "c"))
            ).alias("arr"),
        )

    fstat = _arr(fold)
    wstat = _arr(whole).select("source", F.col("arr").alias("warr"))
    w_cum = (
        Window.partitionBy("source")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("source")
    ranked = fold.withColumn("cum", F.sum("c").over(w_cum)).withColumn(
        "n", F.sum("c").over(w_all)
    )

    def _pick(q, bname):
        return (
            ranked.where(
                F.col("cum")
                >= F.greatest(F.lit(1), F.ceil(F.lit(q) * F.col("n")))
            )
            .groupBy("source")
            .agg(
                F.min("b").alias(bname),
                F.max("n").cast("bigint").alias(f"{bname}_n"),
            )
        )

    p50 = _pick(0.5, "b50")
    p99 = _pick(0.99, "b99").drop("b99_n")
    exact50 = (
        vals.withColumn("rn", F.row_number().over(Window.partitionBy("source").orderBy("v")))
        .withColumn("n", F.count(F.lit(1)).over(w_all))
        .where(
            F.col("rn")
            == F.greatest(F.lit(1), F.ceil(F.lit(0.5) * F.col("n")))
        )
        .groupBy("source")
        .agg(F.min("v").cast("bigint").alias("x"))
    )
    lo50, hi50, mid50 = bounds_exprs("b50")
    _l, _h, mid99 = bounds_exprs("b99")
    return (
        fstat.join(wstat, "source")
        .join(p50, "source")
        .join(p99, "source")
        .join(exact50, "source")
        .selectExpr(
            "source",
            "n_buckets",
            "CAST(CASE WHEN arr = warr THEN 1 ELSE 0 END AS BIGINT)"
            " AS fold_equals_whole",
            "CAST(b50_n AS BIGINT) AS n_vals",
            f"CAST({mid50} AS BIGINT) AS p50_mid",
            f"CAST({mid99} AS BIGINT) AS p99_mid",
            f"CAST(CASE WHEN x BETWEEN CAST({lo50} AS BIGINT)"
            f" AND CAST({hi50} AS BIGINT) THEN 1 ELSE 0 END AS BIGINT)"
            " AS p50_contains_exact",
        )
        .orderBy("source")
    )


@query(
    "view_minmax_ladder_audit_sources",
    oracle="""
    WITH docs3 AS (
        SELECT source, doc_id % 3 AS b, CAST(n_chars AS BIGINT) AS v
        FROM documents WHERE n_chars IS NOT NULL
    ),
    vmin AS (SELECT source, min(v) AS vmin FROM docs3 GROUP BY source),
    -- per-trigger distinct-value census (the ladder's raw material)
    cen AS (
        SELECT source, b, v, CAST(count(*) AS BIGINT) AS c
        FROM docs3 GROUP BY source, b, v
    ),
    rnk AS (
        SELECT source, b, v, c,
               row_number() OVER (PARTITION BY source, b ORDER BY v) AS rlo,
               row_number() OVER (PARTITION BY source, b ORDER BY v DESC) AS rhi,
               count(*) OVER (PARTITION BY source, b) AS nd
        FROM cen
    ),
    -- stored partials: top-4 ladders + coverage bounds (NULL = full cover)
    lo_lad AS (SELECT source, v, c FROM rnk WHERE rlo <= 4),
    hi_lad AS (SELECT source, v, c FROM rnk WHERE rhi <= 4),
    lo_bnd AS (
        SELECT source, min(bnd) AS bq FROM (
            SELECT source, b, max(v) AS bnd FROM rnk
            WHERE rlo <= 4 AND nd > 4 GROUP BY source, b
        ) GROUP BY source
    ),
    hi_bnd AS (
        SELECT source, max(bnd) AS bq FROM (
            SELECT source, b, min(v) AS bnd FROM rnk
            WHERE rhi <= 4 AND nd > 4 GROUP BY source, b
        ) GROUP BY source
    ),
    -- the takedown: delete every row holding its source's minimum value;
    -- the negative delta is the deleted rows' FULL value census
    negc AS (
        SELECT d.source, d.v, -CAST(count(*) AS BIGINT) AS c
        FROM docs3 d JOIN vmin m ON d.source = m.source AND d.v = m.vmin
        GROUP BY d.source, d.v
    ),
    lo_net AS (
        SELECT source, v, sum(c) AS net FROM (
            SELECT * FROM lo_lad UNION ALL SELECT * FROM negc
        ) GROUP BY source, v
    ),
    hi_net AS (
        SELECT source, v, sum(c) AS net FROM (
            SELECT * FROM hi_lad UNION ALL SELECT * FROM negc
        ) GROUP BY source, v
    ),
    lo_cand AS (SELECT source, min(v) AS cand FROM lo_net WHERE net > 0 GROUP BY source),
    hi_cand AS (SELECT source, max(v) AS cand FROM hi_net WHERE net > 0 GROUP BY source),
    folded AS (
        SELECT lc.source,
               CASE WHEN lb.bq IS NULL OR lc.cand <= lb.bq THEN lc.cand END AS lo_folded,
               CASE WHEN hb.bq IS NULL OR hc.cand >= hb.bq THEN hc.cand END AS hi_folded
        FROM lo_cand lc
        LEFT JOIN lo_bnd lb ON lc.source = lb.source
        JOIN hi_cand hc ON lc.source = hc.source
        LEFT JOIN hi_bnd hb ON lc.source = hb.source
    ),
    exact AS (
        SELECT d.source, min(d.v) AS lo_exact, max(d.v) AS hi_exact,
               CAST(count(*) AS BIGINT) AS n_remaining
        FROM docs3 d JOIN vmin m ON d.source = m.source
        WHERE d.v <> m.vmin GROUP BY d.source
    ),
    ndel AS (
        SELECT d.source, CAST(count(*) AS BIGINT) AS n_deleted
        FROM docs3 d JOIN vmin m ON d.source = m.source AND d.v = m.vmin
        GROUP BY d.source
    )
    SELECT f.source, f.lo_folded, e.lo_exact,
           CAST(CASE WHEN f.lo_folded = e.lo_exact THEN 1 ELSE 0 END AS BIGINT) AS lo_ok,
           f.hi_folded, e.hi_exact,
           CAST(CASE WHEN f.hi_folded = e.hi_exact THEN 1 ELSE 0 END AS BIGINT) AS hi_ok,
           n.n_deleted, e.n_remaining
    FROM folded f
    JOIN exact e ON f.source = e.source
    JOIN ndel n ON f.source = n.source
    ORDER BY f.source
    """,
)
def view_minmax_ladder_audit_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subtraction audit for the viewstore's min_ladder/max_ladder
    aggregates (streaming/viewstore.py, round 11, VERDICT r10 item 6): per
    source, three simulated triggers (doc_id % 3) each store a top-4
    ladder partial of n_chars (the 4 extreme distinct values with counts,
    plus the coverage bound); a simulated takedown then deletes every row
    holding its source's MINIMUM value and subtracts the deleted rows'
    full value census as a negative delta. The production fold (view_fold
    itself, not a reimplementation) must promote the runner-up to the new
    min — lo_ok = 1 — and leave the untouched max exact — hi_ok = 1 — for
    every source at every SF. The DuckDB oracle replays the identical
    ladder arithmetic (census -> top-4 + bound -> net counts -> covered
    candidate) against the identical deletion, so the row set is
    integer-hash-exact. Deleting exactly one distinct value per key can
    never exhaust a top-4 ladder (at most one distinct value sits below
    the global runner-up), so the audit is deterministic — the refusal
    path is pytest-pinned instead (tests/test_view_ladder.py). Scale: the
    fold reads ladder rows (<= 4 entries per key per trigger), never the
    corpus; the one corpus scan builds the partials, same as ingest."""
    from streamds_spark.streaming.viewstore import (
        ViewSpec,
        view_batch_state,
        view_fold,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", "n_chars")
        .where(F.col("n_chars").isNotNull())
    )
    spec = ViewSpec(
        keys=("source",),
        aggs={"lo": ("min_ladder", "n_chars"), "hi": ("max_ladder", "n_chars")},
        ladder_j=4,
    )
    parts = [
        view_batch_state(docs.filter(F.col("doc_id") % 3 == b), spec)
        for b in range(3)
    ]
    vmin = docs.groupBy("source").agg(F.min("n_chars").alias("vmin"))
    doomed = (
        docs.join(vmin, "source")
        .where(F.col("n_chars") == F.col("vmin"))
        .select("doc_id", "source", "n_chars")
    )
    neg = view_batch_state(doomed, spec, ladder_full=True)
    for c in ("lo__lad", "hi__lad"):
        neg = neg.withColumn(
            c,
            F.transform(
                F.col(c),
                lambda e: F.struct(e["v"].alias("v"), (-e["c"]).alias("c")),
            ),
        )
    neg = neg.withColumn("__rows", (-F.col("__rows")).cast("bigint"))
    store = parts[0]
    for p in parts[1:] + [neg]:
        store = store.unionByName(p)
    folded = view_fold(store, spec)
    remaining = docs.join(vmin, "source").where(
        F.col("n_chars") != F.col("vmin")
    )
    exact = remaining.groupBy("source").agg(
        F.min("n_chars").alias("lo_exact"),
        F.max("n_chars").alias("hi_exact"),
        F.count(F.lit(1)).cast("bigint").alias("n_remaining"),
    )
    ndel = doomed.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_deleted")
    )
    return (
        folded.join(exact, "source")
        .join(ndel, "source")
        .select(
            "source",
            F.col("lo").cast("bigint").alias("lo_folded"),
            F.col("lo_exact").cast("bigint").alias("lo_exact"),
            (F.col("lo") == F.col("lo_exact")).cast("int").cast("bigint").alias("lo_ok"),
            F.col("hi").cast("bigint").alias("hi_folded"),
            F.col("hi_exact").cast("bigint").alias("hi_exact"),
            (F.col("hi") == F.col("hi_exact")).cast("int").cast("bigint").alias("hi_ok"),
            "n_deleted",
            "n_remaining",
        )
        .orderBy("source")
    )
