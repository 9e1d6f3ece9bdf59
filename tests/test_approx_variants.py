"""Paired exact-vs-approx divergence checks for the three percentile-path
queries that gained an `exact=False` sketch mode (the 100 TB path: GK
percentile_approx — mergeable partials, no global rank/window).

What "bounded error" means here, quantified against the EXACT mode:
  - an approx bucket/decile edge is a real data value whose true rank is
    within N/accuracy of the target rank (GK guarantee);
  - assignment uses strict `>`, so a boundary TIE GROUP lands whole in the
    lower bucket — exact ntile instead splits ties by the tie-break key;
  - hence per-bucket depth may differ from exact by at most
    2·(N/accuracy + max_tie) where max_tie is the largest count of any
    single value of the ordered column (computed exactly in the test).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.functions.text import tokens
from streamds_spark.queries.analytics import equidepth_histogram_price
from streamds_spark.queries.extras import adaptive_length_filter
from streamds_spark.queries.llmdata.quality import quality_deciles

SF = "/root/testdata/sf0.01"
ACCURACY = 10000


def _max_tie(spark, df, col) -> int:
    return df.groupBy(col).count().agg(F.max("count")).collect()[0][0]


def _depth_divergence(exact_rows, approx_rows, key) -> int:
    e = {r[key]: r["n_rows"] if "n_rows" in r.__fields__ else r["n_docs"] for r in exact_rows}
    a = {r[key]: r["n_rows"] if "n_rows" in r.__fields__ else r["n_docs"] for r in approx_rows}
    return max(abs(e.get(k, 0) - a.get(k, 0)) for k in set(e) | set(a))


def test_equidepth_histogram_approx_divergence(spark):
    exact = equidepth_histogram_price(spark, SF, exact=True).collect()
    approx = equidepth_histogram_price(spark, SF, exact=False).collect()
    # same report schema, same total mass
    assert {r["bucket"] for r in exact} == set(range(1, 17))
    assert sum(r["n_rows"] for r in exact) == sum(r["n_rows"] for r in approx)
    li = load_table(spark, SF, "lineitem").select(
        F.col("l_extendedprice").alias("p")
    )
    n = sum(r["n_rows"] for r in exact)
    tie = _max_tie(spark, li, "p")
    bound = 2 * (n / ACCURACY + tie)
    div = _depth_divergence(exact, approx, "bucket")
    assert div <= bound, f"depth divergence {div} > bound {bound}"
    # approx buckets are contiguous, ordered value ranges
    by_b = sorted(approx, key=lambda r: r["bucket"])
    for prev, cur in zip(by_b, by_b[1:]):
        assert prev["hi"] <= cur["lo"] + 1e-9


def test_quality_deciles_approx_divergence(spark):
    exact = quality_deciles(spark, SF, exact=True).collect()
    approx = quality_deciles(spark, SF, exact=False).collect()
    assert sum(r["n_docs"] for r in exact) == sum(r["n_docs"] for r in approx)
    docs = load_table(spark, SF, "documents")
    from streamds_spark.functions.text import stopword_ratio

    sc = docs.select(stopword_ratio(tokens(F.col("text"))).alias("score"))
    n = sum(r["n_docs"] for r in exact)
    tie = _max_tie(spark, sc, "score")
    bound = 2 * (n / ACCURACY + tie)
    div = _depth_divergence(exact, approx, "decile")
    assert div <= bound, f"decile divergence {div} > bound {bound}"


def test_adaptive_length_filter_approx_divergence(spark):
    exact = adaptive_length_filter(spark, SF, exact=True).collect()
    approx = adaptive_length_filter(spark, SF, exact=False).collect()
    assert len(exact) == len(approx)
    e = {r["doc_id"]: r for r in exact}
    a = {r["doc_id"]: r for r in approx}
    assert set(e) == set(a)
    # flag flips are confined to docs whose n_tokens lies BETWEEN the exact
    # (interpolated) and approx (data-value) bounds for their lang — the
    # only region where the two definitions can disagree
    flips = [k for k in e if e[k]["is_outlier"] != a[k]["is_outlier"]]
    for k in flips:
        nt = e[k]["n_tokens"]
        lo_band = sorted([e[k]["lo"], a[k]["lo"]])
        hi_band = sorted([e[k]["hi"], a[k]["hi"]])
        in_lo = lo_band[0] - 1e-9 <= nt <= lo_band[1] + 1e-9
        in_hi = hi_band[0] - 1e-9 <= nt <= hi_band[1] + 1e-9
        assert in_lo or in_hi, (
            f"doc {k} flipped outside the bound bands: nt={nt}, "
            f"lo {lo_band}, hi {hi_band}"
        )
    # and the flip mass is small: n_tokens is a small-integer column, so a
    # single tie group at a boundary can flip together — cap at 5% of corpus
    assert len(flips) <= max(10, len(e) // 20), len(flips)


def test_approx_plans_have_no_window(spark):
    """The whole point of exact=False: no WindowExec anywhere in the plan
    (the exact quality_deciles deliberately accepts a report-sized global
    window; the sketch path must not)."""
    for df in (
        equidepth_histogram_price(spark, SF, exact=False),
        quality_deciles(spark, SF, exact=False),
        adaptive_length_filter(spark, SF, exact=False),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan, plan[:2000]
