"""Plan-shape regression tests: the properties that keep these operators fast
at 100 TB must hold in the physical plan, not just in intent."""

from __future__ import annotations

import pytest

from streamds_spark.plans.audit import plan_facts
from streamds_spark.registry import load_all

SF = "/root/testdata/sf0.001"
SPECS = load_all()


@pytest.fixture(scope="module")
def facts(spark):
    def get(name):
        return plan_facts(SPECS[name].fn(spark, SF))

    return get


def test_q6_filter_pushdown_and_pruning(facts):
    f = facts("q6_forecast_revenue")
    pushed = " ".join(f.pushed_filters)
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed
    # column pruning: scan must read only the 4 needed columns, not all 11
    assert any(
        s.count(":") <= 5 and "l_extendedprice" in s for s in f.read_schemas
    ), f.read_schemas


def test_grep_reads_only_text_column(facts):
    f = facts("grep_count")
    assert any(s.strip().startswith("struct<text:string") for s in f.read_schemas), f.read_schemas


def test_dim_joins_are_broadcast(facts):
    for q in [
        "q3_shipping_priority",
        "broadcast_join_agg",
        "brand_revenue",
        "q5_local_supplier_volume",
        "q2_min_cost_supplier",
        "q7_volume_shipping",
        "q8_market_share",
        "q9_product_profit",
        "q21_waiting_suppliers",
    ]:
        f = facts(q)
        assert f.has_broadcast_join, q


def test_scalar_subquery_thresholds_broadcast(facts):
    # Q11/Q15 shape: the one-row threshold must join via broadcast, and the
    # shared aggregate subtree must not force a single-partition exchange
    for q in ["q11_important_stock", "q15_top_supplier"]:
        f = facts(q)
        assert f.has_broadcast_join, q
        assert f.n_single_partition <= 2, q  # the 1-row agg itself is the only one


def test_topk_avoids_global_sort(facts):
    for q in ["topk_parts", "ann_bruteforce_topk", "q3_shipping_priority"]:
        assert facts(q).has_take_ordered, q


def test_aggregations_have_partial_phase(facts):
    # (codegen ids only appear in formatted plans post-execution under AQE,
    # so partial-agg presence is the pre-execution invariant we can assert)
    for q in ["wordcount", "q1_pricing_summary", "group_count_users"]:
        assert facts(q).has_partial_agg, q


def test_single_scan_queries_have_bounded_exchanges(facts):
    # one groupBy → at most a couple of exchanges (incl. AQE reuse); a blowup
    # here means an accidental extra shuffle snuck into a basic operator.
    # wordcount's budget is one higher (round 11): its tiny single-row-group
    # scan is deliberately round-robin-spread before the tokenize/explode map
    # stage (catalog._spread_if_tiny) — one extra RoundRobinPartitioning
    # exchange of <64 MB by construction.
    for q, max_ex in [("wordcount", 4), ("group_count_users", 2), ("dedup_exact", 2)]:
        assert facts(q).n_exchanges <= max_ex, q


def test_pii_redaction_is_map_only(facts):
    """The scrub pass must ride the scan: no exchange, no UDF node, and the
    scan reads only (doc_id, text)."""
    f = facts("pii_redaction")
    assert f.n_exchanges == 0, "regexp scrub must not shuffle"
    assert any("doc_id" in s and "text" in s and "n_chars" not in s for s in f.read_schemas), (
        f.read_schemas
    )


def test_embedding_dim_corr_has_no_join(facts):
    """The sufficient-stats formulation must not plan a join (the naive
    equivalent is a self-join on vec_id) and needs exactly one shuffle for
    the 28-group aggregate."""
    f = facts("embedding_dim_corr")
    assert not f.has_broadcast_join and not f.has_sortmerge_join
    assert f.n_exchanges <= 2, f.n_exchanges  # partial agg exchange (+AQE read)
    assert f.has_partial_agg


def test_vocab_overlap_broadcasts_vocab_sizes(facts):
    f = facts("source_vocab_overlap")
    assert f.has_broadcast_join, "per-source vocab counts must broadcast"


def test_mad_outliers_broadcasts_per_type_scalars(facts):
    f = facts("value_outliers_mad")
    assert f.has_broadcast_join, "per-type median/MAD must broadcast onto the fact"
    assert f.has_partial_agg


def test_cohort_and_rfm_plans_stay_bounded(facts):
    """retention_cohorts: user_id join co-partitions with the first-seen agg
    (no broadcast needed, no single-partition stage). rfm_scores: quintiles
    are distributed exact ranks (operators/ranking.py) — per-customer output
    must never serialize through a global window."""
    f = facts("retention_cohorts")
    assert f.n_single_partition == 0, "cohort pipeline must stay partitioned"
    assert f.has_partial_agg
    f = facts("rfm_scores")
    assert f.n_global_windows == 0, "rfm quintiles must use distributed ranks"
    assert f.n_single_partition <= 1  # the 1-row max-date aggregate only
    # batched with_global_ranks ranks all three metrics IN PLACE, so the three
    # per-metric join-backs (one of which used to surface as a broadcast join)
    # are gone; pin the exchange budget instead — 3 bucketed-rank window
    # exchanges at most, anything above means a join-back crept back in
    assert f.n_exchanges <= 6


# Queries allowed to contain an UNPARTITIONED window (whole input to one task).
# Each is report-shaped: the window input is already aggregated down to a
# bounded row count before the window runs. Anything else must use
# operators/ranking.py (distributed exact ranks) or partition its window.
GLOBAL_WINDOW_ALLOWLIST = {
    "cumulative_distinct_users",  # window over time-bucket rows (hours elapsed)
    # hdr_doclen_quantiles' cumsum runs over the log-linear REGISTER TABLE —
    # <=1888 rows by construction at any input size (operators/hdr.py)
    "hdr_doclen_quantiles",
    # doclen_percentile_feature reuses the same register-table cumsum as a
    # broadcast LUT (operators/hdr.py) — window input bounded by construction
    "doclen_percentile_feature",
    # time_to_convert_quantiles: same register-table cumsum (operators/hdr.py)
    "time_to_convert_quantiles",
    # hdr_signed_delta_quantiles: same cumsum over the SIGNED register table
    # — <=2x1888 rows by construction (operators/hdr.py signed mirror)
    "hdr_signed_delta_quantiles",
    # ks_doclen_drift's CDF cumsum (over DISTINCT-length rows, domain-bounded)
    # sits behind a lazy localCheckpoint, so the census sees an RDD scan
    "ntile_customers",  # decile report over the customer aggregate; documented swap
    "quality_deciles",  # decile report; documented approx_percentile swap at scale
    "retrieval_eval_ndcg",  # rank windows run AFTER LIMIT 10 — ≤10-row input
    "rrf_hybrid_search",  # rank windows run AFTER LIMIT 50 — ≤50-row input
    "vocab_growth",  # growth curve over first-occurrence docs (vocab-bounded)
    "zipf_slope",  # rank window over vocabulary rows; ZIPF_TOP regression input
}


@pytest.mark.slow
def test_no_new_global_windows(spark):
    """Repo-wide scale guard: sweep EVERY registered query's optimized plan and
    fail if an unpartitioned window appears outside the explicit allowlist.
    Exact set equality, so stale allowlist entries surface too."""
    offenders = {}
    for name, spec in SPECS.items():
        n = plan_facts(spec.fn(spark, SF)).n_global_windows
        if n:
            offenders[name] = n
    assert set(offenders) == GLOBAL_WINDOW_ALLOWLIST, offenders


def test_weighted_sample_is_single_pass_topk(facts):
    f = facts("weighted_sample_topk")
    assert f.has_take_ordered, "ES sampling must be TakeOrdered, not global sort"
    assert not f.has_broadcast_join and not f.has_sortmerge_join


def test_runtime_bloom_filter_prunes_shuffle_join(spark):
    """Runtime semi-join reduction (the 100 TB shuffle-join saver): when a
    selective dimension side can't broadcast, Spark should inject a bloom
    filter built from the dim keys into the fact scan, cutting shuffle input
    before the exchange. Pins that the engine's plans are eligible for this
    optimizer path (it only fires on plain equi-join shapes)."""
    from pyspark.sql import functions as F

    from streamds_spark.catalog import load_table

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
        orders = load_table(spark, "/root/testdata/sf0.001", "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, "bloom filter not injected into fact side"
        assert "bloom_filter_agg" in plan
        # and the query still returns the right answer under the rewrite
        assert j.collect()[0]["count"] > 0
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_ranked_topk_uses_window_group_limit(spark):
    """Per-group top-k via row_number + rank filter must compile to
    WindowGroupLimit (Spark 3.5+): each task keeps only k rows per group
    BEFORE the shuffle/sort, so a 100 TB per-domain top-k never materializes
    full per-group sorts. Pins the rank-pushdown eligibility of the repo's
    window+filter idiom (domain_cap_sample is this exact shape)."""
    plan = (
        SPECS["domain_cap_sample"]
        .fn(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan


def test_parquet_aggregate_pushdown_available(spark, tmp_path):
    """MIN/MAX/COUNT over parquet can be answered from footer statistics
    (spark.sql.parquet.aggregatePushdown): a 100 TB `SELECT count(*), max(x)`
    health check should read metadata, not data. Pins that the feature
    engages on our corpus-writer output (plain columns, no filters)."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "agg_pd")
    spark.range(10_000).selectExpr("id", "id % 7 AS k").write.parquet(path)
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.parquet.aggregatePushdown",
            "spark.sql.sources.useV1SourceList",  # pushdown is a V2-scan feature
        )
    }
    try:
        spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
        spark.conf.set("spark.sql.sources.useV1SourceList", "")
        df = spark.read.parquet(path).agg(
            F.count("*").alias("n"), F.min("id").alias("lo"), F.max("id").alias("hi")
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedAggregation: [COUNT(*)" in plan
        r = df.collect()[0]
        assert (r.n, r.lo, r.hi) == (10_000, 0, 9_999)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_semdedup_single_cluster_shuffle_no_cartesian(spark):
    """semantic_dedup_keep: the candidate stage must be an equi-join on the
    cluster id (shuffle or broadcast hash), never a cartesian/nested-loop —
    the whole point of clustering before comparing."""
    from streamds_spark.plans.audit import formatted_plan

    df = SPECS["semantic_dedup_keep"].fn(spark, SF)
    p = formatted_plan(df)
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p[:2000]


def test_kn5_model_tables_not_broadcast(spark):
    """kn5_perplexity_filter: the nine model-table joins must be PLANNABLE as
    shuffles on word keys — at web scale the n-gram vocabulary cannot
    broadcast, so only the explicitly-hinted 1-row relations (total,
    min-source selector) may carry a broadcast hint. Size-based planning
    would broadcast everything at sf0.001, so the size path is disabled for
    the pin: whatever still broadcasts is hint-driven by construction."""
    from streamds_spark.plans.audit import formatted_plan

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = formatted_plan(SPECS["kn5_perplexity_filter"].fn(spark, SF))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    n_bc = p.count("BroadcastExchange")
    assert n_bc <= 2, f"expected <=2 hinted broadcasts (1-row relations), got {n_bc}"
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p, "model joins must shuffle"
    # the hinted 1-row cross joins legitimately plan as broadcast nested
    # loops; an UNBROADCAST cartesian is the only forbidden shape
    assert "CartesianProduct" not in p


def test_retrieval_eval_uses_take_ordered(facts):
    """retrieval_eval_ndcg: both top-10 lists must be TakeOrdered (local
    top-k + driver merge), never a global sort of the candidate set."""
    f = facts("retrieval_eval_ndcg")
    assert f.has_take_ordered
    assert f.n_single_partition <= 2, "only the 10-row rank windows may serialize"


def test_approx_equidepth_is_one_agg_plus_map(facts):
    """equidepth_approx_audit: no window anywhere (the whole point of the
    sketch path) and only 1-row-aggregate exchanges — never a rank/sort."""
    f = facts("equidepth_approx_audit")
    assert f.n_global_windows == 0
    assert f.n_exchanges <= 6, f.n_exchanges
