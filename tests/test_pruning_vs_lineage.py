"""Column-pruning proof, automated: every parquet scan's ReadSchema must be
a subset of the columns the plan actually references (from
plans/lineage.referenced_source_columns — outputs, filters, join keys,
everything). A scan reading a column nothing references means pruning
failed and a 100 TB table pays IO for dead columns.

Runs over the bench headline set plus the join-heavy TPC-H picks — the
shapes where a pruning regression would cost the most."""

from __future__ import annotations

import re

import pytest

from streamds_spark.plans.audit import formatted_plan
from streamds_spark.plans.lineage import referenced_source_columns
from streamds_spark.registry import load_all

SF = "/root/testdata/sf0.001"

QUERIES = [
    # headline
    "flagship_filter_group_count",
    "wordcount",
    "group_count_users",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "window_rank_orders",
    "agg_stats_lineitem",
    "dedup_exact",
    "text_quality_score",
    # join-heavy / wide-table picks
    "q9_product_profit",
    "q18_large_orders",
    "retention_cohorts",
    "q10_returned_items",
]
# not listed: queries whose builders localCheckpoint (e.g. rfm_scores) — the
# materialized RDD hides the original parquet scan from the executed plan


def _scans(plan_text: str):
    """[(table, {columns})] for every parquet scan block in a formatted plan."""
    out = []
    for block in re.split(r"\(\d+\) Scan parquet", plan_text)[1:]:
        loc = re.search(r"Location: \S+ \[[^\]]*?([a-zA-Z0-9_.-]+\.parquet)", block)
        rs = re.search(r"ReadSchema: struct<([^\n>]*)>", block)
        if not loc or not rs:
            continue
        cols = {
            f.split(":")[0].strip()
            for f in rs.group(1).split(",")
            if f.strip()
        }
        out.append((loc.group(1), cols))
    return out


@pytest.mark.parametrize("name", QUERIES)
def test_scans_read_only_referenced_columns(spark, name):
    df = load_all()[name].fn(spark, SF)
    referenced = referenced_source_columns(df)
    scans = _scans(formatted_plan(df))
    assert scans, "no parquet scans parsed — plan format changed?"
    for table, cols in scans:
        allowed = referenced.get(table, set())
        over_read = cols - allowed
        assert not over_read, (
            f"{name}: scan of {table} reads {sorted(over_read)} which nothing "
            f"in the plan references (referenced: {sorted(allowed)})"
        )
