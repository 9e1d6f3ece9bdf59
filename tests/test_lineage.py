"""Column-level lineage extraction (plans/lineage.py): exact source-column
sets for joins/aggregates/windows/explodes/unions, literal detection, and
the no-job guarantee (plan traversal must not launch Spark jobs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamds_spark.plans.lineage import column_lineage, lineage_report
from streamds_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def test_tpch_q3_exact_lineage(spark):
    df = load_all()["q3_shipping_priority"].fn(spark, SF)
    lin = column_lineage(df)
    assert lin["l_orderkey"] == {("lineitem.parquet", "l_orderkey")}
    assert lin["revenue"] == {
        ("lineitem.parquet", "l_extendedprice"),
        ("lineitem.parquet", "l_discount"),
    }
    assert lin["o_orderdate"] == {("orders.parquet", "o_orderdate")}


def test_explode_union_window_literal(spark):
    # explode: word descends from documents.text; count(*) is literal-only
    lin = column_lineage(load_all()["wordcount"].fn(spark, SF))
    assert lin["word"] == {("documents.parquet", "text")}
    assert lin["cnt"] == set()
    # union: positional merge across both sides
    lin_u = column_lineage(load_all()["union_sides"].fn(spark, SF))
    assert lin_u["nationkey"] == {
        ("customer.parquet", "c_nationkey"),
        ("supplier.parquet", "s_nationkey"),
    }
    # window function output references its aggregated column AND the
    # partition/order keys (they determine the value — correct semantics)
    lin_w = column_lineage(load_all()["moving_average"].fn(spark, SF))
    assert ("events.parquet", "value") in lin_w["ma3"]
    assert ("events.parquet", "user_id") in lin_w["ma3"]


def test_local_relation_and_report_format(spark):
    df = spark.createDataFrame([(1, 2)], "a int, b int").select(
        (F.col("a") + F.col("b")).alias("s"), F.lit(9).alias("k")
    )
    lin = column_lineage(df)
    assert lin["s"] == {("<local>", "a"), ("<local>", "b")}
    assert lin["k"] == set()
    rep = lineage_report(df)
    assert "s <- <local>.a, <local>.b" in rep
    assert "k <- <literal>" in rep


def test_lineage_runs_no_jobs(spark):
    """Lineage is driver-side plan traversal — zero Spark jobs."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    df = load_all()["q5_local_supplier_volume"].fn(spark, SF)  # builder may scan footers
    before = tracker.getJobIdsForGroup(None) or []
    column_lineage(df)
    after = tracker.getJobIdsForGroup(None) or []
    assert len(after) == len(before)


def test_expand_shapes_resolve(spark):
    """cube/rollup/grouping-sets, hopping windows, and unpivot lower to the
    Expand node — each output column must resolve through the i-th
    expression of every projection row."""
    specs = load_all()
    for name in [
        "cube_events",
        "rollup_orders",
        "grouping_sets_orders",
        "hopping_window_counts",
        "unpivot_order_stats",
    ]:
        lin = column_lineage(specs[name].fn(spark, SF))
        bad = {c: s for c, s in lin.items() if any(t == "?" for t, _ in s)}
        assert not bad, (name, bad)
    # spot-check semantic correctness, not just resolution
    lin_u = column_lineage(specs["unpivot_order_stats"].fn(spark, SF))
    assert ("orders.parquet", "o_totalprice") in lin_u["val"]


def test_cli_lineage_verb(spark, capsys):
    from streamds_spark.cli import main

    assert main(["lineage", "q3_shipping_priority", SF]) == 0
    out = capsys.readouterr().out
    assert "revenue <- lineitem.parquet.l_discount, lineitem.parquet.l_extendedprice" in out
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["lineage", "no_such_query", SF])


def test_every_headline_query_resolves(spark):
    """No '?' markers on the bench headline set — the shapes we rely on all
    resolve to concrete source columns or literals."""
    import bench

    specs = load_all()
    for name in bench.HEADLINE:
        lin = column_lineage(specs[name].fn(spark, SF))
        unresolved = {
            c: s for c, s in lin.items() if any(t == "?" for t, _ in s)
        }
        assert not unresolved, (name, unresolved)
