"""Count-Min sketch (queries/llmdata/sketches.py): the CMS guarantees and the
cell-wise merge property that makes it work for sharded/streaming ingest."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamds_spark.queries.llmdata.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    build_cms,
    cms_term_estimates,
)

SF = "/root/testdata/sf0.001"


def _term_counts(spark, rows):
    return spark.createDataFrame(rows, "term string, c long")


def test_estimates_never_underestimate(spark):
    for r in cms_term_estimates(spark, SF).collect():
        assert r.overestimate >= 0
        assert r.cms_estimate >= r.exact_count


def test_sketch_shape_and_mass(spark):
    tc = _term_counts(spark, [(f"w{i}", i + 1) for i in range(100)])
    sk = build_cms(tc).collect()
    total = sum(i + 1 for i in range(100))
    assert len(sk) <= CMS_DEPTH * CMS_WIDTH
    # every row of the sketch preserves the full mass
    by_row: dict[int, int] = {}
    for r in sk:
        assert 0 <= r.cell < CMS_WIDTH and 0 <= r.j < CMS_DEPTH
        by_row[r.j] = by_row.get(r.j, 0) + r.cellsum
    assert set(by_row) == set(range(CMS_DEPTH))
    assert all(v == total for v in by_row.values())


def test_merge_is_cellwise_addition(spark):
    """sketch(A union B) == sketch(A) + sketch(B) — the property that lets
    every corpus shard sketch independently and a reducer add the D*W grids."""
    a = _term_counts(spark, [(f"w{i}", 5) for i in range(50)])
    b = _term_counts(spark, [(f"w{i}", 3) for i in range(25, 75)])
    merged_direct = build_cms(
        a.unionByName(b).groupBy("term").agg(F.sum("c").alias("c"))
    ).collect()
    summed = (
        build_cms(a)
        .unionByName(build_cms(b))
        .groupBy("j", "cell")
        .agg(F.sum("cellsum").alias("cellsum"))
        .collect()
    )
    key = lambda r: (r.j, r.cell)
    assert sorted((key(r), r.cellsum) for r in merged_direct) == sorted(
        (key(r), r.cellsum) for r in summed
    )


def test_partial_aggregation_bounds_shuffle(spark):
    """The sketch groupBy must show a partial_count/partial_sum before the
    exchange — that's what keeps the shuffle at <= D*W rows per task."""
    tc = _term_counts(spark, [(f"w{i}", 1) for i in range(10)])
    plan = build_cms(tc)._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan or "HashAggregate" in plan
    assert plan.count("Exchange") == 1  # exactly one exchange: the 2048-key agg
