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


def test_streaming_sketch_merge_equals_batch(spark, tmp_path):
    """Ingest-time sketching: build a CMS per micro-batch in foreachBatch,
    merge cell-wise, and land exactly on the batch-mode sketch of the full
    input — the pattern that gives a 100 TB stream a live frequency sketch
    with kilobytes of state per shard."""
    import os

    src = str(tmp_path / "in")
    os.makedirs(src)
    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    all_rows = []
    for c in range(4):
        lines = [words[(c + i) % len(words)] for i in range(40)]
        all_rows += lines
        with open(os.path.join(src, f"chunk_{c}.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")

    merged: dict[tuple[int, int], int] = {}

    def sketch_batch(df, _bid):
        tc = df.select(F.col("value").alias("term")).groupBy("term").agg(
            F.count("*").alias("c")
        )
        for r in build_cms(tc).collect():
            merged[(r.j, r.cell)] = merged.get((r.j, r.cell), 0) + r.cellsum

    q = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(src)
        .writeStream.foreachBatch(sketch_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch_tc = (
        spark.createDataFrame([(w,) for w in all_rows], "term string")
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    batch_sketch = {(r.j, r.cell): r.cellsum for r in build_cms(batch_tc).collect()}
    assert merged == batch_sketch
