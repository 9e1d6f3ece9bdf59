"""Streaming edge store with incremental triangle maintenance
(streaming/graph_stream.py): stream == batch exactly, re-delivery is a
no-op, deltas partition the triangle set, compaction-invariant reads.
"""

import os

import pytest
from pyspark.sql import functions as F

from streamds_spark.queries.graph import triangle_count
from streamds_spark.streaming.graph_stream import (
    EdgeStreamPaths,
    compact_edge_store,
    graph_census,
    process_edge_batch,
    run_edge_stream,
)

pytestmark = pytest.mark.usefixtures("spark")


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "u bigint, v bigint")


BATCHES = [
    # triangle 1-2-3 completed in batch 1; edge (2,3) re-delivered later
    [(1, 2), (2, 3)],
    [(1, 3), (3, 4)],
    # duplicate + reversed duplicates + self-loop: all no-ops
    [(2, 3), (3, 1), (5, 5), (4, 5)],
    # K4 on 3,4,5,6 closes several triangles at once
    [(3, 5), (3, 6), (4, 6), (5, 6)],
]


def _drive(spark, work_dir):
    paths = EdgeStreamPaths(work_dir)
    for i, rows in enumerate(BATCHES):
        process_edge_batch(_edges_df(spark, rows), i, paths)
    return paths


@pytest.mark.slow
def test_stream_equals_batch_census(spark, tmp_path):
    paths = _drive(spark, str(tmp_path / "g"))
    got = graph_census(spark, paths.work_dir).collect()[0]
    all_edges = (
        spark.read.parquet(
            *[os.path.join(paths.edge_store, f"batch={i}") for i in range(4)]
        )
        .distinct()
    )
    expect_tri = triangle_count(all_edges).collect()[0]["n_triangles"]
    assert got["n_edges"] == all_edges.count()
    assert got["n_triangles"] == expect_tri
    # delta partition: every batch census row is a disjoint contribution
    census = spark.read.parquet(
        *[os.path.join(paths.census_store, f"batch={i}") for i in range(4)]
    )
    assert census.agg(F.sum("delta_triangles")).collect()[0][0] == expect_tri


@pytest.mark.slow
def test_redelivery_is_noop(spark, tmp_path):
    paths = _drive(spark, str(tmp_path / "g"))
    before = graph_census(spark, paths.work_dir).collect()[0]
    # replay batch 2 (the engine's overwrite-by-batchId discipline)
    process_edge_batch(_edges_df(spark, BATCHES[2]), 2, paths)
    after = graph_census(spark, paths.work_dir).collect()[0]
    assert tuple(before) == tuple(after)
    # an entirely duplicate NEW batch adds nothing
    process_edge_batch(_edges_df(spark, [(1, 2), (3, 4)]), 9, paths)
    again = graph_census(spark, paths.work_dir).collect()[0]
    assert tuple(again) == tuple(before)


@pytest.mark.slow
def test_compaction_invariant(spark, tmp_path):
    paths = _drive(spark, str(tmp_path / "g"))
    before = tuple(graph_census(spark, paths.work_dir).collect()[0])
    compact_edge_store(spark, paths.work_dir, 3)
    after = tuple(graph_census(spark, paths.work_dir).collect()[0])
    assert after == before
    seg = [d for d in os.listdir(paths.edge_store) if d.startswith("segment=")]
    assert seg, "compaction produced no segment"


@pytest.mark.slow
def test_real_stream_drain(spark, tmp_path):
    src = str(tmp_path / "src")
    for i, rows in enumerate(BATCHES):
        _edges_df(spark, rows).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, f"part{i}")
        )
    # flatten: the reader tails the dir of parquet files
    files = spark.read.parquet(src + "/part*")
    src2 = str(tmp_path / "src2")
    files.coalesce(1).write.parquet(src2)
    work = str(tmp_path / "gs")
    q = run_edge_stream(spark, src2, work, max_files_per_trigger=1)
    q.awaitTermination(120)
    got = graph_census(spark, work).collect()[0]
    all_edges = (
        files.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .where(F.col("u") < F.col("v"))
        .distinct()
    )
    assert got["n_edges"] == all_edges.count()
    assert (
        got["n_triangles"]
        == triangle_count(all_edges).collect()[0]["n_triangles"]
    )
