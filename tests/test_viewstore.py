"""Generic incremental materialized view (streaming/viewstore.py):
stream==batch exactness for sum/count/min/max/avg, replay idempotence,
compaction invariance, spec validation, empty store."""

from __future__ import annotations

import os
import time

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.streaming.viewstore import (
    ViewSpec,
    compact_view,
    run_view_stream,
    view_batch_state,
    view_report,
    write_view_batch,
)

SF = "/root/testdata/sf0.001"

SPEC = ViewSpec(
    keys=("lang", "source"),
    aggs={
        "n_docs": ("count", None),
        "total_chars": ("sum", "n_chars"),
        "min_doc": ("min", "doc_id"),
        "max_doc": ("max", "doc_id"),
        "avg_chars": ("avg", "n_chars"),
    },
)


def _split(src_dir: str, n_files: int = 4) -> None:
    tbl = pq.read_table(os.path.join(SF, "documents.parquet")).sort_by("doc_id")
    n = tbl.num_rows
    os.makedirs(src_dir, exist_ok=True)
    now = time.time()
    for i in range(n_files):
        part = tbl.slice(i * n // n_files, (i + 1) * n // n_files - i * n // n_files)
        path = os.path.join(src_dir, f"{i:03d}.parquet")
        pq.write_table(part, path)
        os.utime(path, (now - 100 + i, now - 100 + i))


def _batch_view(spark):
    docs = load_table(spark, SF, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
        (F.sum("n_chars") / F.count("n_chars")).alias("avg_chars"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.select(*sorted(df.columns)).collect())


@pytest.fixture(scope="module")
def drained(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("viewstore")
    src_dir, work_dir = str(root / "src"), str(root / "work")
    _split(src_dir)
    q = run_view_stream(spark, src_dir, work_dir, SPEC)
    q.awaitTermination(timeout=300)
    assert not q.isActive
    return src_dir, work_dir


def test_view_equals_batch_aggregate(spark, drained):
    _, work_dir = drained
    got = _rows(view_report(spark, work_dir, SPEC))
    want = _rows(_batch_view(spark))
    assert got == want and len(got) > 1


def test_replay_is_idempotent(spark, drained):
    """Rewriting a committed batch dir (what a post-crash replay does)
    leaves the view unchanged — partials are a pure function of the batch."""
    src_dir, work_dir = drained
    before = _rows(view_report(spark, work_dir, SPEC))
    first_file = sorted(os.listdir(src_dir))[0]
    batch0 = spark.read.parquet(os.path.join(src_dir, first_file))
    write_view_batch(batch0, 0, os.path.join(work_dir, "view_store"), SPEC)
    assert _rows(view_report(spark, work_dir, SPEC)) == before


def test_compaction_invariant(spark, drained):
    _, work_dir = drained
    before = _rows(view_report(spark, work_dir, SPEC))
    folded = compact_view(spark, work_dir, upto_batch=2)
    assert folded >= 1
    assert _rows(view_report(spark, work_dir, SPEC)) == before


def test_spec_validation(spark):
    with pytest.raises(ValueError):
        ViewSpec(keys=(), aggs={"n": ("count", None)})
    with pytest.raises(ValueError):
        ViewSpec(keys=("k",), aggs={})
    with pytest.raises(ValueError):
        ViewSpec(keys=("k",), aggs={"d": ("count_distinct", "x")})
    with pytest.raises(ValueError):
        ViewSpec(keys=("k",), aggs={"s": ("sum", None)})


def test_partials_one_row_per_batch_key(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 3), ("b", 5)], "k string, v bigint"
    )
    spec = ViewSpec(keys=("k",), aggs={"s": ("sum", "v"), "n": ("count", None)})
    rows = {r["k"]: r for r in view_batch_state(df, spec).collect()}
    assert rows["a"]["s"] == 4 and rows["a"]["n"] == 2
    assert rows["b"]["s"] == 5 and rows["b"]["n"] == 1


def test_empty_store(spark, tmp_path):
    out = view_report(spark, str(tmp_path / "nowhere"), SPEC)
    assert out.count() == 0
    assert set(out.columns) == {"lang", "source", *SPEC.aggs}


def test_avg_partial_name_collision_refused(spark):
    with pytest.raises(ValueError, match="collision"):
        ViewSpec(keys=("k",), aggs={"v__sum": ("sum", "v"), "v": ("avg", "v")})


def test_empty_store_typed_with_src_schema(spark, tmp_path):
    from pyspark.sql.types import StructType

    src_schema = load_table(spark, SF, "documents").schema
    out = view_report(spark, str(tmp_path / "nowhere"), SPEC, src_schema=src_schema)
    assert out.count() == 0
    types = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert types["n_docs"] == "bigint"
    assert types["lang"] == "string"
    assert types["min_doc"] == "bigint"
    assert "void" not in set(types.values())
    # parquet-writable (the null-typed fallback is not)
    out.write.parquet(str(tmp_path / "empty_view"))
