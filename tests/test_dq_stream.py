"""Streaming data-quality monitor (llm_pipeline dq_store): per-trigger
constraint reports over the RAW arrivals fold additively into exactly the
one-pass batch report over the whole feed; compaction-invariant; the gate
move into foreachBatch preserves the streamed kept set."""

from __future__ import annotations

import os
import time

import pyarrow.parquet as pq
import pytest

from streamds_spark.catalog import load_table
from streamds_spark.io import appendlog
from streamds_spark.queries.llmdata.corpus import pipeline_exact_dedup, pipeline_gate
from streamds_spark.streaming.llm_pipeline import (
    CorpusStreamPaths,
    compact_stores,
    corpus_dq_report,
    dq_batch_report,
    run_llm_corpus_stream,
)

SF = "/root/testdata/sf0.001"


def _split(src_dir: str, n_files: int = 3) -> None:
    tbl = pq.read_table(os.path.join(SF, "documents.parquet")).sort_by("doc_id")
    n = tbl.num_rows
    os.makedirs(src_dir, exist_ok=True)
    now = time.time()
    for i in range(n_files):
        part = tbl.slice(i * n // n_files, (i + 1) * n // n_files - i * n // n_files)
        path = os.path.join(src_dir, f"{i:03d}.parquet")
        pq.write_table(part, path)
        os.utime(path, (now - 100 + i, now - 100 + i))


@pytest.fixture(scope="module")
def drained(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("dqstream")
    src_dir, work_dir = str(root / "src"), str(root / "work")
    _split(src_dir)
    q = run_llm_corpus_stream(spark, src_dir, work_dir)
    q.awaitTermination(timeout=300)
    assert not q.isActive
    return src_dir, work_dir


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_fold_equals_batch_report(spark, drained):
    """SUM-folded per-trigger reports == the one-pass constraint suite over
    the entire raw feed, row for row (additive checks, exact fold)."""
    src_dir, work_dir = drained
    got = _rows(corpus_dq_report(spark, work_dir))
    want = _rows(dq_batch_report(spark.read.parquet(src_dir)))
    assert got == want
    assert len(got) == 6
    assert all(r[4] is True for r in got)  # the sf0.001 feed is clean
    assert all(r[2] > 0 for r in got)


def test_report_survives_compaction(spark, drained):
    src_dir, work_dir = drained
    before = _rows(corpus_dq_report(spark, work_dir))
    stats = compact_stores(spark, work_dir, merge_corpus=False)
    assert stats["dq_store"] >= 1  # something actually folded
    after = _rows(corpus_dq_report(spark, work_dir))
    assert before == after


def test_gate_move_preserves_kept_set(spark, drained):
    """Gating inside foreachBatch (so DQ sees raw arrivals) must leave the
    streamed corpus identical to the batch pipeline's gate+dedup set."""
    _, work_dir = drained
    corpus = appendlog.get(spark, CorpusStreamPaths(work_dir).corpus)
    got = sorted(r["doc_id"] for r in corpus.select("doc_id").collect())
    docs = load_table(spark, SF, "documents")
    want = sorted(
        r["doc_id"]
        for r in pipeline_exact_dedup(pipeline_gate(docs)).select("doc_id").collect()
    )
    assert got == want and len(got) > 0


@pytest.mark.slow
def test_dirty_feed_counts_violations(spark, tmp_path):
    """A feed with injected defects: the folded report counts them exactly
    and flags the failing checks."""
    import pyarrow as pa

    src_dir, work_dir = str(tmp_path / "src"), str(tmp_path / "work")
    os.makedirs(src_dir)
    clean = pq.read_table(os.path.join(SF, "documents.parquet")).sort_by("doc_id")
    head = clean.slice(0, 50)
    dirty = pa.table(
        {
            "doc_id": pa.array([900001, 900002, None], pa.int64()),
            "text": pa.array(["ok text here", None, "fine"], pa.string()),
            "lang": pa.array(["xx", "en", "en"], pa.string()),
            "source": pa.array(["src1", "BAD", "src2"], pa.string()),
            "n_chars": pa.array([12, 0, 999], pa.int64()),  # 999 != len("fine")
        }
    )
    now = time.time()
    pq.write_table(head, os.path.join(src_dir, "000.parquet"))
    os.utime(os.path.join(src_dir, "000.parquet"), (now - 100, now - 100))
    pq.write_table(dirty, os.path.join(src_dir, "001.parquet"))
    os.utime(os.path.join(src_dir, "001.parquet"), (now - 99, now - 99))

    q = run_llm_corpus_stream(spark, src_dir, work_dir)
    q.awaitTermination(timeout=300)
    rep = {
        (r["check_name"], r["target"]): r
        for r in corpus_dq_report(spark, work_dir).collect()
    }
    assert rep[("not_null", "doc_id")]["violations"] == 1
    assert rep[("not_null", "text")]["violations"] == 1
    assert rep[("in_set", "lang")]["violations"] == 1  # 'xx'
    assert rep[("matches", "source")]["violations"] == 1  # 'BAD'
    # NULL text violates nonempty_text too (NULL predicate = violation)
    assert rep[("nonempty_text", "text")]["violations"] == 1
    assert rep[("chars_match_text", "n_chars")]["violations"] >= 2  # NULL + 999
    assert not rep[("not_null", "doc_id")]["passed"]
    assert all(r["n_rows"] == 53 for r in rep.values())


def test_empty_store_is_empty_report(spark, tmp_path):
    out = corpus_dq_report(spark, str(tmp_path / "nowhere"))
    assert out.count() == 0
    assert out.columns == ["check_name", "target", "n_rows", "violations", "passed"]


def test_ams_store_fold_equals_whole_feed(spark, drained):
    """Streamed per-trigger AMS counters fold (linear state) into exactly
    the one-pass counters over the whole gated pre-dedup feed — so the
    served F2 estimate IS the batch answer."""
    from pyspark.sql import functions as F

    from streamds_spark.operators.ams import ams_counters, ams_f2_estimate
    from streamds_spark.streaming.llm_pipeline import AMS_K, dup_skew_estimate

    src_dir, work_dir = drained
    got = _rows(dup_skew_estimate(spark, work_dir))
    whole = pipeline_gate(spark.read.parquet(src_dir)).withColumn(
        "_h", F.md5(F.col("text").cast("binary"))
    )
    want = _rows(ams_f2_estimate(ams_counters(whole.select("_h"), "_h", k=AMS_K)))
    assert got == want and len(got) == 1
    assert got[0][0] == AMS_K and got[0][2] > 0


def test_ams_store_survives_compaction(spark, drained):
    from streamds_spark.streaming.llm_pipeline import dup_skew_estimate

    _, work_dir = drained
    before = _rows(dup_skew_estimate(spark, work_dir))
    compact_stores(spark, work_dir, merge_corpus=False)
    assert before == _rows(dup_skew_estimate(spark, work_dir))


def test_ams_empty_store(spark, tmp_path):
    from streamds_spark.streaming.llm_pipeline import dup_skew_estimate

    out = dup_skew_estimate(spark, str(tmp_path / "nowhere"))
    assert out.count() == 0
    assert out.columns == ["n_counters", "sum_c_sq", "f2_estimate"]
