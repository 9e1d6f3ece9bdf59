"""Streaming funnel (applyInPandasWithState state machine): after draining
the events table in time order — including across a checkpointed restart with
late-added files — the finalize report equals the batch funnel_conversion
query row-for-row."""

from __future__ import annotations

import os
import time

import pyarrow.parquet as pq

from streamds_spark.registry import load_all
from streamds_spark.streaming.funnel import funnel_state_report, run_funnel_stream

SF = "/root/testdata/sf0.001"


def _split_events(src_dir: str, n_files: int, upto: int | None = None) -> None:
    tbl = pq.read_table(os.path.join(SF, "events.parquet")).sort_by(
        [("ts", "ascending"), ("event_id", "ascending")]
    )
    n = tbl.num_rows
    os.makedirs(src_dir, exist_ok=True)
    now = time.time()
    hi = upto if upto is not None else n_files
    for i in range(hi):
        part = tbl.slice(i * n // n_files, (i + 1) * n // n_files - i * n // n_files)
        path = os.path.join(src_dir, f"{i:03d}.parquet")
        pq.write_table(part, path)
        os.utime(path, (now - 100 + i, now - 100 + i))


def test_stream_funnel_equals_batch_across_restart(spark, tmp_path):
    src, work = str(tmp_path / "src"), str(tmp_path / "work")

    # phase 1: only the first 2 of 3 time-ordered files exist
    _split_events(src, n_files=3, upto=2)
    q = run_funnel_stream(spark, src, work)
    q.awaitTermination(timeout=300)
    assert not q.isActive
    partial = funnel_state_report(spark, work).first()
    assert partial["n_users"] > 0

    # phase 2: the rest of the stream arrives; the restarted query resumes
    # from the checkpointed state machine
    _split_events(src, n_files=3)
    q2 = run_funnel_stream(spark, src, work)
    q2.awaitTermination(timeout=300)
    assert not q2.isActive

    got = funnel_state_report(spark, work).first()
    want = load_all()["funnel_conversion"].fn(spark, SF).first()
    assert got.asDict() == want.asDict()
    # the funnel only ever advances across the restart
    for c in ("n_viewed", "n_clicked", "n_purchased"):
        assert got[c] >= partial[c]


def test_empty_work_dir_report(spark, tmp_path):
    rep = funnel_state_report(spark, str(tmp_path / "nothing"))
    assert rep.count() == 0
