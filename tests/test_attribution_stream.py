"""Streaming multi-touch attribution (applyInPandasWithState + per-trigger
credit deltas): after draining the events table in time order — including
across a checkpointed restart with late-added files — the finalize report
equals the batch attribution_multi_touch query row-for-row."""

from __future__ import annotations

import os
import time

import pyarrow.parquet as pq

from streamds_spark.registry import load_all
from streamds_spark.streaming.attribution import (
    attribution_report,
    run_attribution_stream,
)
import pytest

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


def _rows(df):
    return [
        (r["touch_type"], r["first_touch"], r["last_touch"], r["linear_micro"],
         r["n_touches"])
        for r in df.collect()
    ]


@pytest.mark.slow
def test_stream_attribution_equals_batch_across_restart(spark, tmp_path):
    src, work = str(tmp_path / "src"), str(tmp_path / "work")

    # phase 1: only the first 2 of 3 time-ordered files exist
    _split_events(src, n_files=3, upto=2)
    q = run_attribution_stream(spark, src, work)
    q.awaitTermination(timeout=300)
    assert not q.isActive
    partial = {r[0]: r for r in _rows(attribution_report(spark, work))}

    # phase 2: the rest arrives; the restarted query resumes the touch
    # state from its checkpoint
    _split_events(src, n_files=3)
    q2 = run_attribution_stream(spark, src, work)
    q2.awaitTermination(timeout=300)
    assert not q2.isActive

    got = _rows(attribution_report(spark, work))
    want = _rows(load_all()["attribution_multi_touch"].fn(spark, SF))
    assert got == want
    # credits only ever accumulate across the restart
    for row in got:
        if row[0] in partial:
            assert all(a >= b for a, b in zip(row[1:], partial[row[0]][1:]))


def test_empty_work_dir_report(spark, tmp_path):
    rep = attribution_report(spark, str(tmp_path / "nothing"))
    assert rep.count() == 0
