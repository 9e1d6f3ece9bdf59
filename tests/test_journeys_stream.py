"""Streaming user-journey mining (sessionization state machine +
closed-delta/open-snapshot rows): after draining the events table in time
order — including across a checkpointed restart — the finalize top-k equals
the batch top_user_journeys query row-for-row."""

from __future__ import annotations

import os
import time

import pyarrow.parquet as pq

from streamds_spark.registry import load_all
from streamds_spark.streaming.journeys import journeys_report, run_journeys_stream
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
    return [(r["journey"], r["n_sessions"]) for r in df.collect()]


@pytest.mark.slow
def test_stream_journeys_equals_batch_across_restart(spark, tmp_path):
    src, work = str(tmp_path / "src"), str(tmp_path / "work")

    _split_events(src, n_files=4, upto=2)
    q = run_journeys_stream(spark, src, work)
    q.awaitTermination(timeout=300)
    assert not q.isActive
    assert len(_rows(journeys_report(spark, work))) > 0

    _split_events(src, n_files=4)
    q2 = run_journeys_stream(spark, src, work)
    q2.awaitTermination(timeout=300)
    assert not q2.isActive

    got = _rows(journeys_report(spark, work))
    want = _rows(load_all()["top_user_journeys"].fn(spark, SF))
    assert got == want


def test_open_session_extends_instead_of_double_counting(spark, tmp_path):
    """A session spanning trigger boundaries must count ONCE with its full
    prefix: the open-snapshot row is superseded per user, never added."""
    import pandas as pd

    src, work = str(tmp_path / "src"), str(tmp_path / "work")
    os.makedirs(src)
    t0 = 1_700_000_000_000_000
    # one user, one session split across two files (gaps < 30 min), then a
    # >30-min gap opens a second session in the second file
    f1 = pd.DataFrame(
        {
            "event_id": [1, 2],
            "ts": pd.to_datetime([t0, t0 + 60_000_000], unit="us"),
            "user_id": [7, 7],
            "event_type": ["view", "click"],
            "value": [1.0, 1.0],
            "props": ["{}", "{}"],
        }
    )
    gap = 31 * 60 * 1_000_000
    f2 = pd.DataFrame(
        {
            "event_id": [3, 4],
            "ts": pd.to_datetime([t0 + 120_000_000, t0 + 120_000_000 + gap], unit="us"),
            "user_id": [7, 7],
            "event_type": ["purchase", "signup"],
            "value": [1.0, 1.0],
            "props": ["{}", "{}"],
        }
    )
    import pyarrow as pa

    now = time.time()
    for i, f in enumerate((f1, f2)):
        p = os.path.join(src, f"{i:03d}.parquet")
        t = pa.Table.from_pandas(f)
        t = t.set_column(
            t.schema.get_field_index("ts"),
            "ts",
            t["ts"].cast(pa.timestamp("us")),
        )
        pq.write_table(t, p)
        os.utime(p, (now - 10 + i, now - 10 + i))

    q = run_journeys_stream(spark, src, work)
    q.awaitTermination(timeout=300)
    assert not q.isActive
    got = dict(_rows(journeys_report(spark, work)))
    # session 1 = view>click>purchase (extended across the boundary),
    # session 2 = signup (open) — and no view>click remnant double-counted
    assert got == {"view>click>purchase": 1, "signup": 1}
