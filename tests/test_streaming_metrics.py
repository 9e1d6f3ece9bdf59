"""Streaming observability: ProgressCapture listener + throughput_report
(the reference's operational metrics surface — per-query latency/count
reporting, core_process.go GREP RET latency prints — on Spark's
StreamingQueryProgress)."""

from __future__ import annotations

import json
import os
from collections import Counter

from streamds_spark.operators.rainstorm import RainStormJob
from streamds_spark.streaming.engine import run_rainstorm_stream
from streamds_spark.streaming.metrics import attach, throughput_report

WORDS = ["alpha", "beta", "gamma", "delta"]


def _write_chunks(d: str, n_chunks: int = 6, lines_per_chunk: int = 50) -> Counter:
    os.makedirs(d, exist_ok=True)
    golden: Counter = Counter()
    for c in range(n_chunks):
        lines = []
        for i in range(lines_per_chunk):
            w = WORDS[(c + i) % len(WORDS)]
            lines.append(f"{w} {WORDS[(i * 7 + c) % len(WORDS)]}")
            golden[w] += 1
            golden[WORDS[(i * 7 + c) % len(WORDS)]] += 1
        with open(os.path.join(d, f"chunk_{c:03d}.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
    return golden


def test_listener_captures_batches_and_report(spark, tmp_path):
    src = str(tmp_path / "in")
    golden = _write_chunks(src)
    jsonl = str(tmp_path / "progress.jsonl")
    cap = attach(spark, jsonl_path=jsonl)
    try:
        job = RainStormJob("split_operator", "", "count_operator", "", src)
        q = run_rainstorm_stream(
            spark,
            job,
            checkpoint_dir=str(tmp_path / "ckpt"),
            dest_dir=str(tmp_path / "out"),
            output_mode="complete",
            available_now=True,
            max_files_per_trigger=2,
        )
        qid = q.id
        q.awaitTermination(120)
        # listener events are delivered asynchronously after termination
        deadline = 30
        import time

        n_lines = 6 * 50  # numInputRows counts source LINES, not words
        events = []
        for _ in range(deadline * 10):
            events = cap.progress(str(qid))
            if sum(e.get("numInputRows", 0) for e in events) >= n_lines \
                    and str(qid) in cap.terminated:
                break
            time.sleep(0.1)
        assert events, "no progress events captured"
        # 6 files at 2/trigger -> >=3 data batches; every event is plain data
        data_batches = [e for e in events if e.get("numInputRows", 0) > 0]
        assert len(data_batches) >= 3
        assert sum(e["numInputRows"] for e in data_batches) == n_lines
        for e in data_batches:
            assert e["id"] == str(qid)
            assert "durationMs" in e and "triggerExecution" in e["durationMs"]
        # the stateful count reports its state-store size
        rep = throughput_report(events)
        assert rep["n_batches"] == len(data_batches) or rep["n_batches"] >= 3
        assert rep["total_input_rows"] == n_lines
        assert rep["rows_per_sec"] > 0
        assert rep["batch_ms_max"] >= rep["batch_ms_mean"] > 0
        assert rep["state_rows_total"] == len(golden)  # one state row per word
        # flight recorder: one JSON line per event, parseable, same ids
        with open(jsonl) as f:
            lines = [json.loads(ln) for ln in f if ln.strip()]
        assert [ln["batchId"] for ln in lines if ln["id"] == str(qid)] == [
            e["batchId"] for e in events
        ]
        # clean termination recorded without exception
        assert cap.terminated.get(str(qid)) is None
    finally:
        spark.streams.removeListener(cap)


def test_report_empty_and_bounded_history(spark):
    assert throughput_report([]) == {"n_batches": 0}
    from streamds_spark.streaming.metrics import ProgressCapture

    cap = ProgressCapture(keep=5)
    for i in range(20):
        cap._by_query["q"].append({"numInputRows": 1, "durationMs": {"triggerExecution": 10}, "batchId": i})
    assert len(cap.progress("q")) == 5  # deque bounds driver memory
    assert cap.progress("q")[0]["batchId"] == 15
