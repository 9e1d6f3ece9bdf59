"""Streaming observability: per-batch progress capture + a throughput report.

Reference parity: StreamDS reports its processing metrics operationally —
the grep path prints per-machine match counts AND query latency to the
console (`distributed_log_querier/core_process/core_process.go:259-349`,
latency print in the GREP RET branch), and the RainStorm reports measure
tuples/s during runs (`Reports/MP4_Report.pdf`). Spark already measures all
of this per micro-batch (StreamingQueryProgress); what was missing is the
operational surface that captures, persists, and summarizes it.

`ProgressCapture` is a `StreamingQueryListener` that keeps a bounded
in-memory history per query (deque — a week-long run cannot grow the
driver) and optionally appends each progress event as one JSON line to a
local file (the ops-facing flight recorder; one small append per trigger,
no Spark job). `throughput_report` folds a query's history into the
rates/durations/state-size summary a dashboard would alert on.
"""

from __future__ import annotations

import json
import threading
from collections import defaultdict, deque

from pyspark.sql.streaming.listener import StreamingQueryListener

DEFAULT_KEEP = 1000  # progress events retained per query


class ProgressCapture(StreamingQueryListener):
    """Capture per-batch progress for every query on the session.

    Thread-safety: Spark delivers listener events on its listener-bus thread
    while tests/operators read from their own — one lock guards the dict of
    deques. Event payloads are parsed from `progress.json` (the stable
    public schema) rather than object attributes, so the captured dicts are
    plain JSON-serializable data.
    """

    def __init__(self, keep: int = DEFAULT_KEEP, jsonl_path: str | None = None):
        self._lock = threading.Lock()
        self._keep = keep
        self._jsonl_path = jsonl_path
        self._by_query: dict[str, deque] = defaultdict(lambda: deque(maxlen=keep))
        self.terminated: dict[str, str | None] = {}

    # -- listener callbacks -------------------------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        with self._lock:
            self._by_query[p["id"]].append(p)
        if self._jsonl_path:
            with self._lock, open(self._jsonl_path, "a") as f:
                f.write(json.dumps(p) + "\n")

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        with self._lock:
            self.terminated[str(event.id)] = event.exception

    # -- read side ----------------------------------------------------------
    def progress(self, query_id: str) -> list[dict]:
        with self._lock:
            return list(self._by_query.get(query_id, ()))

    def query_ids(self) -> list[str]:
        """Ids of every query that has reported at least one progress event
        (the server's pipeline_status enumerates these)."""
        with self._lock:
            return list(self._by_query)


def attach(spark, keep: int = DEFAULT_KEEP, jsonl_path: str | None = None) -> ProgressCapture:
    """Register a ProgressCapture on the session; returns it (detach with
    `spark.streams.removeListener(capture)`)."""
    cap = ProgressCapture(keep=keep, jsonl_path=jsonl_path)
    spark.streams.addListener(cap)
    return cap


def throughput_report(events: list[dict]) -> dict:
    """Fold progress events into the summary a dashboard alerts on:
    total rows, mean/max batch duration, input/processed rows-per-second
    over the whole window, and the latest stateful-operator state size.

    Pure driver-side arithmetic over ≤`keep` small dicts — no Spark job.
    """
    batches = [e for e in events if e.get("numInputRows") is not None]
    if not batches:
        return {"n_batches": 0}
    total_rows = sum(e["numInputRows"] for e in batches)
    durations = [e["durationMs"].get("triggerExecution", 0) for e in batches]
    wall_ms = sum(durations)
    state_rows = None
    for e in reversed(batches):
        ops = e.get("stateOperators") or []
        if ops:
            state_rows = sum(op.get("numRowsTotal", 0) for op in ops)
            break
    # late-data accounting: rows the watermark dropped, summed over the
    # window — the "did we lose events" alert every event-time pipeline needs
    late_dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for e in batches
        for op in (e.get("stateOperators") or [])
    )
    return {
        "n_batches": len(batches),
        "total_input_rows": total_rows,
        "batch_ms_mean": wall_ms / len(batches),
        "batch_ms_max": max(durations),
        "rows_per_sec": (total_rows / (wall_ms / 1000.0)) if wall_ms else float("inf"),
        "state_rows_total": state_rows,
        "late_rows_dropped": late_dropped,
    }
