"""Interactive query server: one shared SparkSession serving concurrent
clients over a line-delimited-JSON TCP protocol.

Reference parity: StreamDS is an *interactive, multi-tenant* system — the
leader accepts client connections and serves concurrent grep / RainStorm
sessions against the shared cluster (`distributed_log_querier/core_process/
core_process.go:259-349` GREP request/response over TCP; session dispatch
`core_process.go:455-478`). This module is that operational surface on
Spark: a ThreadingTCPServer in front of ONE SparkSession, each connection
running its requests under its own FAIR scheduler pool
(`session.scheduler_pool`), so tenants share executor slots fairly instead
of convoying FIFO behind each other.

Protocol (one JSON object per line, response is one JSON line):
  {"cmd": "list"}                      -> {"ok": true, "queries": [...]}
  {"cmd": "ping"}                      -> {"ok": true, "pong": true}
  {"query": "<name>", "sf_dir": "...", "limit": N}
      -> {"ok": true, "query": ..., "columns": [...], "rows": [[...], ...],
          "n_rows": N, "truncated": bool}
  {"query": "<name>", "explain": true} -> plan text + exchange/window facts
  {"query": "<name>", "lineage": true} -> per-output-column source columns
  {"sql": "SELECT ...", "limit": N}    -> read-only SQL over the table views
                                          (SELECT/WITH/VALUES only)
  {"cmd": "ann", "index": dir, "vector": [...], "k": N,
   "kind": "lsh"|"ivf", "flip_bits"/"n_probe": M}
      -> {"ok": true, "neighbors": [{vec_id, label, cos_sim}, ...]}
         (reads ONLY the probe's index partitions)
  {"cmd": "status"}                    -> uptime + per-kind served/error
                                          counters
  anything else / failures             -> {"ok": false, "error": "..."}

Scale discipline: the server NEVER collects an unbounded result — it
collects `limit + 1` rows (default 100, hard cap 10_000) and reports
`truncated` instead; a client that wants a full export should run the
query to a sink, not through a socket. Cell values are JSON-coerced with
`default=str` so dates/decimals/binary survive transport.
"""

from __future__ import annotations

import json
import socket
import socketserver
import threading
import time as _time
from typing import Any

from streamds_spark.registry import load_all
from streamds_spark.session import scheduler_pool

DEFAULT_LIMIT = 100
MAX_LIMIT = 10_000
MAX_REQUEST_BYTES = 64 * 1024  # a request is one small JSON line, not data


def _json_cell(v: Any) -> Any:
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return v


def _run_request(spark, default_sf_dir: str, req: dict, pool: str) -> dict:
    if req.get("cmd") == "ping":
        return {"ok": True, "pong": True}
    if req.get("cmd") == "list":
        return {"ok": True, "queries": sorted(load_all())}
    if isinstance(req.get("sql"), str):
        # raw read-only SQL over the TESTDATA views — the reference shell's
        # SQL dialect served multi-tenant. Guard: SELECT/WITH only; Spark
        # temp views are session-global, so registration is idempotent and
        # shared (all tenants read the same sf_dir snapshot).
        sql = req["sql"].strip()
        head = sql.lstrip("( \n\t").split(None, 1)
        if not head or head[0].upper() not in ("SELECT", "WITH", "VALUES"):
            return {
                "ok": False,
                "error": "only SELECT/WITH/VALUES statements are served",
            }
        limit = req.get("limit", DEFAULT_LIMIT)
        if not isinstance(limit, int) or not (1 <= limit <= MAX_LIMIT):
            return {"ok": False, "error": f"limit must be an int in [1, {MAX_LIMIT}]"}
        from streamds_spark.catalog import register_views

        sf_dir = req.get("sf_dir", default_sf_dir)
        with scheduler_pool(spark, pool):
            register_views(spark, sf_dir)
            df = spark.sql(sql)
            rows = df.limit(limit + 1).collect()
        truncated = len(rows) > limit
        rows = rows[:limit]
        return {
            "ok": True,
            "columns": df.columns,
            "rows": [[_json_cell(v) for v in r] for r in rows],
            "n_rows": len(rows),
            "truncated": truncated,
        }
    if req.get("cmd") == "ann":
        # vector-search endpoint over a persisted index: kind 'lsh' (default,
        # hyperplane-bucket partitions) or 'ivf' (coarse-quantizer lists) —
        # both read ONLY the probe's partitions (static pruning), k rows back
        vec = req.get("vector")
        index = req.get("index")
        k = req.get("k", 10)
        kind = req.get("kind", "lsh")
        if not isinstance(index, str):
            return {"ok": False, "error": "ann needs 'index' (index dir path)"}
        if not (
            isinstance(vec, list)
            and vec
            and all(isinstance(x, (int, float)) for x in vec)
        ):
            return {"ok": False, "error": "ann needs 'vector' (list of numbers)"}
        if not isinstance(k, int) or not (1 <= k <= 1000):
            return {"ok": False, "error": "k must be an int in [1, 1000]"}
        qvec = [float(x) for x in vec]
        if kind == "lsh":
            from streamds_spark.operators.ann import ann_probe_topk, load_index_meta

            flip = req.get("flip_bits", 0)
            try:
                meta = load_index_meta(index)
            except OSError as e:
                return {"ok": False, "error": f"no index meta at {index!r}: {e}"}
            if len(qvec) != meta["dim"]:
                return {
                    "ok": False,
                    "error": f"vector dim {len(qvec)} != index dim {meta['dim']}",
                }
            probe = lambda: ann_probe_topk(  # noqa: E731
                spark, index, qvec, k=k,
                n_planes=meta["n_planes"], n_flip_bits=flip,
            )
        elif kind == "ivf":
            from streamds_spark.operators.ivf import ivf_probe_topk, load_centroids

            n_probe = req.get("n_probe", 2)
            if not isinstance(n_probe, int) or not (1 <= n_probe <= 64):
                return {"ok": False, "error": "n_probe must be an int in [1, 64]"}
            try:
                dim = len(load_centroids(index)[0])
            except OSError as e:
                return {"ok": False, "error": f"no centroids at {index!r}: {e}"}
            if len(qvec) != dim:
                return {
                    "ok": False,
                    "error": f"vector dim {len(qvec)} != index dim {dim}",
                }
            probe = lambda: ivf_probe_topk(  # noqa: E731
                spark, index, qvec, k=k, n_probe=n_probe
            )
        else:
            return {"ok": False, "error": f"unknown ann kind {kind!r}"}
        with scheduler_pool(spark, pool):
            rows = probe().collect()
        return {
            "ok": True,
            "kind": kind,
            "neighbors": [
                {"vec_id": r["vec_id"], "label": r["label"], "cos_sim": r["cos_sim"]}
                for r in rows
            ],
        }
    name = req.get("query")
    if not isinstance(name, str):
        return {"ok": False, "error": "request needs 'query' or 'cmd'"}
    specs = load_all()
    if name not in specs:
        return {"ok": False, "error": f"unknown query {name!r}"}
    sf_dir = req.get("sf_dir", default_sf_dir)
    if req.get("lineage"):
        # impact analysis: which source columns feed each output column
        from streamds_spark.plans.lineage import column_lineage

        lin = column_lineage(specs[name].fn(spark, sf_dir))
        return {
            "ok": True,
            "query": name,
            "lineage": {c: sorted([t, col] for t, col in s) for c, s in lin.items()},
        }
    if req.get("explain"):
        # price the query before running it: plan text + the census facts
        # (exchanges, global windows) a tenant checks before a big submit
        from streamds_spark.plans.audit import formatted_plan, plan_facts

        df = specs[name].fn(spark, sf_dir)
        facts = plan_facts(df)
        return {
            "ok": True,
            "query": name,
            "plan": formatted_plan(df),
            "n_exchanges": facts.n_exchanges,
            "n_global_windows": facts.n_global_windows,
        }
    limit = req.get("limit", DEFAULT_LIMIT)
    if not isinstance(limit, int) or not (1 <= limit <= MAX_LIMIT):
        return {"ok": False, "error": f"limit must be an int in [1, {MAX_LIMIT}]"}
    # per-connection FAIR pool: concurrent tenants each get a fair share of
    # the executor slots (thread-scoped local property, see session.py)
    with scheduler_pool(spark, pool):
        df = specs[name].fn(spark, sf_dir)
        rows = df.limit(limit + 1).collect()
    truncated = len(rows) > limit
    rows = rows[:limit]
    return {
        "ok": True,
        "query": name,
        "columns": df.columns,
        "rows": [[_json_cell(v) for v in r] for r in rows],
        "n_rows": len(rows),
        "truncated": truncated,
    }


def _req_kind(req: dict) -> str:
    if not isinstance(req, dict):
        return "invalid"
    if isinstance(req.get("cmd"), str):
        return req["cmd"]
    if isinstance(req.get("sql"), str):
        return "sql"
    if req.get("lineage"):
        return "lineage"
    if req.get("explain"):
        return "explain"
    if isinstance(req.get("query"), str):
        return "query"
    return "invalid"


class _Handler(socketserver.StreamRequestHandler):
    def handle(self) -> None:  # one connection = one tenant session
        server: QueryServer = self.server  # type: ignore[assignment]
        pool = f"client-{self.client_address[0]}-{self.client_address[1]}"
        while True:
            line = self.rfile.readline(MAX_REQUEST_BYTES)
            if not line:
                return
            line = line.strip()
            if not line:
                continue
            kind = "invalid"
            try:
                req = json.loads(line)
                kind = _req_kind(req)
                if kind == "status":
                    # operational heartbeat: uptime + per-kind served/error
                    # counters (the reference leader prints per-query
                    # latency/counts to console; this is that signal as a
                    # queryable endpoint)
                    resp = {"ok": True, "status": server.status()}
                else:
                    resp = _run_request(server.spark, server.sf_dir, req, pool)
            except Exception as e:  # noqa: BLE001 — protocol boundary
                resp = {"ok": False, "error": f"{type(e).__name__}: {e}"}
            server.note(kind, bool(resp.get("ok")))
            try:
                self.wfile.write(
                    (json.dumps(resp, default=str) + "\n").encode("utf-8")
                )
                self.wfile.flush()
            except (BrokenPipeError, ConnectionResetError):
                return


class QueryServer(socketserver.ThreadingTCPServer):
    """Localhost-by-default threading server over a shared SparkSession."""

    daemon_threads = True
    allow_reuse_address = True

    def __init__(self, spark, sf_dir: str, host: str = "127.0.0.1", port: int = 0):
        self.spark = spark
        self.sf_dir = sf_dir
        self._t0 = _time.time()
        self._stats_lock = threading.Lock()
        self._served: dict[str, int] = {}
        self._errors = 0
        super().__init__((host, port), _Handler)

    def note(self, kind: str, ok: bool) -> None:
        with self._stats_lock:
            self._served[kind] = self._served.get(kind, 0) + 1
            if not ok:
                self._errors += 1

    def status(self) -> dict:
        with self._stats_lock:
            return {
                "uptime_s": round(_time.time() - self._t0, 1),
                "served": dict(sorted(self._served.items())),
                "errors": self._errors,
            }


def start_server(
    spark, sf_dir: str, host: str = "127.0.0.1", port: int = 0
) -> QueryServer:
    """Bind + serve in a daemon thread; returns the server (read the bound
    port from `server.server_address`, stop with `server.shutdown()`)."""
    server = QueryServer(spark, sf_dir, host=host, port=port)
    t = threading.Thread(target=server.serve_forever, daemon=True, name="streamds-serve")
    t.start()
    return server


def request(host: str, port: int, req: dict, timeout: float = 120.0) -> dict:
    """One-shot client helper (used by the CLI and tests)."""
    with socket.create_connection((host, port), timeout=timeout) as s:
        s.sendall((json.dumps(req) + "\n").encode("utf-8"))
        buf = b""
        while not buf.endswith(b"\n"):
            chunk = s.recv(65536)
            if not chunk:
                break
            buf += chunk
    return json.loads(buf.decode("utf-8"))
