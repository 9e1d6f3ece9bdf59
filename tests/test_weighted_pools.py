"""Weighted FAIR pools: a session built with session.write_allocation_file
gives named pools weighted executor-slot shares, so a heavy tenant cannot
starve a privileged light one beyond its configured ratio.

Scheduler pools are fixed at SparkContext init, so each scenario runs in its
own subprocess JVM (8 cores): a 'bronze' tenant saturates the session with
0.25 s tasks while a 'gold' tenant runs the same shape concurrently; the
parent samples per-pool ACTIVE TASK counts via the status tracker during the
overlap window. Slot shares are what the scheduler actually controls, so the
assertion is on shares (weighted run: gold≫bronze; unweighted run: roughly
equal), not on wall-clock latencies, which host noise owns."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import pytest

_SCRIPT = r"""
import json, sys, threading, time

alloc = sys.argv[1] if sys.argv[1] != "none" else None
from streamds_spark.session import get_spark, scheduler_pool, write_allocation_file
import pytest

if alloc:
    write_allocation_file(alloc, {"gold": (8, 0), "bronze": (1, 0)})
spark = get_spark(allocation_file=alloc)
sc = spark.sparkContext
sc.setLogLevel("ERROR")

weights = {}
for name in ("gold", "bronze"):
    opt = sc._jsc.sc().getPoolForName(name)
    weights[name] = opt.get().weight() if opt.isDefined() else None

def tenant(pool, group, n_tasks):
    sc.setJobGroup(group, pool)
    with scheduler_pool(spark, pool):
        try:
            sc.parallelize(range(n_tasks), n_tasks).map(
                lambda i: __import__("time").sleep(0.25)
            ).count()
        except Exception:
            pass  # bronze gets cancelled once sampling is done

threads = [
    threading.Thread(target=tenant, args=("bronze", "g-bronze", 2000)),
    threading.Thread(target=tenant, args=("gold", "g-gold", 2000)),
]
for t in threads:
    t.start()

tracker = sc.statusTracker()

def active(group):
    total = 0
    for jid in tracker.getJobIdsForGroup(group) or []:
        info = tracker.getJobInfo(jid)
        if info is None:
            continue
        for sid in info.stageIds:
            st = tracker.getStageInfo(sid)
            if st is not None:
                total += st.numActiveTasks
    return total

samples = []
deadline = time.time() + 30
while time.time() < deadline and len(samples) < 60:
    g, b = active("g-gold"), active("g-bronze")
    if g + b >= 6:  # both pools contending for the 8 slots
        samples.append((g, b))
    time.sleep(0.25)

sc.cancelJobGroup("g-gold")
sc.cancelJobGroup("g-bronze")
for t in threads:
    t.join(timeout=60)

n = max(1, len(samples))
print("RESULT " + json.dumps({
    "weights": weights,
    "n_samples": len(samples),
    "gold_avg": sum(s[0] for s in samples) / n,
    "bronze_avg": sum(s[1] for s in samples) / n,
}))
spark.stop()
"""


def _run_scenario(tmp_path, weighted: bool) -> dict:
    alloc = str(tmp_path / "pools.xml") if weighted else "none"
    env = dict(os.environ, PYTHONPATH="/root/repo", SPARK_GRAFT_CPUS="8")
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT, alloc],
        capture_output=True,
        text=True,
        env=env,
        timeout=300,
        cwd="/root/repo",
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT ") :])
    raise AssertionError(f"no RESULT line:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


@pytest.mark.slow
def test_weighted_pools_bound_heavy_tenant(tmp_path):
    r = _run_scenario(tmp_path, weighted=True)
    # the allocation file materialized the pools with their weights at init
    assert r["weights"] == {"gold": 8, "bronze": 1}
    assert r["n_samples"] >= 5, r
    # weight 8 vs 1 entitles gold to ~8/9 of the slots while contended; host
    # scheduling jitter eats some of that, so assert a conservative >=2x
    assert r["gold_avg"] >= 2.0 * r["bronze_avg"], r


@pytest.mark.slow
def test_unweighted_pools_share_equally(tmp_path):
    r = _run_scenario(tmp_path, weighted=False)
    # on-demand pools at default weight 1 (nothing preconfigured)
    assert r["weights"] == {"gold": None, "bronze": None}
    assert r["n_samples"] >= 5, r
    # fair halves, wide noise margin — and specifically NOT the 2x+ skew the
    # weighted run must show
    ratio = r["gold_avg"] / max(r["bronze_avg"], 0.01)
    assert 1 / 3 <= ratio <= 3, r


@pytest.mark.slow
def test_cli_serve_with_weighted_pools():
    """`serve --pools gold=8,bronze=1` builds the session with the allocation
    file and serves requests routed to a named weighted pool."""
    SF = "/root/testdata/sf0.001"
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "streamds_spark.cli", "serve", SF,
            "--port", "0", "--pools", "gold=8,bronze=1", "--timeout-s", "300",
        ],
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        cwd="/root/repo",
        text=True,
    )
    try:
        from streamds_spark.server import request

        line = proc.stdout.readline().strip()
        assert line.startswith("serving:127.0.0.1:")
        port = int(line.rsplit(":", 1)[1])
        resp = request("127.0.0.1", port, {"sql": "SELECT 1 AS a", "pool": "gold"})
        assert resp["ok"] and resp["rows"] == [[1]]
        bad = request("127.0.0.1", port, {"sql": "SELECT 1 AS a", "pool": ""})
        assert not bad["ok"] and "pool" in bad["error"]
        proc.stdin.close()
        assert proc.wait(timeout=120) == 0
    finally:
        if proc.poll() is None:
            proc.kill()
