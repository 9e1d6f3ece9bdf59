"""Interleaved A/B re-measure of the three bench extras that drifted r4→r5.

Round-5 verdict: `dedup_incremental_docs10x` (+43%), `bloom_decontaminate`
(+30%) and `substring_dedup_hashed_docs10x` (+17%) regressed between rounds
with NO commits touching those paths — consistent with the proven host-
variance band, but it needs settling with an interleaved A/B against the
pinned round-4 code so code-drift and host-drift can't be confused.

Protocol (the bench.py idle-gate discipline, applied pairwise):
  for each of N rounds: [idle-gate → run r4 pin] then [idle-gate → run HEAD]
Each run is a fresh subprocess (own JVM) executing drift_ab_measure.py,
which reports min-of-3 per extra inside one warm session. Interleaving means
any host-load episode hits both sides equally instead of biasing one.

Reports per extra: per-side min-over-rounds, per-side spread (max/min of the
round minimums), and the HEAD/r4 ratio. Verdict rule: ratio within the
same-session spread band ⇒ host variance, not code drift.

Usage: python tools/drift_ab.py [--rounds 3] [--pin 300d22f]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXTRAS = [
    "dedup_incremental_docs10x",
    "substring_dedup_hashed_docs10x",
    "bloom_decontaminate",
]
IDLE_LOAD_GATE = 4.0
IDLE_MAX_WAIT_S = 120.0


def _load1() -> float:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except (OSError, ValueError, IndexError):
        return -1.0


def _wait_for_idle() -> float:
    waited = 0.0
    while _load1() >= IDLE_LOAD_GATE and waited < IDLE_MAX_WAIT_S:
        time.sleep(5.0)
        waited += 5.0
    return _load1()


def _run_side(repo_path: str, sf_dir: str) -> dict:
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "drift_ab_measure.py"),
            repo_path,
            sf_dir,
        ],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("DRIFT_AB_RESULT "):
            return json.loads(line[len("DRIFT_AB_RESULT ") :])
    raise RuntimeError(
        f"measure run failed rc={proc.returncode}\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--pin", default="300d22f")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    pin_dir = tempfile.mkdtemp(prefix="drift_ab_r4_")
    subprocess.run(
        ["git", "-C", REPO, "worktree", "add", "--detach", pin_dir, args.pin],
        check=True,
        capture_output=True,
    )
    results: dict[str, dict[str, list[float]]] = {
        e: {"r4": [], "head": []} for e in EXTRAS
    }
    loads: list[float] = []
    try:
        for rnd in range(args.rounds):
            for side, path in (("r4", pin_dir), ("head", REPO)):
                loads.append(_wait_for_idle())
                res = _run_side(path, args.sf_dir)
                for e in EXTRAS:
                    results[e][side].append(res[e])
                print(
                    f"# round {rnd + 1} {side}: "
                    + " ".join(f"{e}={res[e]}" for e in EXTRAS),
                    file=sys.stderr,
                )
    finally:
        subprocess.run(
            ["git", "-C", REPO, "worktree", "remove", "--force", pin_dir],
            capture_output=True,
        )

    summary = {}
    for e in EXTRAS:
        r4_min, head_min = min(results[e]["r4"]), min(results[e]["head"])
        summary[e] = {
            "r4_runs": results[e]["r4"],
            "head_runs": results[e]["head"],
            "r4_min": r4_min,
            "head_min": head_min,
            "head_over_r4": round(head_min / r4_min, 3),
            "r4_spread": round(max(results[e]["r4"]) / r4_min, 3),
            "head_spread": round(max(results[e]["head"]) / head_min, 3),
        }
    print(json.dumps({"pin": args.pin, "loads_at_start": loads, "extras": summary}, indent=2))


if __name__ == "__main__":
    main()
