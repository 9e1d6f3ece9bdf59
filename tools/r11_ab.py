"""Interleaved A/B timing: HEAD (this repo) vs a pinned baseline worktree.

For each of N rounds, run [baseline pass] then [head pass], each a fresh
subprocess (own JVM) executing tools/r11_ab_measure.py. Interleaving makes
host-load episodes hit both sides instead of biasing one; per-side min over
rounds is the steady-state comparator (the bench's own lowest-total logic).

Usage: python tools/r11_ab.py --base /tmp/r11_base [--rounds 3] [--runs 3] name [name...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def one_pass(repo: str, sf_dir: str, runs: int, names: list[str]) -> dict:
    measure = os.path.join(REPO, "tools", "r11_ab_measure.py")
    res = subprocess.run(
        [sys.executable, measure, repo, sf_dir, str(runs), *names],
        capture_output=True, text=True, check=True,
    )
    return json.loads(res.stdout.strip().splitlines()[-1])


def load1() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", required=True)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    base_mins: dict[str, float] = {}
    head_mins: dict[str, float] = {}
    for r in range(args.rounds):
        for tag, repo, mins in (
            ("base", args.base, base_mins),
            ("head", REPO, head_mins),
        ):
            res = one_pass(repo, args.sf_dir, args.runs, args.names + [])
            for k, v in res.items():
                mins[k] = min(mins.get(k, float("inf")), v)
            print(f"round {r} {tag} load1={load1():.2f} total={res['_total']}", flush=True)
    print(f"\n{'query':40s} {'base':>8s} {'head':>8s} {'ratio':>7s}")
    for k in args.names + ["_total"]:
        b, h = base_mins[k], head_mins[k]
        print(f"{k:40s} {b:8.3f} {h:8.3f} {h / b if b else 0:7.2f}")


if __name__ == "__main__":
    main()
