"""Compare BENCH_r*.json rounds: per-query deltas and the headline trend.

Usage: python tools/bench_history.py

The driver records one BENCH_r{N}.json per round; this prints a round-over-
round table so a regression in any headline query is visible immediately
(the bench methodology is cold-plan, so ±30% is machine noise — flag only
sustained drift).
"""

from __future__ import annotations

import glob
import json
import os
import sys


def load_rounds() -> list[tuple[str, dict]]:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = []
    for path in sorted(glob.glob(os.path.join(root, "BENCH_r*.json"))):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        parsed = data.get("parsed", data)  # driver wraps; bench.py emits flat
        if "queries" in parsed:
            rounds.append((os.path.basename(path), parsed))
    return rounds


def main() -> int:
    rounds = load_rounds()
    if not rounds:
        print("no BENCH_r*.json found")
        return 1
    names: list[str] = []
    for _, r in rounds:
        for q in r["queries"]:
            if q not in names:
                names.append(q)
    header = ["query"] + [name.replace("BENCH_", "").replace(".json", "") for name, _ in rounds]
    print("\t".join(header))
    for q in names:
        cells = [q]
        for _, r in rounds:
            v = r["queries"].get(q)
            cells.append(f"{v:.3f}" if v is not None else "—")
        print("\t".join(cells))
    print("\t".join(["TOTAL"] + [f"{r['value']:.3f}" for _, r in rounds]))
    for _, r in rounds:
        if "extras" in r:
            print("extras", json.dumps(r["extras"]))
    first, last = rounds[0][1]["value"], rounds[-1][1]["value"]
    print(f"trend: {first:.2f}s -> {last:.2f}s ({last / first:.2f}x)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
