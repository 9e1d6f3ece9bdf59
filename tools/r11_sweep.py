"""Round-11 wall-clock census: time every registry query at sf0.1.

One warm session, count() per query (the bench's action), min-of-N runs,
results sorted slowest-first to JSON. This is the measure-first step (guide
§1) for the non-headline registry surface — the shuffle-bytes census
(PLANS.md) can't see map-stage cost, which on this corpus (tokenize /
regex / Python-batch stages) dominates most LLM-data queries.

Usage: python tools/r11_sweep.py [--sf-dir D] [--runs 2] [--out F] [names...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamds_spark.registry import load_all
from streamds_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default="/tmp/r11_sweep.json")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    specs = load_all()
    names = args.names or sorted(specs)
    spark = get_spark("r11-sweep")
    spark.range(1).count()

    rows: dict[str, float] = {}
    errs: dict[str, str] = {}
    for i, name in enumerate(names):
        spec = specs[name]
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        runs = []
        try:
            for _ in range(args.runs):
                t0 = time.time()
                spec.fn(spark, args.sf_dir).count()
                runs.append(time.time() - t0)
            rows[name] = round(min(runs), 3)
        except Exception as exc:  # noqa: BLE001 — census must finish
            errs[name] = f"{type(exc).__name__}: {exc}"[:200]
        if (i + 1) % 20 == 0:
            print(f"... {i + 1}/{len(names)}", file=sys.stderr)
    spark.sparkContext.setJobDescription(None)

    ranked = dict(sorted(rows.items(), key=lambda kv: -kv[1]))
    with open(args.out, "w") as f:
        json.dump({"sf_dir": args.sf_dir, "runs": args.runs,
                   "times": ranked, "errors": errs}, f, indent=1)
    for name, sec in list(ranked.items())[:40]:
        print(f"{sec:8.3f}  {name}")
    if errs:
        print("ERRORS:", errs)


if __name__ == "__main__":
    main()
