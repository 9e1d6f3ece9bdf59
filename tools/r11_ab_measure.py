"""One measurement pass for tools/r11_ab.py: time named registry queries
min-of-K inside one warm session against an arbitrary repo checkout.

Usage: python tools/r11_ab_measure.py <repo_path> <sf_dir> <runs> <name> [name...]
Prints ONE JSON line {name: min_sec, ..., "_total": sum_of_mins}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    repo = os.path.abspath(sys.argv[1])
    sf_dir = sys.argv[2]
    runs = int(sys.argv[3])
    names = sys.argv[4:]
    sys.path.insert(0, repo)

    from streamds_spark.registry import load_all
    from streamds_spark.session import get_spark

    spark = get_spark("r11-ab")
    specs = load_all()
    spark.range(1).count()
    specs["distinct_values"].fn(spark, sf_dir).count()
    specs["topk_parts"].fn(spark, sf_dir).count()

    out: dict[str, float] = {}
    for name in names:
        spec = specs[name]
        spec.fn(spark, sf_dir).count()  # warm (JIT/codegen)
        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            spec.fn(spark, sf_dir).count()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
    out["_total"] = round(sum(v for k, v in out.items() if not k.startswith("_")), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
