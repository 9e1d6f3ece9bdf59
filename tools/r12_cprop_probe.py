"""Round-12 probe (VERDICT r11 item 5): what does constraint propagation ON
actually cost, per query, NOW (after the r11 schema memo / checkpoint cuts)?

One warm session; the conf is runtime-settable, so each named query is timed
min-of-N with the conf alternated ON/OFF per run pair — the within-session
interleaved discipline. Decides whether session.py's default can go back to
vanilla Spark's ON (scoped-off only where a measured cost remains).

Usage: python tools/r12_cprop_probe.py [--runs 3] [names...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamds_spark.registry import load_all
from streamds_spark.session import get_spark

DEFAULT_NAMES = [
    "dedup_minhash_lsh_pairs",
    "dedup_minhash_signature",
    "dedup_lsh_estimate_error",
    "lsh_recall_audit",
    "setsim_exact_pairs",
    "q5_local_supplier_volume",
    "q3_shipping_priority",
    "copurchase_link_prediction",
]


def main() -> None:
    runs = 3
    names = []
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    names = names or DEFAULT_NAMES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    specs = load_all()
    spark = get_spark("cprop-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    out: dict[str, dict[str, float]] = {}
    for name in names:
        if name not in specs:
            print(f"skip unknown {name}", file=sys.stderr)
            continue
        mins = {"off": float("inf"), "on": float("inf")}
        for _ in range(runs):
            for mode, flag in (("off", "false"), ("on", "true")):
                spark.conf.set("spark.sql.constraintPropagation.enabled", flag)
                t0 = time.time()
                specs[name].fn(spark, sf_dir).count()
                mins[mode] = min(mins[mode], time.time() - t0)
        spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
        out[name] = {
            "off": round(mins["off"], 3),
            "on": round(mins["on"], 3),
            "on_over_off": round(mins["on"] / mins["off"], 2),
        }
        print(f"{name:35s} off={mins['off']:.3f} on={mins['on']:.3f}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
