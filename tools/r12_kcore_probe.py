"""Round-12 profiling probe for core_decomposition (VERDICT r11 item 4):
per-round changed counts + modes + wall clock of the H-index fixpoint at
sf0.1, so the batching decision rests on the measured round shape (how many
tail rounds are tiny-frontier/latency-bound vs data-bound).

Usage: python tools/r12_kcore_probe.py [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamds_spark.catalog import load_table
from streamds_spark.session import get_spark


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("kcore-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    from streamds_spark.operators.kcore import _core_numbers_with_rounds
    from streamds_spark.queries.graph import copurchase_edges

    li = load_table(spark, sf_dir, "lineitem")
    best = None
    for _ in range(runs):
        stats: dict = {}
        t0 = time.time()
        df, rounds = _core_numbers_with_rounds(
            copurchase_edges(li), stats=stats
        )
        n = df.count()
        wall = round(time.time() - t0, 2)
        if best is None or wall < best["wall_s"]:
            best = {
                "wall_s": wall,
                "rounds": rounds,
                "n_nodes": n,
                "changed": stats["changed"],
                "mode": stats["mode"],
            }
    print(json.dumps(best))


if __name__ == "__main__":
    main()
