"""Round-12 ANF x10 soak: the packed register layout at 23.9M directed edges.

Runs the x10-cloned copurchase census (the soak_graph_dials graph) in a
fresh process and prints one JSON line with the wall and the census tail.
This is the measurement behind the packed layout's x10 anchors (history:
the r11 wide layout measured 168.1-225.0 s here, the r10 narrow layout
271.5 s, packed at stripes=1 62.9-71.8 s — identical census all three).

Usage: python tools/r12_anf_x10.py [stripes|auto] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.session import get_spark


def main() -> None:
    arg = sys.argv[1] if len(sys.argv) > 1 else "auto"
    stripes = None if arg == "auto" else int(arg)
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    import streamds_spark.operators.anf as anf

    spark = get_spark(f"anf-x10-{arg}")
    spark.sparkContext.setLogLevel("ERROR")

    from streamds_spark.queries.graph import copurchase_edges

    li = load_table(spark, sf_dir, "lineitem")
    base = copurchase_edges(li).localCheckpoint(eager=True)
    n_ids = base.agg(F.max(F.greatest("u", "v"))).first()[0] + 1
    edges = base
    for i in range(1, 10):
        edges = edges.unionByName(
            base.select(
                (F.col("u") + i * n_ids).alias("u"),
                (F.col("v") + i * n_ids).alias("v"),
            )
        )
    edges = edges.localCheckpoint(eager=True)
    n_edges = edges.count()
    t0 = time.time()
    rows = [
        tuple(r)
        for r in anf.anf_census(edges, stripes=stripes).orderBy("t").collect()
    ]
    wall = round(time.time() - t0, 1)
    print(
        json.dumps(
            {
                "stripes": arg,
                "wall_s": wall,
                "n_directed_edges": 2 * n_edges,
                "rounds": rows[-1][0],
                "census_tail": rows[-3:],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
