"""x10 soak for the two self-sizing graph memory dials (round 10).

Round 9 measured both operators' x10 OOM boundaries and fixed them with
MANUAL dials (ktruss shuffle_partitions, ANF stripes). Round 10 makes the
dials self-size from the operators' own pre-counts; this soak proves the
DEFAULT call signature now survives the x10 graph on the default-memory box
and still returns the structurally exact result:

  * k-truss: clones replicate structure, so the x10 truss is exactly 10x
    the base truss edge count at the same round count;
  * ANF: the census round count is structure-invariant, and at saturation
    every node's counter holds all m buckets of its component's register
    table — on the x10 graph the final reg_mass is exactly nodes x m
    (every component here is large enough to fill all 64 buckets).

Usage: python tools/soak_graph_dials.py [sf_dir] [--ops ktruss,anf]
Prints one JSON line per operator.
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
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1 and not sys.argv[1].startswith("--")
        else "/root/testdata/sf0.1"
    )
    ops = ["ktruss", "anf"]
    for i, a in enumerate(sys.argv):
        if a == "--ops":
            ops = sys.argv[i + 1].split(",")
    spark = get_spark("soak-dials")
    spark.sparkContext.setLogLevel("ERROR")

    from streamds_spark.queries.graph import KTRUSS_K, copurchase_edges

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
    heap = int(spark._jvm.java.lang.Runtime.getRuntime().maxMemory())  # noqa: SLF001

    if "ktruss" in ops:
        from streamds_spark.operators.ktruss import _auto_partitions, ktruss_edges

        base_truss, base_rounds = ktruss_edges(base, KTRUSS_K)
        want = base_truss.count() * 10
        t0 = time.time()
        truss, rounds = ktruss_edges(edges, KTRUSS_K)  # DEFAULT signature
        got = truss.count()
        wall = round(time.time() - t0, 1)
        print(
            json.dumps(
                {
                    "op": "ktruss_x10_default_signature",
                    "wall_s": wall,
                    "n_edges": n_edges,
                    "auto_partitions": _auto_partitions(
                        n_edges, int(spark.conf.get("spark.sql.shuffle.partitions"))
                    ),
                    "heap_bytes": heap,
                    "rounds": rounds,
                    "base_rounds": base_rounds,
                    "truss_edges": got,
                    "exact": got == want and rounds == base_rounds,
                }
            ),
            flush=True,
        )

    if "anf" in ops:
        from streamds_spark.operators.anf import (
            M_ANF,
            _auto_stripes,
            anf_census,
            anf_counters,
        )

        n_nodes = (
            edges.select(F.col("u").alias("n"))
            .unionAll(edges.select(F.col("v").alias("n")))
            .distinct()
            .count()
        )
        t0 = time.time()
        census = anf_census(edges)  # DEFAULT signature
        rows = [tuple(r) for r in census.orderBy("t").collect()]
        wall = round(time.time() - t0, 1)
        final_reg = rows[-1][1]
        # saturation invariant: every node's counter filled all m buckets
        sat = final_reg == n_nodes * M_ANF
        print(
            json.dumps(
                {
                    "op": "anf_x10_default_signature",
                    "wall_s": wall,
                    "n_nodes": n_nodes,
                    "auto_stripes": _auto_stripes(2 * n_edges, heap),
                    "heap_bytes": heap,
                    "rounds": rows[-1][0],
                    "final_reg_mass": final_reg,
                    "saturated_nodes_x_m": sat,
                    "census": rows,
                }
            ),
            flush=True,
        )
        del anf_counters  # imported for parity with tests; census is the surface

    if "stress" in ops:
        from streamds_spark.operators.stress import stress_centrality_topk

        t0 = time.time()
        rows = [
            tuple(r)
            for r in stress_centrality_topk(edges, k=20, pivots=4).collect()
        ]
        wall = round(time.time() - t0, 1)
        print(
            json.dumps(
                {
                    "op": "stress_x10_default_signature",
                    "wall_s": wall,
                    "n_edges": n_edges,
                    "heap_bytes": heap,
                    "k": len(rows),
                    "top3": rows[:3],
                    "ordered": all(
                        (-rows[i][1], rows[i][0]) <= (-rows[i + 1][1], rows[i + 1][0])
                        for i in range(len(rows) - 1)
                    ),
                }
            ),
            flush=True,
        )

    if "harmonic" in ops:
        from streamds_spark.operators.anf import harmonic_centrality_topk

        t0 = time.time()
        rows = [
            tuple(r)
            for r in harmonic_centrality_topk(edges, k=20).collect()
        ]  # DEFAULT signature — reuses the self-sized stripes dial
        wall = round(time.time() - t0, 1)
        print(
            json.dumps(
                {
                    "op": "harmonic_x10_default_signature",
                    "wall_s": wall,
                    "n_edges": n_edges,
                    "heap_bytes": heap,
                    "k": len(rows),
                    "top3": rows[:3],
                    "ordered": all(
                        (rows[i][1], -rows[i][0]) >= (rows[i + 1][1], -rows[i + 1][0])
                        for i in range(len(rows) - 1)
                    ),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
