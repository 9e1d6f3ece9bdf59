"""Shared memory-budget machinery for the graph operators' self-sizing
dials (round 11, per VERDICT r10 item 5): the "what's my executor heap"
reader and the measured calibration constants lived scattered across
anf.py / ktruss.py / kcore.py — one import point keeps the provenance of
every number next to the number and the JVM-size parser unit-testable
without a session.

Every constant below is a MEASUREMENT, not a guess; the boundary soaks are
reproducible with tools/soak_graph_dials.py and recorded in BASELINE.md
(round-9/10 graph-dial notes).
"""

from __future__ import annotations

_UNITS = {"k": 10, "m": 20, "g": 30, "t": 40}


def parse_jvm_size(s: "str | None") -> "int | None":
    """Bytes for a JVM-style size string ('512m', '8g', '1.5g', '2t',
    '1024k', or raw bytes '123456'); None when unset or unparseable —
    callers fall back to the live JVM heap rather than guess."""
    if not s:
        return None
    s = s.strip().lower()
    try:
        if s and s[-1] in _UNITS:
            return int(float(s[:-1]) * (1 << _UNITS[s[-1]]))
        return int(s)
    except (ValueError, IndexError):
        return None


def mem_budget_bytes(spark) -> int:
    """Per-executor memory the self-sizing heuristics budget against: the
    `spark.executor.memory` conf when set (a real cluster), else the
    driver JVM's max heap (local mode, where driver == executor)."""
    parsed = parse_jvm_size(spark.conf.get("spark.executor.memory", None))
    if parsed is not None:
        return parsed
    return int(spark._jvm.java.lang.Runtime.getRuntime().maxMemory())  # noqa: SLF001


# -- HyperANF / harmonic (operators/anf.py) ---------------------------------
# Stripes dial calibration for the PACKED register layout (round 12). The
# per-round propagation fan-out is |directed adjacency| ROWS each carrying
# m register CELLS in one array; per-task state is the collect_list fold
# buffers, ~m x smaller per cell than the retired narrow layout's
# (node, bucket) hash-map entries (whose calibration was 24M cells/GiB —
# the x10 soak OOMed at stripes=1 under narrow). Measured on the
# 8 GiB-heap / 32-thread box (round 12): the x10 clone graph (23.9M
# directed edges -> 1.53G register cells/round) COMPLETES at stripes=1 in
# 62.9 s with no spill — that anchor is the budget: 192M cells per GiB
# (= 1.53G / 8 GiB), round up. sf0.1 (153M cells) stays at 1 stripe.
ANF_FANOUT_ROWS_PER_GIB = 192_000_000

# -- k-truss (operators/ktruss.py) -------------------------------------------
# The wedge join's per-task sort/aggregate buffers scale with (join
# fan-out) / (shuffle partitions); the boundary is PARTITION GRANULARITY,
# not heap. Measured (BASELINE.md round-9/10 soaks): sf0.1's 1.196M edges
# at 32 partitions = 37k edges/task is good (20.9 s); the x10 soak's
# OOM-at-32 / completes-at-256 boundary is ~47k edges/task — budget 40k
# with headroom. The 4096 cap bounds scheduler overhead on huge graphs.
KTRUSS_EDGES_PER_TASK = 40_000
KTRUSS_MAX_PARTITIONS = 4096

# -- HyperANF propagate width (operators/anf.py) -----------------------------
# The propagate join's INPUT exchanges are tiny (the adjacency is ~20 MB at
# sf0.1) so AQE coalesces the stage to ~20 tasks while the join OUTPUT
# explodes to |adj| x up-to-m register rows — the link-prediction disease
# (see LINKPRED_* above) applied to the graph sweep. An explicit
# repartition of the adjacency sized from the fan-out keeps the stage wide
# and each per-task partial-agg map small enough to stay cache-resident.
# Measured at sf0.1 (153M fan-out rows/round, interleaved min-of-2,
# plans/r11 work log): 1.5M rows/task -> 102 partitions turns the census
# from 48.9 s into 37.8 s on the same box-minute. Cap shared with ktruss.
ANF_FANOUT_ROWS_PER_TASK = 1_500_000

# -- link prediction (queries/graph.py copurchase_link_prediction) -----------
# The wedge self-join EXPLODES ~sum(deg^2)/2 candidate rows out of a tiny
# adjacency shuffle, so AQE (which only sees the small INPUT exchanges)
# coalesces both heavy stages to near the core count and every per-task
# aggregation map blows past its memory quota. Explicit repartition(N)
# calls — user repartitions are never coalesced — size the join and the
# pair-count aggregate from the wedge count itself. Measured at sf0.1
# (149M wedges, 101M distinct pairs, 8 GiB heap, interleaved min-of-2,
# plans/r11 work log): 1M wedges/task -> N=149 turns 1.9 GB of disk spill
# into ZERO and 90.4 s into 25.5 s; per-task partial-agg maps are ~45 MB
# (~0.95M keys x 48 B), comfortably inside the ~145 MB/task quota at 32
# concurrent tasks. The 4096 cap bounds scheduler overhead like ktruss's.
LINKPRED_WEDGES_PER_TASK = 1_000_000
LINKPRED_MAX_PARTITIONS = 4096

# -- k-core (operators/kcore.py) ---------------------------------------------
# Below this changed-node fraction the per-round H-index recompute narrows
# to the frontier's neighborhood; above it a full recompute is cheaper (the
# semi-join pre-filter would scan the adjacency anyway and add exchanges).
# Crossover measured by the active-set shrink pin in tests/test_kcore.py.
KCORE_ACTIVE_SET_FRACTION = 0.5
