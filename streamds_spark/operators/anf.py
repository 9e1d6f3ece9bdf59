"""Approximate neighborhood function / effective diameter (HyperANF).

Boldi, Rosa & Vigna, "HyperANF: approximating the neighbourhood function
of very large graphs on a budget" (WWW 2011): every node keeps a
HyperLogLog counter of the set of nodes within distance <= t; one round
of max-folding each node's counter with its neighbors' advances t by 1,
and the per-round total is the neighborhood function N(t). The counters
are the ONLY state — per node a fixed <= m registers forever — so the
whole traversal is rounds x (one adjacency equi-join + a (node, bucket)
max-aggregate), the mergeable-sketch discipline applied to a graph sweep.
That is THE scale story: an exact neighborhood function needs all-pairs
BFS (nodes x nodes state); this needs nodes x m.

Register arithmetic is the repo's deterministic md5 scheme
(operators/hll.py) at m = 64 (HyperANF's own register budget regime;
per-counter error ~13%, averaged down further by the per-round sum over
all nodes), so a DuckDB recursive CTE replays the iteration
character-for-character and the census is HASH-EXACT — the registry row
compares integer register masses, never float estimates:

  bucket = nib(h[1]) * 4 + nib(h[2]) // 4          6-bit index, m = 64
  rho    = leading-zero rank of h[3..17]           1..61 (hll.py scheme)

Census semantics (all BIGINT, exact):
  reg_mass(t) = total (node, bucket) registers alive at round t —
                monotone, saturating at sum_v |registers(ball_inf(v))|
  rho_mass(t) = total max_rho mass — strictly increases while ANY
                counter changes, so it doubles as the fixpoint test
  permille_of_final = 1000 * reg_mass(t) // reg_mass(inf): the effective
                diameter at q = 0.9 is the first t with permille >= 900
                (the register-mass proxy for N(t)/N(inf) — exact where
                the float ratio would be engine-ordering-dependent)

The final counters satisfy an exact invariant the tests pin: node v's
register table equals hll64_registers() of the node set of v's connected
component (max-fold over paths = union over the reachable set).

Stats posture: the carry is only ever joined against the FIXED adjacency
and folded through aggregates/unions, so Catalyst's size estimate grows
linearly per round — the stats-pin of operators/iterate.py is not needed
(see that module for the compounding case); lineage is truncated per
round. Rounds are bounded by the diameter, and each round's shuffle is
bounded by nodes x m AFTER map-side partial max collapses the join fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

M_ANF = 64
HEX = "0123456789abcdef"

# (bucket, rho) extraction from md5(node) — hll.py's scheme at m=64; the
# same expressions appear verbatim in the DuckDB oracle (queries/graph.py).
BUCKET_SQL = (
    f"(instr('{HEX}', substring(h, 1, 1)) - 1) * 4"
    f" + (instr('{HEX}', substring(h, 2, 1)) - 1) DIV 4"
)
RHO_SQL = (
    "CASE WHEN length(t) = 0 THEN 61"
    " ELSE (15 - length(t)) * 4 + 4"
    f" - CAST(floor(log2(instr('{HEX}', substring(t, 1, 1)) - 1)) AS INT)"
    " END"
)


def hll64_registers(df: DataFrame, key_col: str) -> DataFrame:
    """(bucket, max_rho) register table at m = 64 for key_col's distinct
    values — hll.hll_registers with the 6-bit bucket; the unit tests use it
    to check the final-counter invariant against a direct sketch."""
    keyed = df.select(F.md5(F.col(key_col).cast("string")).alias("h"))
    bits = keyed.select(
        F.expr(BUCKET_SQL).cast("int").alias("bucket"),
        F.expr("regexp_replace(substring(h, 3, 15), '^0+', '')").alias("t"),
    )
    return (
        bits.select("bucket", F.expr(RHO_SQL).cast("int").alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


# Budget reader + the measured 24M-fan-out-rows-per-GiB calibration now
# live in operators/sizing.py (shared with the ktruss/kcore dials); the
# private aliases keep this module's soak pins and tools stable.
from streamds_spark.operators.sizing import (  # noqa: E402
    ANF_FANOUT_ROWS_PER_GIB as _FANOUT_ROWS_PER_GIB,
)
from streamds_spark.operators.sizing import (  # noqa: E402
    mem_budget_bytes as _mem_budget_bytes,
)


def _auto_stripes(n_directed_edges: int, budget_bytes: int) -> int:
    """ceil(fan-out rows / (24M x GiB)): at least 1, at most m (a stripe
    narrower than one bucket cannot exist)."""
    budget_gib = max(1.0, budget_bytes / (1 << 30))
    fanout = n_directed_edges * M_ANF
    per_stripe = int(_FANOUT_ROWS_PER_GIB * budget_gib)
    return max(1, min(M_ANF, -(-fanout // per_stripe)))


# WIDE register layout (round 11, guide §1.2/§2.3): counters are ONE ROW PER
# NODE with m register COLUMNS (_r0.._r63, NULL = register absent) instead of
# one row per (node, bucket). The propagate join then fans out |adj| ROWS per
# round instead of |adj| x m, and the max-fold aggregate updates m codegen'd
# column buffers per row instead of probing a hash map once per REGISTER —
# measured at sf0.1 the narrow layout's propagate map stages were 65% of the
# query's total CPU (259 of 397 executor-seconds, pure compute, no spill).
# Register VALUES are identical: F.max over a column ignores NULLs exactly as
# the narrow groupBy max folded only existing rows, so every round's counter
# table (viewed narrow) is row-for-row the dense iteration's and the census /
# harmonic folds stay hash-exact vs the DuckDB replays.
_RCOLS = [f"_r{i}" for i in range(M_ANF)]
_OCOLS = [f"_o{i}" for i in range(M_ANF)]

# Layout dispatch threshold (directed half-edges). The wide layout trades a
# large FIXED per-round cost (a ~128-expression aggregate to plan and
# Janino-compile every round, and generated methods big enough to feel JVM
# code-cache pressure in long many-query sessions) for per-cell work that is
# ~m x cheaper. Measured anchors on this box (min-of-2 per point):
#   231k directed edges (sf0.01):   narrow 2.1-2.5x FASTER (10.4 vs 21.6 s)
#   925k (sf0.01 cloned x4):        narrow 1.7-2.1x FASTER (19.6 vs 32.4 s)
#   2.4M (sf0.1):                   context-dependent — wide wins in a FRESH
#                                   process (neighborhood 26 vs 41 s), loses
#                                   in a warm many-query session (48 vs 39 s)
#   23.9M (x10 soak, fresh, apples-to-apples vs the r10 narrow soak):
#                                   wide 1.28x FASTER (211.8 vs 271.5 s)
# The threshold sits between the tied mid-scale point and the decisive big-
# graph point: only genuinely large graphs — the dedicated-job, 100 TB
# regime where the propagate fan-out dwarfs every fixed cost — go wide.
# Both layouts are value-identical (test_anf.py pins wide-vs-narrow equality
# by forcing this to 0).
WIDE_MIN_DIRECTED_EDGES = 8_000_000


def _seed_wide(adj: DataFrame) -> DataFrame:
    """One row per node: its single seeded register placed in the md5
    bucket's column, every other register column NULL."""
    nodes = adj.select(F.col("u").alias("node")).distinct()
    br = (
        nodes.select("node", F.md5(F.col("node").cast("string")).alias("h"))
        .select(
            "node",
            F.expr(BUCKET_SQL).cast("int").alias("bucket"),
            F.expr("regexp_replace(substring(h, 3, 15), '^0+', '')").alias("t"),
        )
        .select("node", "bucket", F.expr(RHO_SQL).cast("int").alias("rho"))
    )
    return br.select(
        "node",
        *[
            F.when(F.col("bucket") == i, F.col("rho")).alias(c)
            for i, c in enumerate(_RCOLS)
        ],
    ).localCheckpoint(eager=False)


def _to_narrow(wide: DataFrame) -> DataFrame:
    """DataFrame[node, bucket, max_rho] view of a wide counter table — the
    public anf_counters contract (and the invariant tests' shape)."""
    pairs = ", ".join(f"{i}, _r{i}" for i in range(M_ANF))
    return (
        wide.select(
            "node", F.expr(f"stack({M_ANF}, {pairs}) AS (bucket, max_rho)")
        )
        .where(F.col("max_rho").isNotNull())
        .select(
            "node",
            F.col("bucket").cast("int").alias("bucket"),
            F.col("max_rho").cast("int").alias("max_rho"),
        )
    )


def _rho_row() -> "F.Column":
    """Per-row total rho mass of a wide counter row (exact BIGINT)."""
    out = F.lit(0).cast("bigint")
    for c in _RCOLS:
        out = out + F.coalesce(F.col(c).cast("bigint"), F.lit(0))
    return out


def _reg_row() -> "F.Column":
    """Per-row live-register count of a wide counter row."""
    out = F.lit(0).cast("bigint")
    for c in _RCOLS:
        out = out + F.when(F.col(c).isNull(), 0).otherwise(1)
    return out


def _seed_narrow(adj: DataFrame) -> DataFrame:
    """DataFrame[node, bucket, max_rho] — the small-graph layout's seed."""
    nodes = adj.select(F.col("u").alias("node")).distinct()
    seeded = nodes.select(
        "node", F.md5(F.col("node").cast("string")).alias("h")
    ).select(
        "node",
        F.expr(BUCKET_SQL).cast("int").alias("bucket"),
        F.expr("regexp_replace(substring(h, 3, 15), '^0+', '')").alias("t"),
    )
    return seeded.select(
        "node", "bucket", F.expr(RHO_SQL).cast("int").alias("max_rho")
    ).localCheckpoint(eager=False)


def _propagate_narrow(
    adj: DataFrame,
    counters: DataFrame,
    stripes: int,
    changed: "DataFrame | None" = None,
    n_adj: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """One HyperANF round over NARROW (node, bucket, max_rho) rows — the
    small-graph layout (see WIDE_MIN_DIRECTED_EDGES). Same systolic
    changed-set, striping, and folded change detection as the wide path
    (_propagate_wide carries the full design rationale); here the changed
    set is per-REGISTER and stripes filter rows by bucket % stripes."""
    from streamds_spark.operators.sizing import ANF_FANOUT_ROWS_PER_TASK
    from streamds_spark.operators.sizing import KTRUSS_MAX_PARTITIONS as _CAP

    spark = adj.sparkSession
    session_default = int(spark.conf.get("spark.sql.shuffle.partitions"))
    fanout = n_adj * M_ANF // max(1, stripes)
    n_parts = max(
        session_default,
        min(_CAP, -(-fanout // ANF_FANOUT_ROWS_PER_TASK)),
    )
    adj_w = adj.repartition(n_parts, "v")
    src_all = counters if changed is None else changed
    parts = []
    for s in range(max(1, stripes)):
        cs = (
            counters.where(F.col("bucket") % stripes == s)
            if stripes > 1
            else counters
        )
        src = (
            src_all.where(F.col("bucket") % stripes == s)
            if stripes > 1
            else src_all
        )
        prop = adj_w.join(src, adj_w.v == src.node).select(
            adj_w.u.alias("node"),
            "bucket",
            "max_rho",
            F.lit(None).cast("int").alias("_old"),
        )
        parts.append(
            prop.unionByName(
                cs.select("node", "bucket", "max_rho", F.col("max_rho").alias("_old"))
            )
            .groupBy("node", "bucket")
            .agg(
                F.max("max_rho").alias("max_rho"),
                F.max("_old").alias("_old"),
            )
            .localCheckpoint(eager=False)
        )
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    nxt = merged.select("node", "bucket", "max_rho")
    changed_next = merged.where(
        F.col("_old").isNull() | (F.col("max_rho") > F.col("_old"))
    ).select("node", "bucket", "max_rho")
    return nxt, changed_next


def anf_counters(
    edges: DataFrame, max_iter: int = 32, stripes: "int | None" = None
) -> DataFrame:
    """Fixpoint per-node counters: DataFrame[node, bucket, max_rho] where
    node v's registers sketch its whole connected component. Exposed for
    the invariant tests; the census below is the registry surface."""
    counters, _ = _anf_iterate(edges, max_iter, stripes)
    return counters


def anf_census(
    edges: DataFrame, max_iter: int = 32, stripes: "int | None" = None
) -> DataFrame:
    """DataFrame[t, reg_mass, rho_mass, permille_of_final] — one row per
    round from t = 0 (every node sees itself) to the fixpoint (every node
    sees its component). All columns exact BIGINTs (see module docstring);
    read the q = 0.9 effective diameter as the first t with
    permille_of_final >= 900.

    `stripes`: memory dial for big graphs. The per-round cost is the
    adjacency join's fan-out (edges x up-to-m register rows) collapsing
    into a (node, bucket) partial aggregate whose hash map holds up to
    nodes x m keys per task — past executor memory on a saturated big
    graph. Registers in different buckets never interact, so processing
    bucket stripe s of k per round (filter, join, aggregate, union the k
    stripe results) is VALUE-IDENTICAL while dividing both the join
    fan-out and the aggregate key space by k. The ×10 soak on this box
    (8 GiB heap, 32 threads) OOMs at stripes=1 and completes at
    stripes=8; raising shuffle partitions alone (256 — the dial that fixes
    the k-truss wedge join) was measured NOT to save it, because the
    propagation fan-out is inherently m× per edge and only striping
    divides it. Left unset it SELF-SIZES: stripes = ceil(directed-edges × m
    / (24M rows × executor-memory-GiB)) — the measured calibration keeps
    sf0.1 at 1 stripe (fast path unchanged) and lands the ×10 soak at 8 on
    this 8 GiB box, exactly the measured completion point; the explicit
    override remains for a cluster that knows better."""
    _, census = _anf_iterate(edges, max_iter, stripes)
    spark = edges.sparkSession
    # max(1, ...): an empty graph has zero final register mass — emit an
    # all-zero census instead of dividing by it
    final_mass = max(1, census[-1][1])
    rows = [
        (t, reg, rho, 1000 * reg // final_mass) for (t, reg, rho) in census
    ]
    return spark.createDataFrame(
        rows, "t bigint, reg_mass bigint, rho_mass bigint, permille_of_final bigint"
    )


# Weight scale for the harmonic fold: floor(SCALE / t) per round t. lcm(1..20)
# — the per-round weights are EXACT integers through round 20 (and for every
# later t whose factors stay under 20); beyond that both engines floor-divide
# identically, so hash-exactness never depends on divisibility.
HARMONIC_SCALE = 232_792_560


def harmonic_centrality_topk(
    edges: DataFrame,
    k: int = 20,
    max_iter: int = 32,
    stripes: "int | None" = None,
) -> DataFrame:
    """DataFrame[node, h_scaled] — top-k nodes by HyperBall harmonic
    centrality (Boldi & Vigna, "In-core computation of geometric
    centralities with HyperBall", 2014): harmonic centrality
    H(v) = sum_{u != v} 1/d(v, u) folds from the SAME per-round counters
    HyperANF already sweeps — the ball-size growth at distance t is the
    per-node counter delta, weighted 1/t.

    Exactness contract (the HLL-twin discipline): the per-node ball-size
    proxy is the counter's integer rho mass (sum of max_rho over buckets),
    so h_scaled = sum_t (rho_mass_t(v) - rho_mass_{t-1}(v)) * (SCALE // t)
    is exact BIGINT arithmetic over the deterministic md5 register scheme —
    a DuckDB recursive CTE replays the identical iteration and the top-k is
    HASH-EXACT at any SF. As a harmonic-centrality ESTIMATE it is
    approximate by construction (register mass stands in for |B(v, t)|),
    exactly like the HLL register stores stand in for distinct counts.
    Ties break (h_scaled DESC, node ASC) so the top-k is deterministic.

    Scale shape: identical to anf_census — per round one adjacency
    equi-join collapsing map-side plus TWO node-sized folds (per-node mass,
    harmonic accumulate), rounds bounded by the diameter, and the same
    self-sizing `stripes` memory dial divides the propagation fan-out."""
    adj = (
        edges.select("u", "v")
        .unionAll(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .localCheckpoint(eager=False)
    )
    spark = edges.sparkSession
    # one count answers both the empty check and the stripes sizing —
    # BEFORE any seeding/checkpoint jobs are spent on an empty graph
    # (and it materializes the LAZY adjacency checkpoint in the same job)
    n_adj = adj.count()
    if n_adj == 0:
        return spark.createDataFrame([], "node bigint, h_scaled bigint")
    if stripes is None:
        stripes = _auto_stripes(n_adj, _mem_budget_bytes(spark))
    wide = n_adj >= WIDE_MIN_DIRECTED_EDGES

    def per_node_mass(c: DataFrame) -> DataFrame:
        # wide rows make the per-node mass a ROW-LOCAL projection of the
        # checkpointed counters (the narrow layout needs a (node) groupBy
        # exchange here and again every round — guide §2.4)
        if wide:
            return c.select("node", _rho_row().alias("mass"))
        return (
            c.groupBy("node")
            .agg(F.sum("max_rho").cast("bigint").alias("mass"))
            .localCheckpoint(eager=False)
        )

    _propagate = _propagate_wide if wide else _propagate_narrow
    counters = _seed_wide(adj) if wide else _seed_narrow(adj)
    node_mass = per_node_mass(counters)
    h = node_mass.select(
        "node", F.lit(0).cast("bigint").alias("h_scaled")
    ).localCheckpoint(eager=False)
    # the ONE driver job of the seeding step — it materializes the lazy
    # seed checkpoint as a side effect (guide §1.3)
    total_prev = node_mass.agg(F.sum("mass")).collect()[0][0]
    changed = counters  # round 1: every seeded register is fresh
    for t in range(1, max_iter + 1):
        nxt, changed = _propagate(adj, counters, stripes, changed, n_adj)
        new_mass = per_node_mass(nxt)
        # the ONE driver job per round: the saturation probe materializes
        # the round's lazy propagate checkpoint (new_mass is a row-local
        # projection of it, so later reads re-project, never re-propagate)
        total = new_mass.agg(F.sum("mass")).collect()[0][0]
        if total == total_prev:  # rho mass strictly grows on ANY change
            return h.orderBy(F.desc("h_scaled"), "node").limit(k)
        w = HARMONIC_SCALE // t
        delta = new_mass.join(
            node_mass.withColumnRenamed("mass", "pmass"), "node"
        ).select(
            "node", ((F.col("mass") - F.col("pmass")) * w).alias("dh")
        )
        h = (
            h.join(delta, "node", "left")
            .select(
                "node",
                (F.col("h_scaled") + F.coalesce(F.col("dh"), F.lit(0)))
                .cast("bigint")
                .alias("h_scaled"),
            )
            .localCheckpoint(eager=False)
        )
        counters, node_mass, total_prev = nxt, new_mass, total
    raise RuntimeError(
        f"harmonic centrality did not saturate in {max_iter} rounds"
    )


def _propagate_wide(
    adj: DataFrame,
    counters: DataFrame,
    stripes: int,
    changed: "DataFrame | None" = None,
    n_adj: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """One HyperANF round over WIDE counter rows: max-fold every node's
    counter with its neighbors'. Returns (nxt, changed_next) — the full new
    wide counter table and the subset of its ROWS (nodes) holding any
    register that is new or increased this round.

    SYSTOLIC propagation (Boldi & Vigna's HyperBall refinement, round 11,
    guide §2.2 — shuffle fewer rows): only nodes whose counter CHANGED last
    round join the adjacency. A neighbor register (n, b) unchanged since
    round t-2 was already folded into every u ∈ N(n) at round t-1 (the
    dense update folds ALL neighbors, so R_{t-1}(u, b) >= R_{t-2}(n, b)),
    hence dropping it from round t's max loses nothing; re-sending an
    UNCHANGED register of a changed node (the wide row carries all m cells)
    is a max-idempotent no-op — so by induction the per-round counter
    tables are (viewed narrow) ROW-FOR-ROW IDENTICAL to the dense
    iteration's, which is what keeps the census hash-exact vs the DuckDB
    dense-round replays.

    Change detection is folded INTO the same aggregate (no extra join):
    previous-round rows carry their values in `_o*` twins, propagated rows
    carry NULLs, and one groupBy computes max(_r*) alongside max(_o*) — a
    node changed iff any register is brand-new (_o NULL, _r not) or grew.

    Registers in different buckets never interact, so the `stripes` memory
    dial (see anf_census) processes COLUMN GROUPS (bucket % stripes == s):
    per stripe the join carries m/stripes register columns and the
    partial-agg buffers shrink by the same factor — value-identical, same
    dial semantics as the narrow row-stripes. Stripe results (column-
    disjoint per node) reassemble through one node-keyed max-fold over
    their padded union.

    The adjacency side is explicitly repartitioned to a width sized from
    the CELL fan-out (rows x m register cells / stripes — the same
    ANF_FANOUT_ROWS_PER_TASK calibration as the narrow layout, provenance
    in operators/sizing.py): the join's input exchanges are small, so AQE —
    blind to the per-row register work — would coalesce the heavy stage to
    ~core-count tasks; user repartitions are never coalesced. Only the
    adjacency is pinned — the register side auto-co-partitions, and a tiny
    late-round changed set stays eligible for an AQE broadcast that skips
    the adjacency shuffle entirely."""
    from streamds_spark.operators.sizing import ANF_FANOUT_ROWS_PER_TASK
    from streamds_spark.operators.sizing import KTRUSS_MAX_PARTITIONS as _CAP

    spark = adj.sparkSession
    session_default = int(spark.conf.get("spark.sql.shuffle.partitions"))
    k = max(1, stripes)
    fanout = n_adj * M_ANF // k
    n_parts = max(
        session_default,
        min(_CAP, -(-fanout // ANF_FANOUT_ROWS_PER_TASK)),
    )
    adj_w = adj.repartition(n_parts, "v")
    src_all = counters if changed is None else changed
    parts = []
    for s in range(k):
        cols = [_RCOLS[i] for i in range(M_ANF) if i % k == s]
        ocols = [_OCOLS[i] for i in range(M_ANF) if i % k == s]
        src = src_all.select("node", *cols)
        prop = adj_w.join(src, adj_w.v == src.node).select(
            adj_w.u.alias("node"),
            *cols,
            *[F.lit(None).cast("int").alias(o) for o in ocols],
        )
        own = counters.select(
            "node",
            *cols,
            *[F.col(c).alias(o) for c, o in zip(cols, ocols)],
        )
        parts.append(
            prop.unionByName(own)
            .groupBy("node")
            .agg(
                *[F.max(c).alias(c) for c in cols],
                *[F.max(o).alias(o) for o in ocols],
            )
        )
    if k == 1:
        merged = parts[0]
    else:
        # pad each stripe to the full schema (NULLs outside its column
        # group), union, and max-fold once per node — NULL-ignoring max
        # makes the reassembly exact
        full = ["node"] + _RCOLS + _OCOLS
        padded = [
            p.select(
                *[
                    F.col(c) if c in set(p.columns) else F.lit(None).cast("int").alias(c)
                    for c in full
                ]
            )
            for p in parts
        ]
        merged = padded[0]
        for p in padded[1:]:
            merged = merged.unionByName(p)
        merged = merged.groupBy("node").agg(
            *[F.max(c).alias(c) for c in _RCOLS + _OCOLS]
        )
    merged = merged.localCheckpoint(eager=False)
    nxt = merged.select("node", *_RCOLS)
    chg = F.lit(False)
    for c, o in zip(_RCOLS, _OCOLS):
        chg = chg | (
            F.col(c).isNotNull() & (F.col(o).isNull() | (F.col(c) > F.col(o)))
        )
    changed_next = merged.where(chg).select("node", *_RCOLS)
    return nxt, changed_next


def _anf_iterate(
    edges: DataFrame, max_iter: int, stripes: "int | None" = None
) -> tuple[DataFrame, list[tuple[int, int, int]]]:
    adj = (
        edges.select("u", "v")
        .unionAll(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .localCheckpoint(eager=False)
    )
    # One cheap count sizes BOTH dials (the stripes memory dial and the
    # propagate stage width) and materializes the lazy checkpoint.
    n_adj = adj.count()
    if stripes is None:
        stripes = _auto_stripes(n_adj, _mem_budget_bytes(edges.sparkSession))
    wide = n_adj >= WIDE_MIN_DIRECTED_EDGES
    _propagate = _propagate_wide if wide else _propagate_narrow
    counters = _seed_wide(adj) if wide else _seed_narrow(adj)

    def mass(c: DataFrame) -> tuple[int, int]:
        # coalesce: SUM over zero rows is NULL — an empty edge list must
        # yield a (0, 0) census, not a TypeError on int(None)
        if wide:
            # row-local register/rho tallies over the wide rows, then one
            # sum — identical values to narrow's count(*) / sum(max_rho)
            src = c.select(_reg_row().alias("_reg"), _rho_row().alias("_rho"))
            reg_col, rho_col = F.sum("_reg"), F.sum("_rho")
        else:
            src, reg_col, rho_col = c, F.count("*"), F.sum("max_rho")
        row = src.agg(
            F.coalesce(reg_col, F.lit(0)).cast("bigint").alias("reg"),
            F.coalesce(rho_col, F.lit(0)).cast("bigint").alias("rho"),
        ).collect()[0]
        return int(row["reg"]), int(row["rho"])

    reg, rho = mass(counters)
    census = [(0, reg, rho)]
    changed = counters  # round 1: every seeded register is fresh
    for t in range(1, max_iter + 1):
        nxt, changed = _propagate(adj, counters, stripes, changed, n_adj)
        reg, rho = mass(nxt)
        if rho == census[-1][2]:  # rho mass strictly grows on ANY change
            return (_to_narrow(counters) if wide else counters), census
        counters = nxt
        census.append((t, reg, rho))
    raise RuntimeError(
        f"ANF register propagation did not saturate in {max_iter} rounds"
    )
