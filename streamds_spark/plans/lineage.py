"""Column-level lineage extraction from the ANALYZED logical plan.

Answers the ops question every 100 TB warehouse eventually asks: *which
source-table columns feed this output column?* — impact analysis before a
schema change, audit trails for derived reports, and scoping which scans a
materialization actually needs. The reference has no analog (its operators
are opaque `exec()` binaries — lineage is exactly what a declarative plan
buys us over that design).

Implementation: walk the analyzed (pre-optimization) plan bottom-up over
py4j. Leaf relations bind each output attribute's exprId to a concrete
(relation, column). Computed attributes (Project/Aggregate/Window aliases)
resolve through their expression's references — transitively, because
children are processed first. Special shapes:

  * Union: output attributes are FRESH ids mapped positionally onto every
    child's i-th column — lineage is the union across children.
  * Generate (explode/posexplode/UDTF): generator outputs descend from the
    generator expression's references.
  * Anything unresolved degrades to ("?", attr_name) rather than raising —
    lineage is a diagnostic, not a gate.

Driver-side plan traversal only: no job runs, cost is plan-sized.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def _seq(scala_seq):
    return [scala_seq.apply(i) for i in range(scala_seq.size())]


def _attr_ids(refs) -> list[int]:
    """exprId ids from an AttributeSet / Seq[Attribute]."""
    out = []
    it = refs.iterator()
    while it.hasNext():
        out.append(it.next().exprId().id())
    return out


def _leaf_name(node) -> str:
    """Human name for a leaf relation: parquet dir basename when available."""
    try:
        rel = node.relation()
        paths = rel.location().rootPaths()
        if paths.size() > 0:
            return os.path.basename(paths.apply(0).toString())
    except Exception:  # noqa: BLE001 — py4j reflection probing
        pass
    try:
        ct = node.catalogTable()
        if ct.isDefined():
            return ct.get().identifier().unquotedString()
    except Exception:  # noqa: BLE001
        pass
    return "<local>"


def _walk(node, env: dict[int, set]) -> None:
    cls = node.getClass().getSimpleName()
    for child in _seq(node.children()):
        _walk(child, env)

    out_attrs = _seq(node.output())

    if not _seq(node.children()):  # leaf relation
        name = _leaf_name(node)
        for a in out_attrs:
            env[a.exprId().id()] = {(name, a.name())}
        return

    if cls == "Union":
        kids = _seq(node.children())
        for i, a in enumerate(out_attrs):
            merged: set = set()
            for kid in kids:
                kid_out = _seq(kid.output())
                if i < len(kid_out):
                    merged |= env.get(kid_out[i].exprId().id(), set())
            env[a.exprId().id()] = merged
        return

    if cls == "Expand":
        # cube/rollup/grouping-sets, hopping windows, unpivot: each output
        # attr i is computed by the i-th expression of EVERY projection row
        try:
            projections = [_seq(p) for p in _seq(node.projections())]
            for i, a in enumerate(out_attrs):
                srcs: set = set()
                for proj in projections:
                    if i < len(proj):
                        for rid in _attr_ids(proj[i].references()):
                            srcs |= env.get(rid, set())
                env[a.exprId().id()] = srcs
            return
        except Exception:  # noqa: BLE001 — fall through to generic path
            pass

    if cls in {
        "MapInPandas",
        "PythonMapInArrow",
        "MapInArrow",
        "FlatMapGroupsInPandas",
        "FlatMapGroupsInPandasWithState",
        "TransformWithStateInPandas",
    }:
        # opaque Python stage: every output column may depend on any input
        # column of the batch — coarse, but true (and honest about the
        # boundary where expression-level tracking stops)
        child_srcs: set = set()
        for kid in _seq(node.children()):
            for ka in _seq(kid.output()):
                child_srcs |= env.get(ka.exprId().id(), set())
        for a in out_attrs:
            env[a.exprId().id()] = set(child_srcs)
        return

    if cls == "Generate":
        gen_refs: set = set()
        try:
            for rid in _attr_ids(node.generator().references()):
                gen_refs |= env.get(rid, set())
            for a in _seq(node.generatorOutput()):
                env[a.exprId().id()] = set(gen_refs)
        except Exception:  # noqa: BLE001
            pass
        # non-generator outputs fall through to the generic path below

    # generic: named expressions (Project/Aggregate/Window aliases and
    # pass-through attrs) resolve via their references
    named = {}
    try:
        for e in _seq(node.expressions()):
            try:
                attr = e.toAttribute()
                named[attr.exprId().id()] = e
            except Exception:  # noqa: BLE001 — not a NamedExpression
                continue
    except Exception:  # noqa: BLE001
        pass
    for a in out_attrs:
        aid = a.exprId().id()
        if aid in env:
            continue  # inherited from a child
        if aid in named:
            rids = _attr_ids(named[aid].references())
            if not rids:
                env[aid] = set()  # literal-only expression: no source columns
                continue
            srcs: set = set()
            for rid in rids:
                srcs |= env.get(rid, {("?", a.name())})
            env[aid] = srcs
        else:
            env[aid] = {("?", a.name())}


def referenced_source_columns(df: DataFrame) -> dict[str, set]:
    """{relation -> {source columns referenced ANYWHERE in the plan}} —
    outputs, filters, join keys, sort keys, window specs, everything.

    This is the column set a perfectly-pruned scan reads: compare it against
    each scan's ReadSchema to prove column pruning reached the parquet
    footer (tests/test_pruning_vs_lineage.py does exactly that)."""
    plan = df._jdf.queryExecution().analyzed()  # noqa: SLF001
    env: dict[int, set] = {}
    _walk(plan, env)

    touched: set = set()

    def collect(node) -> None:
        for child in _seq(node.children()):
            collect(child)
        if not _seq(node.children()):
            return  # leaf outputs only count when something references them
        try:
            exprs = _seq(node.expressions())
        except Exception:  # noqa: BLE001
            exprs = []
        for e in exprs:
            try:
                for rid in _attr_ids(e.references()):
                    touched.update(env.get(rid, set()))
            except Exception:  # noqa: BLE001
                continue

    collect(plan)
    # plan outputs count as referenced even when the plan is a bare scan
    for a in _seq(plan.output()):
        touched.update(env.get(a.exprId().id(), set()))
    by_rel: dict[str, set] = {}
    for t, c in touched:
        if t != "?":
            by_rel.setdefault(t, set()).add(c)
    return by_rel


def column_lineage(df: DataFrame) -> dict[str, set]:
    """{output column -> {(relation, source column), ...}} for a DataFrame.

    Literal-only outputs (e.g. `lit(5).alias("k")`) have no references and
    return an empty set. Unresolvable shapes degrade to ("?", name)."""
    plan = df._jdf.queryExecution().analyzed()  # noqa: SLF001
    env: dict[int, set] = {}
    _walk(plan, env)
    out = {}
    for a in _seq(plan.output()):
        srcs = env.get(a.exprId().id(), {("?", a.name())})
        out[a.name()] = {s for s in srcs if s[0] != "?"} if any(
            s[0] != "?" for s in srcs
        ) else srcs
    return out


def lineage_report(df: DataFrame) -> str:
    """Readable one-line-per-column report (CLI / server facing)."""
    lines = []
    for col, srcs in column_lineage(df).items():
        shown = ", ".join(f"{t}.{c}" for t, c in sorted(srcs)) or "<literal>"
        lines.append(f"{col} <- {shown}")
    return "\n".join(lines)
