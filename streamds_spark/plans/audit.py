"""Physical-plan audit helpers: assert the plan properties that matter at
100 TB — pushdown, pruning, broadcast, partial aggregation, codegen — instead
of guessing. Used by tests/test_plans.py and ad-hoc from a REPL:

    from streamds_spark.plans.audit import formatted_plan, plan_report
    print(plan_report(df))
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout
from dataclasses import dataclass

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@dataclass
class PlanFacts:
    pushed_filters: list[str]
    read_schemas: list[str]
    has_broadcast_join: bool
    has_sortmerge_join: bool
    has_codegen: bool
    has_partial_agg: bool
    has_take_ordered: bool
    n_exchanges: int
    n_single_partition: int  # Exchange SinglePartition = a serialization point
    n_global_windows: int  # unpartitioned windows = whole input on one task


def count_global_windows(df: DataFrame) -> int:
    """Count window expressions with an EMPTY partition spec — the shape that
    forces Spark to move the whole input to one task (`WindowExec: No
    Partition Defined`). Parsed from the optimized logical plan: inside
    `windowspecdefinition(part..., order ASC/DESC..., frame)` partition columns
    print bare while order columns carry a sort direction, so a spec whose
    FIRST argument is already a sort spec (or the frame) has no partition keys."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return len(
        re.findall(
            r"windowspecdefinition\(\s*(?:[^,()]*\s(?:ASC|DESC)\s|specifiedwindowframe)",
            plan,
        )
    )


def plan_facts(df: DataFrame) -> PlanFacts:
    p = formatted_plan(df)
    return PlanFacts(
        pushed_filters=re.findall(r"PushedFilters: \[([^\]]*)\]", p),
        read_schemas=re.findall(r"ReadSchema: ([^\n]*)", p),
        has_broadcast_join="BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p,
        has_sortmerge_join="SortMergeJoin" in p,
        has_codegen="codegen id" in p,  # only populated post-execution under AQE
        has_partial_agg="HashAggregate" in p or "SortAggregate" in p,
        has_take_ordered="TakeOrderedAndProject" in p,
        n_exchanges=p.count("Exchange"),
        n_single_partition=p.count("SinglePartition"),
        n_global_windows=count_global_windows(df),
    )


def plan_report(df: DataFrame) -> str:
    f = plan_facts(df)
    lines = [
        f"broadcast_join={f.has_broadcast_join} sortmerge_join={f.has_sortmerge_join}",
        f"codegen={f.has_codegen} partial_agg={f.has_partial_agg} take_ordered={f.has_take_ordered}",
        f"exchanges={f.n_exchanges}",
    ]
    for s in f.read_schemas:
        lines.append(f"read_schema: {s}")
    for pf in f.pushed_filters:
        if pf.strip():
            lines.append(f"pushed: {pf}")
    return "\n".join(lines)


def executed_shuffle_bytes(df: DataFrame) -> int:
    """Execute THIS DataFrame's plan and return total shuffle bytes written
    across every exchange in the executed (post-AQE) physical plan — the
    cost number exchange COUNTS can't give (a 16-byte 1-row broadcast and a
    full-corpus repartition both count as one exchange; only bytes separate
    them). Used by gen_plan_inventory's --exec-bytes census so plan
    regressions surface as byte growth, not just shape changes.

    Traversal notes: AQE wraps the plan in AdaptiveSparkPlanExec (final plan
    behind .executedPlan()); materialized stages hide their exchange behind
    *QueryStageExec.plan(); ReusedExchangeExec is NOT followed (the reused
    shuffle was written once, and following it would double-count)."""
    df.collect()  # populate metrics on this exact queryExecution
    total = 0
    seen: set[int] = set()

    def walk(node) -> None:
        nonlocal total
        if node is None:
            return
        ident = node.id() if hasattr(node, "id") else id(node)
        cls = node.getClass().getSimpleName()
        if cls == "ReusedExchangeExec":
            return
        key = (cls, ident)
        if key in seen:
            return
        seen.add(key)
        if cls == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
            return
        if cls.endswith("QueryStageExec"):
            walk(node.plan())
            return
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == "shuffleBytesWritten":
                total += kv._2().value()
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))
        # subqueries (scalar/ IN) execute their own stages
        sq = node.subqueries()
        for i in range(sq.size()):
            walk(sq.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return int(total)
