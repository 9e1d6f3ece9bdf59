"""Pareto frontier (skyline) operator: the rows not DOMINATED by any other
row — b dominates a when b is at-least-as-good on every objective and
strictly better on at least one (Börzsönyi et al. "The Skyline Operator",
ICDE'01; the distributed local-then-merge shape follows the MapReduce
skyline literature, e.g. MR-BNL in Zhang et al. CloudCom'11).

Two phases, both exact:

  1. LOCAL frontier per Arrow batch (mapInPandas, vectorized numpy
     dominance against the running batch frontier) — map-only, linear
     scan, output bounded by the batch's own frontier. This is the
     distributed workhorse: at 100 TB every partition reduces to its
     local frontier before anything shuffles, and skylines of
     correlated data are SMALL (anti-correlated worst cases grow, but
     per-batch output is still capped by batch size).
  2. GLOBAL dominance anti-join over the unioned local frontiers — the
     theta-join is quadratic only in the CANDIDATE count (local-frontier
     union, usually thousands at most), never the input. A candidate
     survives iff no other candidate dominates it; a true frontier row
     is in its batch's local frontier a fortiori, so phase 1 loses
     nothing (dominance is transitive: if b dominates a then either b
     survives its batch or something dominating b does — and dominates
     a too).

Dominance semantics match SQL NOT EXISTS exactly: duplicate objective
vectors do not dominate each other (no strict inequality), so ALL copies
of a frontier point are kept. Rows with NULL in any objective are
excluded up front (NULL is incomparable; document-and-drop matches the
oracle's WHERE ... IS NOT NULL discipline). Membership is a pure function
of the data — deterministic, hash-exact against a DuckDB NOT EXISTS
replay when the objectives are exact types (integers, dates, decimals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pareto_frontier(
    df: DataFrame,
    minimize: "tuple[str, ...]" = (),
    maximize: "tuple[str, ...]" = (),
) -> DataFrame:
    """All rows of `df` not dominated under the given objectives. Keeps
    every input column; drops rows with NULL in any objective."""
    objs = list(minimize) + list(maximize)
    if not objs:
        raise ValueError("need at least one objective column")
    missing = [c for c in objs if c not in df.columns]
    if missing:
        raise ValueError(f"objective column(s) {missing} not in {df.columns}")
    clean = df.na.drop(subset=objs)
    schema = clean.schema
    mins = list(minimize)
    maxs = list(maximize)

    def local_frontier(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            import numpy as np

            cols = [pdf[c].to_numpy() for c in mins] + [
                pdf[c].to_numpy() for c in maxs
            ]
            flip = [False] * len(mins) + [True] * len(maxs)
            n = len(pdf)
            keep = np.zeros(n, dtype=bool)
            front: list[int] = []  # indices into pdf of the running frontier
            # visit in an order that tends to put dominators first: sort by
            # the first objective (best first) — pure optimization, the
            # dominance test below is what decides membership
            # (no unary negation: dates/strings don't support it — sort
            # ascending and reverse for maximized first objectives)
            order = np.argsort(cols[0], kind="stable")
            if flip[0]:
                order = order[::-1]
            for i in order:
                if front:
                    le = np.ones(len(front), dtype=bool)
                    lt = np.zeros(len(front), dtype=bool)
                    fi = np.asarray(front)
                    for c, fl in zip(cols, flip):
                        fv, v = c[fi], c[i]
                        if fl:
                            le &= fv >= v
                            lt |= fv > v
                        else:
                            le &= fv <= v
                            lt |= fv < v
                    if bool(np.any(le & lt)):
                        continue
                keep[i] = True
                front.append(i)
            yield pdf[keep]

    cand = clean.mapInPandas(local_frontier, schema=schema).localCheckpoint(
        eager=False
    )
    a = cand.alias("a")
    b = cand.alias("b")
    le = F.lit(True)
    lt = F.lit(False)
    for c in mins:
        le = le & (F.col(f"b.{c}") <= F.col(f"a.{c}"))
        lt = lt | (F.col(f"b.{c}") < F.col(f"a.{c}"))
    for c in maxs:
        le = le & (F.col(f"b.{c}") >= F.col(f"a.{c}"))
        lt = lt | (F.col(f"b.{c}") > F.col(f"a.{c}"))
    return a.join(b, le & lt, "left_anti")
