"""Generate PLANS.md: a one-row-per-query census of physical-plan facts.

Usage: python tools/gen_plan_inventory.py [sf_dir]

Complements tests/test_plans.py (which PINS the invariants that must never
regress) with a full-surface inventory the next person can diff after plan-
affecting changes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamds_spark.plans.audit import plan_facts
from streamds_spark.registry import load_all
from streamds_spark.session import get_spark

HEADER = """# Physical-plan inventory (auto-generated)

`python tools/gen_plan_inventory.py` — one row per registry query, extracted from
`explain("formatted")` at sf0.001 (pre-execution, AQE initial plan; exchange
counts are therefore upper bounds — AQE stage reuse and localCheckpoint
materialization reduce them at runtime). The plan-shape invariants that matter
are additionally PINNED by tests/test_plans.py; this table is the full-surface
census behind those pins.

Reading guide: `single-part exchanges` are global serialization points — only
acceptable when the windowed/aggregated relation is provably small (global
ntile/rank over aggregate rows, 1-row thresholds). `join` shows the planned
strategy for the query's joins (broadcast is the goal for dim-sized sides).

| query | exchanges | single-part | join | partial agg | take-ordered |
|---|---|---|---|---|---|
"""


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    specs = load_all()
    spark = get_spark("plansweep")
    rows = []
    for qname, spec in specs.items():
        try:
            f = plan_facts(spec.fn(spark, sf_dir))
            join = (
                "broadcast"
                if f.has_broadcast_join
                else ("sortmerge" if f.has_sortmerge_join else "—")
            )
            rows.append(
                (
                    qname,
                    f.n_exchanges,
                    f.n_single_partition,
                    join,
                    "yes" if f.has_partial_agg else "—",
                    "yes" if f.has_take_ordered else "—",
                )
            )
        except Exception as e:  # keep sweeping; a broken query shows as ERROR
            rows.append((qname, -1, -1, f"ERROR {e}", "", ""))
    out_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out_path, "w") as out:
        out.write(HEADER)
        for r in sorted(rows):
            out.write("| " + " | ".join(str(x) for x in r) + " |\n")
    errs = [r for r in rows if r[1] == -1]
    print(f"wrote {out_path}: {len(rows)} queries, {len(errs)} errors")
    return 1 if errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
