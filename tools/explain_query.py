"""Print the physical-plan audit for registry queries.

Usage: python tools/explain_query.py <query_name> [sf_dir]
       python tools/explain_query.py --all [sf_dir]   # one-line facts per query

The per-query view shows the formatted plan plus the extracted facts
(pushdown, pruning, join strategy, exchanges) used by tests/test_plans.py —
the loop for checking that a new operator compiles to the plan you'd want
at 100 TB, not just one that passes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamds_spark.plans.audit import formatted_plan, plan_facts
from streamds_spark.registry import load_all
from streamds_spark.session import get_spark


def main() -> int:
    args = [a for a in sys.argv[1:]]
    if not args:
        print(__doc__)
        return 1
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.001"
    specs = load_all()
    spark = get_spark("explain")
    if name == "--all":
        for qname, spec in specs.items():
            try:
                f = plan_facts(spec.fn(spark, sf_dir))
                print(
                    f"{qname}: exchanges={f.n_exchanges} single_part={f.n_single_partition} "
                    f"bcast={int(f.has_broadcast_join)} smj={int(f.has_sortmerge_join)} "
                    f"partial_agg={int(f.has_partial_agg)} take_ordered={int(f.has_take_ordered)}"
                )
            except Exception as e:  # keep sweeping
                print(f"{qname}: ERROR {e}")
        return 0
    if name not in specs:
        print(f"unknown query {name!r}; known: {', '.join(sorted(specs))}")
        return 1
    df = specs[name].fn(spark, sf_dir)
    print(formatted_plan(df))
    f = plan_facts(df)
    print(f"exchanges={f.n_exchanges} single_partition={f.n_single_partition}")
    print(f"broadcast_join={f.has_broadcast_join} sortmerge_join={f.has_sortmerge_join}")
    print(f"partial_agg={f.has_partial_agg} take_ordered={f.has_take_ordered}")
    for s in f.read_schemas:
        print("read_schema:", s)
    for p in f.pushed_filters:
        print("pushed:", p)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
