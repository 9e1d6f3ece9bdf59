"""Generate PLANS.md: a one-row-per-query census of physical-plan facts.

Usage: python tools/gen_plan_inventory.py [sf_dir] [--exec-bytes]

Complements tests/test_plans.py (which PINS the invariants that must never
regress) with a full-surface inventory the next person can diff after plan-
affecting changes.

--exec-bytes additionally EXECUTES every query and records total shuffle
bytes written (post-AQE executed plan, reused exchanges counted once) — the
cost dimension exchange counts can't see. When the previous PLANS.md carried
a bytes column, any query whose bytes grew >2× (above a 1 MB floor, to skip
kilobyte noise) is flagged to stdout and in the file footer: that is the
regression guard — investigate or re-justify before committing the new
census. Bytes sweeps are meant for sf0.1 (pass the sf dir explicitly).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamds_spark.plans.audit import executed_shuffle_bytes, plan_facts
from streamds_spark.registry import load_all
from streamds_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

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
`shuffle KB` (present when the census ran with --exec-bytes) is total shuffle
bytes WRITTEN by the executed post-AQE plan{bytes_note} — the cost a count of
exchanges can't see; `—` means the sweep didn't execute (shape-only run).
The generator flags any query whose bytes grew >2× vs the previous census
(1 MB floor) — the byte-growth regression guard.

| query | exchanges | single-part | join | partial agg | take-ordered | shuffle KB |
|---|---|---|---|---|---|---|
"""


def _read_prev_bytes(path: str) -> dict[str, float]:
    """Parse the previous census's shuffle-KB column (if present)."""
    prev: dict[str, float] = {}
    if not os.path.exists(path):
        return prev
    with open(path) as f:
        for line in f:
            m = re.match(r"\| (\S+) \| .* \| ([0-9.]+|—) \|$", line.strip())
            if m and m.group(2) != "—":
                try:
                    prev[m.group(1)] = float(m.group(2))
                except ValueError:
                    pass
    return prev


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--exec-bytes"]
    exec_bytes = "--exec-bytes" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    specs = load_all()
    spark = get_spark("plansweep")
    out_path = os.path.join(REPO, "PLANS.md")
    prev_bytes = _read_prev_bytes(out_path)

    rows = []
    for qname, spec in specs.items():
        try:
            df = spec.fn(spark, sf_dir)
            f = plan_facts(df)
            join = (
                "broadcast"
                if f.has_broadcast_join
                else ("sortmerge" if f.has_sortmerge_join else "—")
            )
            kb = "—"
            if exec_bytes:
                kb = round(executed_shuffle_bytes(spec.fn(spark, sf_dir)) / 1024.0, 1)
            rows.append(
                (
                    qname,
                    f.n_exchanges,
                    f.n_single_partition,
                    join,
                    "yes" if f.has_partial_agg else "—",
                    "yes" if f.has_take_ordered else "—",
                    kb,
                )
            )
        except Exception as e:  # keep sweeping; a broken query shows as ERROR
            rows.append((qname, -1, -1, f"ERROR {e}", "", "", "—"))

    flagged = []
    if exec_bytes:
        for r in rows:
            if r[6] == "—" or r[0] not in prev_bytes:
                continue
            old, new = prev_bytes[r[0]], float(r[6])
            if new > 2 * old and new > 1024:  # >2× growth above a 1 MB floor
                flagged.append((r[0], old, new))

    bytes_note = f" at {sf_dir}" if exec_bytes else ""
    with open(out_path, "w") as out:
        out.write(HEADER.format(bytes_note=bytes_note))
        for r in sorted(rows):
            out.write("| " + " | ".join(str(x) for x in r) + " |\n")
        if flagged:
            out.write("\n## BYTE-GROWTH FLAGS (>2× vs previous census)\n\n")
            for q, old, new in flagged:
                out.write(f"- **{q}**: {old} KB → {new} KB\n")
    errs = [r for r in rows if r[1] == -1]
    print(f"wrote {out_path}: {len(rows)} queries, {len(errs)} errors")
    for q, old, new in flagged:
        print(f"BYTE-GROWTH FLAG {q}: {old} KB -> {new} KB")
    return 1 if errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
