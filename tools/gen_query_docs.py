"""Generate QUERIES.md from the registry — one row per query with its
verification mode and docstring summary. Run: python tools/gen_query_docs.py"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamds_spark.registry import load_all


def main() -> None:
    specs = load_all()
    n_oracle = sum(1 for s in specs.values() if s.oracle)
    lines = [
        "# QUERIES — registered operator inventory (auto-generated)",
        "",
        f"{len(specs)} queries: {n_oracle} DuckDB-oracle hash-checked, "
        f"{len(specs) - n_oracle} rows-only (justification in each docstring).",
        "Regenerate with `python tools/gen_query_docs.py`.",
        "",
        "| query | check | summary |",
        "|---|---|---|",
    ]
    for name in sorted(specs):
        s = specs[name]
        mode = "oracle" if s.oracle else "rows-only"
        doc = " ".join((s.doc or "").split())
        if len(doc) > 160:
            doc = doc[:157] + "..."
        lines.append(f"| `{name}` | {mode} | {doc} |")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(root, "QUERIES.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(specs)} queries ({n_oracle} oracle)")

    # Rewrite the README count block from the registry so the two can't drift
    # (they did in round 2: README said 133 while the registry held 152).
    readme = os.path.join(root, "README.md")
    with open(readme) as f:
        text = f.read()
    begin, end = "<!-- COUNTS:BEGIN", "<!-- COUNTS:END -->"
    i, j = text.index(begin), text.index(end) + len(end)
    i = text.index("\n", i) + 1  # keep the marker line itself
    block = (
        f"Implemented and oracle-verified: {len(specs)} registered queries, "
        f"{n_oracle} DuckDB-hash-checked\nat sf0.001, sf0.01 AND sf0.1, "
        f"{len(specs) - n_oracle} rows-only by design (see QUERIES.md; per-query\n"
        f"physical-plan census in PLANS.md).\n{end}"
    )
    with open(readme, "w") as f:
        f.write(text[:i] + block + text[j:])
    print(f"rewrote README counts: {len(specs)}/{n_oracle}")


if __name__ == "__main__":
    main()
