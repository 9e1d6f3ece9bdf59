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
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(specs)} queries ({n_oracle} oracle)")


if __name__ == "__main__":
    main()
