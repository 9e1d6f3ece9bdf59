"""Round-12 slow-test marking (VERDICT r11 item 2): read per-test duration
TSVs (from the conftest SPARK_GRAFT_TEST_TIMINGS hook), take the max
duration seen per test function, and insert `@pytest.mark.slow` above every
test whose duration exceeds the threshold. Idempotent (skips already-marked
functions). Prints a summary of marked seconds vs kept seconds.

Usage: python tools/r12_mark_slow.py --threshold 5.0 t1.tsv [t2.tsv ...]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=5.0)
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("tsvs", nargs="+")
    args = ap.parse_args()

    # max per nodeid across sources (a file may be timed twice), then SUM
    # over a function's parametrized cases — the budget pays the sum
    per_node: dict[str, float] = {}
    for path in args.tsvs:
        with open(path) as f:
            for line in f:
                d, nodeid = line.rstrip("\n").split("\t", 1)
                per_node[nodeid] = max(per_node.get(nodeid, 0.0), float(d))
    durs: dict[tuple[str, str], float] = {}
    for nodeid, d in per_node.items():
        parts = nodeid.split("::")
        fn = re.sub(r"\[.*\]$", "", parts[-1])
        key = (parts[0], fn)
        durs[key] = durs.get(key, 0.0) + d

    slow = {k: v for k, v in durs.items() if v > args.threshold}
    kept_s = sum(v for k, v in durs.items() if k not in slow)
    print(
        f"{len(durs)} timed tests; marking {len(slow)} "
        f"({sum(slow.values()):.0f} s) as slow; kept ~{kept_s:.0f} s",
        file=sys.stderr,
    )

    by_file: dict[str, set[str]] = {}
    for (fp, fn) in slow:
        by_file.setdefault(fp, set()).add(fn)

    for fp, fns in sorted(by_file.items()):
        full = os.path.join(REPO, fp)
        src = open(full).read()
        lines = src.splitlines(keepends=True)
        out = []
        marked = 0
        for i, line in enumerate(lines):
            m = re.match(r"^(\s*)def (test_\w+)\(", line)
            if m and m.group(2) in fns:
                indent = m.group(1)
                # already marked directly above (possibly among decorators)?
                j = len(out) - 1
                already = False
                while j >= 0 and out[j].lstrip().startswith("@"):
                    if "pytest.mark.slow" in out[j]:
                        already = True
                    j -= 1
                if not already:
                    out.append(f"{indent}@pytest.mark.slow\n")
                    marked += 1
            out.append(line)
        if marked and not args.dry_run:
            if "import pytest" not in src:
                # insert after the last top-of-file import block line
                for k, line in enumerate(out):
                    if line.startswith(("import ", "from ")):
                        last_imp = k
                out.insert(last_imp + 1, "import pytest\n")
            open(full, "w").write("".join(out))
        print(f"{fp}: marked {marked}", file=sys.stderr)


if __name__ == "__main__":
    main()
