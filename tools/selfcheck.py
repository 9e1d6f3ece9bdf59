"""Mimic the driver's correctness gate locally: run every registered query in
Spark AND its DuckDB oracle on the same sf dir; compare row count, column names,
and order-insensitive value multiset.

Usage: python tools/selfcheck.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from streamds_spark.catalog import TABLES
from streamds_spark.registry import load_all
from streamds_spark.session import get_spark


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # match driver-ish canonicalization: trim float noise
        return f"{v:.6g}"
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    return str(v)


def type_kind(t: str) -> str:
    """Canonical type kind for cross-engine schema comparison.

    Catches width/family divergences that str(value) hides — e.g. DuckDB sums
    INTEGER into HUGEINT (arrow decimal128), which the driver's value-hash sees
    as different from Spark's BIGINT even though str() of the cells match
    (round-1 sessionize_events failure mode).
    """
    t = t.lower()
    if t.startswith(("decimal", "hugeint")):
        return "decimal"
    if t.startswith(("tinyint", "smallint", "int", "bigint", "uint", "byte", "short", "long")):
        return "int"
    if t.startswith(("float", "double", "halffloat")):
        return "float"
    if t.startswith(("string", "large_string", "utf8", "varchar")):
        return "str"
    if t.startswith("date"):
        return "date"
    if t.startswith("timestamp"):
        return "ts"
    if t.startswith("bool"):
        return "bool"
    if t.startswith(("array", "list", "large_list")):
        return "list"
    return t


def to_multiset(rows, colnames):
    """Order-insensitive canonical form, with DRIVER-PARITY cell handling.

    The driver sorts-then-hashes RAW cells; a list/map cell raises
    `TypeError: unhashable type` there and turns the row red even when the
    values are correct (CORRECTNESS_r03.json feature_hash_vectors). This
    harness used to stringify cells BEFORE sorting, which silently tolerated
    complex cells — exactly the divergence that let that query pass locally
    and fail the gate. Reproduce the driver's behavior: hash the first
    non-null raw value of every column up front so complex output columns
    fail here first.
    """
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    raw = [tuple(r[i] for i in order) for r in rows]
    for j, name in enumerate(sorted(colnames)):
        v = next((row[j] for row in raw if row[j] is not None), None)
        try:
            hash(v)
        except TypeError:
            raise TypeError(
                f"driver-canonicalization parity: column {name!r} holds "
                f"unhashable cells ({type(v).__name__}) — the driver's "
                "sort-then-hash crashes on these; array_join the column"
            ) from None
    return sorted(tuple(norm_cell(c) for c in row) for row in raw)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    specs = load_all()
    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t + '.parquet')}'"
        )

    n_pass = n_fail = n_rowsonly = 0
    for name, spec in sorted(specs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = spec.fn(spark, sf_dir)
            srows = df.collect()
            scols = df.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"ROWS {name}: {len(srows)} rows (no oracle)  [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            ores = con.execute(spec.oracle)
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(ocols)}")
        else:
            otypes = {
                f.name: type_kind(str(f.type))
                for f in con.execute(spec.oracle).arrow().schema
            }
            stypes = {f.name: type_kind(f.dataType.simpleString()) for f in df.schema.fields}
            mismatch = {
                c: (stypes[c], otypes[c]) for c in stypes if stypes[c] != otypes.get(c)
            }
            if mismatch:
                problems.append(f"type kinds differ spark-vs-duckdb: {mismatch}")
        if not problems:
            try:
                sm = to_multiset([tuple(r) for r in srows], scols)
                om = to_multiset(orows, ocols)
            except TypeError as e:  # driver-parity unhashable-cell crash
                problems.append(str(e))
            else:
                if sm != om:
                    diffs = [(a, b) for a, b in zip(sm, om) if a != b][:3]
                    problems.append(f"values differ; first diffs: {diffs}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}  [{time.time()-t0:.1f}s]")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows  [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
