"""EWMA daily-orders query: the cross-engine left-fold must equal a pure-
Python recurrence exactly (same op order), and obey the smoothing
invariants."""

from __future__ import annotations

import duckdb

from streamds_spark.registry import load_all

SF = "/root/testdata/sf0.001"
ALPHA = 0.2


def test_ewma_matches_python_fold(spark):
    rows = load_all()["ewma_daily_orders"].fn(spark, SF).collect()
    assert len(rows) > 500
    # python reference over the same daily counts
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet'")
    daily = con.execute(
        "SELECT o_orderdate, count(*) FROM orders GROUP BY 1 ORDER BY 1"
    ).fetchall()
    s = None
    want = []
    for day, n in daily:
        s = float(n) if s is None else ALPHA * n + (1 - ALPHA) * s
        want.append(round(s, 4) + 0.0)
    assert [r["ewma"] for r in rows] == want
    assert [r["n_orders"] for r in rows] == [n for _, n in daily]
    # invariants: first value is the raw count; every EWMA lies within the
    # running [min, max] of the counts seen so far (convexity of the fold)
    assert rows[0]["ewma"] == float(rows[0]["n_orders"])
    lo = hi = float(daily[0][1])
    for r, (_, n) in zip(rows, daily):
        lo, hi = min(lo, float(n)), max(hi, float(n))
        assert lo - 1e-9 <= r["ewma"] <= hi + 1e-9
