"""Funnel / cohort-retention / basket-lift analytics: pure-Python references
plus the structural invariants each shape must obey."""

from __future__ import annotations

from collections import defaultdict

import duckdb

from streamds_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def _events():
    con = duckdb.connect()
    return con.execute(
        f"SELECT user_id, event_type, ts FROM '{SF}/events.parquet' ORDER BY ts"
    ).fetchall()


def test_funnel_matches_python_staging(spark):
    row = load_all()["funnel_conversion"].fn(spark, SF).first()
    ev = _events()
    users = {u for u, _, _ in ev}
    t_view, t_click, t_purch = {}, {}, {}
    for u, typ, ts in ev:  # ts-ordered: first qualifying event wins
        if typ == "view" and u not in t_view:
            t_view[u] = ts
        elif typ == "click" and u in t_view and u not in t_click and ts > t_view[u]:
            t_click[u] = ts
        elif typ == "purchase" and u in t_click and u not in t_purch and ts > t_click[u]:
            t_purch[u] = ts
    assert row["n_users"] == len(users)
    assert row["n_viewed"] == len(t_view)
    assert row["n_clicked"] == len(t_click)
    assert row["n_purchased"] == len(t_purch)
    # funnel monotonicity + rate consistency
    assert row["n_users"] >= row["n_viewed"] >= row["n_clicked"] >= row["n_purchased"]
    assert row["view_to_click"] == round(len(t_click) / len(t_view), 4)
    assert 0.0 <= row["overall_conversion"] <= row["click_to_purchase"] <= 1.0


def test_cohort_offset_zero_equals_cohort_size(spark):
    rows = load_all()["cohort_retention"].fn(spark, SF).collect()
    assert rows
    # every user is active in their own first week -> the offset-0 cell IS
    # the cohort size, and every later offset can only shrink or hold
    by_cohort = defaultdict(dict)
    for r in rows:
        assert r["week_offset"] >= 0
        by_cohort[r["cohort_week"]][r["week_offset"]] = r["n_active"]
    total = 0
    for cohort, cells in by_cohort.items():
        assert 0 in cells, f"cohort {cohort} missing its offset-0 cell"
        assert all(n <= cells[0] for n in cells.values())
        total += cells[0]
    # cohorts partition the user base
    ev = _events()
    assert total == len({u for u, _, _ in ev})


def test_basket_lift_matches_python(spark):
    rows = load_all()["basket_lift_pairs"].fn(spark, SF).collect()
    assert 0 < len(rows) <= 20
    con = duckdb.connect()
    items = con.execute(
        f"SELECT DISTINCT l_orderkey, l_partkey FROM '{SF}/lineitem.parquet'"
    ).fetchall()
    orders = defaultdict(set)
    for o, p in items:
        orders[o].add(p)
    part_cnt = defaultdict(int)
    pair_cnt = defaultdict(int)
    for o, parts in orders.items():
        for p in parts:
            part_cnt[p] += 1
        sp = sorted(parts)
        for i, u in enumerate(sp):
            for v in sp[i + 1 :]:
                pair_cnt[(u, v)] += 1
    n_orders = len(orders)
    lifts = sorted(rows, key=lambda r: (-r["lift"],))
    assert lifts[0]["lift"] == rows[0]["lift"]  # already lift-descending
    for r in rows:
        u, v, c = r["u"], r["v"], r["pair_cnt"]
        assert c == pair_cnt[(u, v)] >= 3
        assert r["confidence"] == round(c / part_cnt[u], 4)
        assert r["lift"] == round(n_orders * c / (part_cnt[u] * part_cnt[v]), 4)
    # the reported top-1 really is the global max lift among qualifying pairs
    best = max(
        round(n_orders * c / (part_cnt[u] * part_cnt[v]), 4)
        for (u, v), c in pair_cnt.items()
        if c >= 3
    )
    assert rows[0]["lift"] == best


def test_rfm_quartiles_balanced(spark):
    """Each metric's quartiles partition the customers with ANSI-ntile sizes
    (difference <= 1), and the census covers every customer exactly once."""
    rows = load_all()["rfm_segments"].fn(spark, SF).collect()
    con = duckdb.connect()
    n_cust = con.execute(
        f"SELECT count(DISTINCT o_custkey) FROM '{SF}/orders.parquet'"
    ).fetchone()[0]
    assert sum(r["n_customers"] for r in rows) == n_cust
    for dim in ("r_q", "f_q", "m_q"):
        per_q = defaultdict(int)
        for r in rows:
            assert 1 <= r[dim] <= 4
            per_q[r[dim]] += r["n_customers"]
        sizes = [per_q[q] for q in (1, 2, 3, 4)]
        assert max(sizes) - min(sizes) <= 1, (dim, sizes)
    assert all(r["avg_monetary"] > 0 for r in rows)


def test_event_runs_python_parity(spark):
    """Run-length encoding per user against a pure-Python pass."""
    rows = {r["user_id"]: r for r in load_all()["event_type_runs"].fn(spark, SF).collect()}
    per_user = defaultdict(list)
    for u, typ, ts in _events():
        per_user[u].append(typ)
    for u, seq in per_user.items():
        runs = []
        for t in seq:
            if runs and runs[-1][0] == t:
                runs[-1][1] += 1
            else:
                runs.append([t, 1])
        r = rows[u]
        assert r["n_runs"] == len(runs)
        assert r["longest_run"] == max(n for _, n in runs)
        assert r["longest_repeat"] == max([n for _, n in runs if n >= 2], default=0)
    assert set(rows) == set(per_user)


def test_weekly_trend_python_parity(spark):
    from datetime import timedelta

    rows = {r["event_type"]: r for r in
            load_all()["weekly_trend_by_event_type"].fn(spark, SF).collect()}
    ev = _events()
    def week_start(ts):
        d = ts.date()
        return d - timedelta(days=d.weekday())
    w0 = min(week_start(ts) for _, _, ts in ev)
    weekly = defaultdict(int)
    for u, typ, ts in ev:
        weekly[(typ, (week_start(ts) - w0).days // 7)] += 1
    for typ in {t for t, _ in weekly}:
        pts = [(wk, y) for (t, wk), y in weekly.items() if t == typ]
        n = len(pts)
        sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts); sxx = sum(x * x for x, _ in pts)
        want = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) + 0.0
        r = rows[typ]
        assert r["n_weeks"] == n and r["total_events"] == sy
        assert r["slope_per_week"] == want


def test_top_user_journeys_python_parity(spark):
    """top_user_journeys: sessionize + path-count in pure Python over the
    real events table; top-20 (count, journey) pairs must match exactly."""
    rows = load_all()["top_user_journeys"].fn(spark, SF).collect()
    got = [(r["journey"], r["n_sessions"]) for r in rows]

    ev = duckdb.sql(
        f"SELECT user_id, event_id, event_type, ts FROM '{SF}/events.parquet'"
        " ORDER BY user_id, ts, event_id"
    ).fetchall()
    per_user = defaultdict(list)
    for u, e, t, ts in ev:
        per_user[u].append((ts, e, t))
    paths = defaultdict(int)
    for u, evs in per_user.items():
        sessions, cur, last = [], [], None
        for ts, e, t in evs:  # already (ts, event_id)-sorted
            if last is None or (ts - last).total_seconds() > 30 * 60:
                cur = []
                sessions.append(cur)
            cur.append(t)
            last = ts
        for s in sessions:
            paths[">".join(s[:5])] += 1
    want = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == want
