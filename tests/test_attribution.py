"""attribution_multi_touch: pure-Python reference over the real events table,
plus a hand-built scenario pinning the window boundary (strictly > conv_ts
minus 7 days), event_id tie-breaks, touchless conversions, and the
integer micro-credit arithmetic."""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

import duckdb

from streamds_spark.registry import load_all

SF = "/root/testdata/sf0.001"
TOUCH_TYPES = ("click", "view", "signup")


def _py_attribution(events):
    """events: (event_id, user_id, event_type, ts) tuples."""
    conv = [(e, u, ts) for e, u, t, ts in events if t == "purchase"]
    by_user = defaultdict(list)
    for e, u, t, ts in events:
        if t in TOUCH_TYPES:
            by_user[u].append((ts, e, t))
    first = defaultdict(int)
    last = defaultdict(int)
    micro = defaultdict(int)
    ntouch = defaultdict(int)
    for conv_id, u, cts in conv:
        path = sorted(
            (ts, e, t)
            for ts, e, t in by_user.get(u, [])
            if ts <= cts and ts > cts - dt.timedelta(days=7)
        )
        if not path:
            continue
        first[path[0][2]] += 1
        last[path[-1][2]] += 1
        for _, _, t in path:
            micro[t] += 1000000 // len(path)
            ntouch[t] += 1
    return first, last, micro, ntouch


def test_attribution_matches_python_reference(spark):
    rows = {
        r["touch_type"]: r
        for r in load_all()["attribution_multi_touch"].fn(spark, SF).collect()
    }
    events = duckdb.sql(
        f"SELECT event_id, user_id, event_type, ts FROM '{SF}/events.parquet'"
    ).fetchall()
    first, last, micro, ntouch = _py_attribution(events)
    assert set(rows) == set(ntouch)
    for t in rows:
        assert rows[t]["first_touch"] == first[t], t
        assert rows[t]["last_touch"] == last[t], t
        assert rows[t]["linear_micro"] == micro[t], t
        assert rows[t]["n_touches"] == ntouch[t], t


def test_attribution_boundary_and_ties(spark, tmp_path):
    base = dt.datetime(2024, 1, 10, 0, 0, 0)
    rows = [
        # u1: purchase with 3 in-window touches, two tied on ts (ids 11 < 12)
        (1, 1, "purchase", base),
        (11, 1, "click", base - dt.timedelta(days=1)),
        (12, 1, "view", base - dt.timedelta(days=1)),  # tie → id 11 is first
        (13, 1, "signup", base),  # touch AT conv_ts → included, is last
        # boundary: exactly conv_ts - 7 days → EXCLUDED (strict >)
        (14, 1, "click", base - dt.timedelta(days=7)),
        # u2: purchase with no touches → no credit anywhere
        (2, 2, "purchase", base),
        # u3: touch only AFTER the purchase → excluded
        (3, 3, "purchase", base),
        (31, 3, "click", base + dt.timedelta(hours=1)),
    ]
    import pandas as pd

    df = pd.DataFrame(
        [
            {
                "event_id": e,
                "ts": ts,
                "user_id": u,
                "event_type": t,
                "value": 1.0,
                "props": "{}",
            }
            for e, u, t, ts in rows
        ]
    )
    df.to_parquet(str(tmp_path / "events.parquet"))
    got = {
        r["touch_type"]: r
        for r in load_all()["attribution_multi_touch"].fn(spark, str(tmp_path)).collect()
    }
    # one conversion with path [click(11), view(12), signup(13)]
    assert set(got) == {"click", "view", "signup"}
    assert got["click"]["first_touch"] == 1 and got["click"]["last_touch"] == 0
    assert got["signup"]["last_touch"] == 1 and got["signup"]["first_touch"] == 0
    assert got["view"]["first_touch"] == got["view"]["last_touch"] == 0
    for t in got:
        assert got[t]["n_touches"] == 1
        assert got[t]["linear_micro"] == 1000000 // 3


def test_hourly_burst_matches_python(spark):
    """hourly_burst_anomalies: integer cross-multiply flag vs a Python
    recompute over the real events table."""
    got = {
        (r["event_type"], r["hour_bucket"]): (r["cnt"], r["n_hours"], r["total"])
        for r in load_all()["hourly_burst_anomalies"].fn(spark, SF).collect()
    }
    ev = duckdb.sql(
        f"SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S'),"
        f" count(*) FROM '{SF}/events.parquet' GROUP BY 1, 2"
    ).fetchall()
    per_type = defaultdict(list)
    for t, h, c in ev:
        per_type[t].append((h, c))
    want = {}
    for t, rows in per_type.items():
        n_hours = len(rows)
        total = sum(c for _, c in rows)
        for h, c in rows:
            if c * n_hours > 2 * total:
                want[(t, h)] = (c, n_hours, total)
    assert got == want and len(want) > 0


def test_revenue_concentration_matches_python(spark):
    """revenue_concentration: Gini + top-decile share vs an exact Python
    recompute (same half-up cents, same ascending rank order)."""
    import math

    row = load_all()["revenue_concentration"].fn(spark, SF).first()
    cents = defaultdict(int)
    for ck, price in duckdb.sql(
        f"SELECT o_custkey, o_totalprice FROM '{SF}/orders.parquet'"
    ).fetchall():
        cents[ck] += math.floor(price * 100 + 0.5)
    xs = sorted(cents.values())
    n, total = len(xs), sum(xs)
    weighted = sum((i + 1) * x for i, x in enumerate(xs))
    k = math.ceil(n / 10)
    topk = sum(xs[n - k:])
    assert row["n"] == n and row["total_cents"] == total
    assert row["weighted_cents"] == weighted
    assert row["top_decile_cents"] == topk
    gini = 2 * weighted / (n * total) - (n + 1) / n
    assert abs(row["gini_r"] - round(gini, 4)) <= 1e-9
    assert 0 <= row["gini_r"] < 1 and row["top_decile_share_r"] >= 0.1


def test_weekday_uniformity_matches_python(spark):
    """weekday_seasonality_uniformity: exact scaled chi-square numerator vs
    a Python recompute (strftime %w weekday convention)."""
    rows = {
        r["event_type"]: r
        for r in load_all()["weekday_seasonality_uniformity"].fn(spark, SF).collect()
    }
    ev = duckdb.sql(
        f"SELECT event_type, CAST(strftime(ts, '%w') AS INT), count(*)"
        f" FROM '{SF}/events.parquet' GROUP BY 1, 2"
    ).fetchall()
    per = defaultdict(dict)
    for t, d, c in ev:
        per[t][d] = c
    assert set(rows) == set(per)
    for t, dows in per.items():
        total = sum(dows.values())
        sq = sum((7 * c - total) ** 2 for c in dows.values())
        r = rows[t]
        assert r["total"] == total and r["n_dows"] == len(dows)
        assert r["sq_dev_x49"] == sq
        assert r["peak_cnt"] == max(dows.values())
        assert r["trough_cnt"] == min(dows.values())


def test_decayed_scores_match_python(spark):
    """decayed_event_type_scores: integer shift-weights vs Python recompute."""
    rows = {
        r["event_type"]: (r["decayed_score_micro"], r["total_cnt"])
        for r in load_all()["decayed_event_type_scores"].fn(spark, SF).collect()
    }
    daily = duckdb.sql(
        f"SELECT event_type, CAST(ts AS DATE), count(*)"
        f" FROM '{SF}/events.parquet' GROUP BY 1, 2"
    ).fetchall()
    d0 = max(d for _, d, _ in daily)
    want = defaultdict(lambda: [0, 0])
    for t, d, c in daily:
        age = min((d0 - d).days, 62)
        want[t][0] += c * (1000000 >> age)
        want[t][1] += c
    assert rows == {t: tuple(v) for t, v in want.items()}
