"""Log-linear (HDR-style) quantile sketch (operators/hdr.py): bucket-map
properties against a pure-Python reference, DuckDB twin parity on the exact
SQL strings the oracle uses, merge-equals-whole, and the rank/relative-error
guarantees quantile extraction rests on."""

from __future__ import annotations

import math
import random

import duckdb
from hypothesis import given
from hypothesis import strategies as st
from pyspark.sql import functions as F

from streamds_spark.operators.hdr import (
    SUB,
    SUBBITS,
    bounds_exprs,
    bucket_expr_duckdb,
    bucket_expr_spark,
    hdr_merge,
    hdr_quantiles,
    hdr_quantiles_by,
    hdr_registers,
)

MAXV = (1 << 63) - 1


def py_bucket(x: int) -> int:
    if x < SUB:
        return x
    s = x.bit_length() - 1 - SUBBITS
    return s * SUB + (x >> s)


def py_bounds(b: int) -> tuple[int, int, int]:
    if b < SUB:
        return b, b, b
    s = b // SUB - 1
    m = b - s * SUB
    lo, hi = m << s, ((m + 1) << s) - 1
    mid = m if s == 0 else (m << s) + (1 << (s - 1))
    return lo, hi, mid


# ---------------------------------------------------------------------- model


@given(st.integers(min_value=0, max_value=MAXV))
def test_bucket_bounds_contain_value(x):
    lo, hi, mid = py_bounds(py_bucket(x))
    assert lo <= x <= hi
    assert lo <= mid <= hi


@given(st.integers(min_value=0, max_value=MAXV - 1), st.integers(1, 1 << 40))
def test_bucket_monotone(x, d):
    assert py_bucket(x) <= py_bucket(min(MAXV, x + d))


@given(st.integers(min_value=SUB, max_value=MAXV))
def test_relative_error_bound(x):
    _, _, mid = py_bounds(py_bucket(x))
    assert abs(mid - x) / x <= 1.0 / SUB


@given(st.integers(min_value=0, max_value=(1 << 63) - 2))
def test_buckets_contiguous(x):
    """Adjacent values map to the same or the next bucket — no gaps, so rank
    queries against bucket order are rank queries against value order."""
    assert py_bucket(x + 1) - py_bucket(x) in (0, 1)


# ------------------------------------------------------------- engine parity


ADVERSARIAL = [
    0, 1, 2, 31, 32, 33, 47, 63, 64, 65, 127, 128, 1000, 10**6,
    2**52, 2**53 - 1, 2**53, 2**53 + 2, 2**57 + 12345, 2**62, MAXV,
]


def test_spark_and_duckdb_match_python_reference(spark):
    rng = random.Random(11)
    vals = ADVERSARIAL + [rng.randint(0, MAXV) for _ in range(300)]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    duck = dict(con.execute(f"SELECT v, {bucket_expr_duckdb('v')} FROM t").fetchall())
    sp = dict(
        spark.createDataFrame([(v,) for v in vals], "v long")
        .selectExpr("v", f"{bucket_expr_spark('v')} AS b")
        .collect()
    )
    for v in vals:
        assert duck[v] == sp[v] == py_bucket(v), v
    # bounds inversion agrees too, on every distinct bucket seen
    lo, hi, mid = bounds_exprs("bucket")
    bks = sorted({py_bucket(v) for v in vals})
    con.execute("CREATE TABLE bt(bucket INT)")
    con.executemany("INSERT INTO bt VALUES (?)", [(b,) for b in bks])
    duckb = {
        r[0]: tuple(r[1:])
        for r in con.execute(f"SELECT bucket, {lo}, {hi}, {mid} FROM bt").fetchall()
    }
    spb = {
        r[0]: tuple(r[1:])
        for r in spark.createDataFrame([(b,) for b in bks], "bucket int")
        .selectExpr("bucket", f"{lo} AS lo", f"{hi} AS hi", f"{mid} AS mid")
        .collect()
    }
    for b in bks:
        assert duckb[b] == spb[b] == py_bounds(b), b


# ------------------------------------------------------- sketch-level checks


def test_merge_equals_whole_and_replay_adds(spark):
    df = spark.range(0, 5000).selectExpr("id * 37 % 9973 AS v")
    whole = {r["bucket"]: r["cnt"] for r in hdr_registers(df, "v").collect()}
    chunks = [
        hdr_registers(df.filter((F.col("v") % 3) == i), "v") for i in range(3)
    ]
    merged = {r["bucket"]: r["cnt"] for r in hdr_merge(*chunks).collect()}
    assert merged == whole
    # counting sketch: re-delivery DOUBLES counts (not idempotent by design —
    # replay safety is the appendlog manifest's job, as for every count agg)
    dup = {r["bucket"]: r["cnt"] for r in hdr_merge(chunks[0], chunks[0]).collect()}
    single = {r["bucket"]: r["cnt"] for r in chunks[0].collect()}
    assert dup == {b: 2 * c for b, c in single.items()}


def test_negative_and_null_excluded(spark):
    df = spark.createDataFrame(
        [(-5,), (None,), (0,), (7,), (40,)], "v long"
    )
    regs = {r["bucket"]: r["cnt"] for r in hdr_registers(df, "v").collect()}
    assert regs == {0: 1, 7: 1, py_bucket(40): 1}


def test_quantiles_rank_and_error_guarantee(spark):
    rng = random.Random(23)
    data = [rng.randint(0, 10**8) for _ in range(5000)]
    qs = {"p50": 0.5, "p90": 0.9, "p99": 0.99, "p100": 1.0}
    out = {
        r["tag"]: r
        for r in hdr_quantiles(
            hdr_registers(spark.createDataFrame([(v,) for v in data], "v long"), "v"),
            qs,
        ).collect()
    }
    data.sort()
    n = len(data)
    for tag, q in qs.items():
        row = out[tag]
        rank = max(1, math.ceil(q * n))
        assert row["rank"] == rank and row["n"] == n
        exact = data[rank - 1]
        # the true rank-statistic lies inside the chosen bucket's bounds
        assert row["lo"] <= exact <= row["hi"]
        assert abs(row["mid"] - exact) <= max(exact, 1) / SUB + 1


def test_grouped_quantiles_match_global_per_group(spark):
    rng = random.Random(5)
    rows = [(f"g{i % 3}", rng.randint(0, 10**6)) for i in range(3000)]
    df = spark.createDataFrame(rows, "g string, v long")
    qs = {"p50": 0.5, "p95": 0.95}
    grouped = {
        (r["g"], r["tag"]): (r["bucket"], r["rank"], r["n"])
        for r in hdr_quantiles_by(
            hdr_registers(df, "v", by=["g"]), ["g"], qs
        ).collect()
    }
    for g in ("g0", "g1", "g2"):
        solo = {
            r["tag"]: (r["bucket"], r["rank"], r["n"])
            for r in hdr_quantiles(
                hdr_registers(df.filter(F.col("g") == g), "v"), qs
            ).collect()
        }
        for tag in qs:
            assert grouped[(g, tag)] == solo[tag], (g, tag)


def test_register_count_bounded(spark):
    """The scale invariant: register count is bounded by construction — wide
    value ranges cannot blow up the sketch beyond 32 + 58*32 rows."""
    df = spark.range(0, 20000).selectExpr(
        "CAST(pow(2, id % 60) AS BIGINT) + id AS v"
    )
    n = hdr_registers(df, "v").count()
    assert n <= 32 + 58 * 32


def test_percentile_feature_tracks_exact_rank(spark):
    """doclen_percentile_feature: the sketch-LUT per-mille stays within the
    bucket-granularity error of the exact percentile rank, is monotone in
    value, and spans (0, 1000]."""
    from streamds_spark.registry import load_all

    sf = "/root/testdata/sf0.001"
    rows = load_all()["doclen_percentile_feature"].fn(spark, sf).collect()
    assert rows and all(0 < r["pct_permille"] <= 1000 for r in rows)
    by_len = sorted((r["n_chars"], r["pct_permille"]) for r in rows)
    for (l1, p1), (l2, p2) in zip(by_len, by_len[1:]):
        assert p1 <= p2, "per-mille must be monotone in value"
    # exact rank comparison: permille = 1000*cum(bucket)/n is an upper-rank
    # estimate; exact lower/upper ranks for the value bracket it
    lens = sorted(r["n_chars"] for r in rows)
    n = len(lens)
    import bisect

    for r in rows[:200]:
        hi_rank = bisect.bisect_right(lens, r["n_chars"])
        # bucket cum >= # values <= this value (bucket holds a value range)
        assert r["pct_permille"] >= (1000 * hi_rank) // n - 32, r
        # and <= # values <= bucket's hi bound; bound by bucket granularity
        assert r["pct_permille"] <= (1000 * hi_rank) // n + 1000 // 32 + 32, r


def test_time_to_convert_brackets_exact_latency(spark):
    """time_to_convert_quantiles: bucket bounds must bracket the exact
    rank-statistic of the per-user view->purchase latency."""
    import duckdb

    from streamds_spark.registry import load_all

    sf = "/root/testdata/sf0.001"
    got = {r["tag"]: r for r in load_all()["time_to_convert_quantiles"].fn(spark, sf).collect()}
    deltas = sorted(
        r[0]
        for r in duckdb.sql(
            f"""WITH e AS (SELECT * FROM '{sf}/events.parquet'),
            v AS (SELECT user_id, min(ts) AS tv FROM e WHERE event_type='view' GROUP BY 1),
            p AS (SELECT e.user_id, min(e.ts) AS tp FROM e JOIN v ON e.user_id=v.user_id
                  WHERE e.event_type='purchase' AND e.ts > v.tv GROUP BY 1)
            SELECT (epoch_us(tp)-epoch_us(tv))//1000000 FROM p JOIN v USING (user_id)"""
        ).fetchall()
    )
    n = len(deltas)
    assert n > 0 and all(r["n"] == n for r in got.values())
    for tag, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
        rank = max(1, math.ceil(q * n))
        exact = deltas[rank - 1]
        assert got[tag]["lo"] <= exact <= got[tag]["hi"], (tag, exact)


@given(
    st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=60),
    st.floats(min_value=0.01, max_value=1.0),
)
def test_quantile_rank_bracket_property(xs, q):
    """Pure-model hypothesis property: for ANY multiset and ANY q, the bucket
    chosen by the rank rule brackets the exact rank statistic (the guarantee
    hdr_quantiles' SQL implements — verified here against the same Python
    bucket model the engines are pinned to)."""
    import math as m

    regs = {}
    for x in xs:
        b = py_bucket(x)
        regs[b] = regs.get(b, 0) + 1
    n = len(xs)
    rank = max(1, m.ceil(q * n))
    cum = 0
    chosen = None
    for b in sorted(regs):
        cum += regs[b]
        if cum >= rank:
            chosen = b
            break
    lo, hi, mid = py_bounds(chosen)
    exact = sorted(xs)[rank - 1]
    assert lo <= exact <= hi
    assert lo <= mid <= hi


# --------------------------------------------------------------- signed twin


MINV = -(1 << 63)


def py_bucket_signed(x: int) -> int:
    return py_bucket(x) if x >= 0 else -1 - py_bucket(-(x + 1))


def py_bounds_signed(b: int) -> tuple[int, int, int]:
    if b >= 0:
        return py_bounds(b)
    lo_p, hi_p, mid_p = py_bounds(-b - 1)
    return -hi_p - 1, -lo_p - 1, -mid_p - 1


@given(st.integers(min_value=MINV, max_value=MAXV))
def test_signed_bucket_bounds_contain_value(x):
    lo, hi, mid = py_bounds_signed(py_bucket_signed(x))
    assert lo <= x <= hi
    assert lo <= mid <= hi


@given(st.integers(min_value=MINV, max_value=MAXV - 1))
def test_signed_buckets_contiguous_and_monotone(x):
    """The signed map is monotone with no gaps across the whole BIGINT range
    — including the 0/-1 seam — so cumulative-rank extraction over bucket
    order is extraction over value order."""
    assert py_bucket_signed(x + 1) - py_bucket_signed(x) in (0, 1)


@given(st.integers(min_value=MINV, max_value=-1))
def test_signed_mirror_symmetry(x):
    """bucket(-x - 1) mirrors: |signed bucket of x| - 1 == bucket(|x| - 1)."""
    assert py_bucket_signed(x) == -1 - py_bucket(-x - 1)


def test_signed_spark_duckdb_python_three_way(spark):
    from streamds_spark.operators.hdr import (
        signed_bounds_exprs,
        signed_bucket_expr,
    )

    rng = random.Random(13)
    vals = (
        [MINV, MINV + 1, -(2**53) - 1, -(2**53), -1000, -33, -32, -31, -2, -1]
        + ADVERSARIAL
        + [rng.randint(MINV, MAXV) for _ in range(300)]
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    duck = dict(
        con.execute(f"SELECT v, {signed_bucket_expr('v', 'duckdb')} FROM t").fetchall()
    )
    sp = dict(
        spark.createDataFrame([(v,) for v in vals], "v long")
        .selectExpr("v", f"{signed_bucket_expr('v', 'spark')} AS b")
        .collect()
    )
    for v in vals:
        assert duck[v] == sp[v] == py_bucket_signed(v), v
    lo, hi, mid = signed_bounds_exprs("bucket")
    got = con.execute(
        f"SELECT DISTINCT {signed_bucket_expr('v', 'duckdb')} AS bucket, "
        f"{lo} AS lo, {hi} AS hi, {mid} AS mid FROM t"
    ).fetchall()
    for b, lo_, hi_, mid_ in got:
        assert (lo_, hi_, mid_) == py_bounds_signed(b), b


def test_signed_quantiles_bracket_exact_rank(spark):
    """Signed-sketch quantiles: the true rank-th order statistic of a mixed-
    sign multiset lands inside the reported [lo, hi] for every q, and the
    register count respects the doubled bound."""
    from streamds_spark.operators.hdr import hdr_quantiles, hdr_registers_signed

    rng = random.Random(7)
    vals = [rng.randint(-10**6, 10**6) for _ in range(4000)] + [0, -1, 1]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    regs = hdr_registers_signed(df, "v")
    assert regs.count() <= 2 * 1888
    qs = {"p01": 0.01, "p50": 0.5, "p99": 0.99}
    rows = hdr_quantiles(regs, qs, signed=True).collect()
    srt = sorted(vals)
    assert len(rows) == len(qs)
    for r in rows:
        true_val = srt[r["rank"] - 1]
        assert r["lo"] <= true_val <= r["hi"], (r, true_val)
        assert r["n"] == len(vals)
