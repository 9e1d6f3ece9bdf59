"""Property-based cross-engine agreement: random small tables through
filter/group/agg/join pipelines must produce identical results in Spark and
DuckDB. Catches semantic drift the hand-written oracle queries don't cover."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20),  # key
        st.integers(min_value=-1000, max_value=1000),  # int value
        st.sampled_from(["a", "b", "c", "d"]),  # category
    ),
    min_size=0,
    max_size=40,
)


def _spark_df(spark, rows):
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("k", IntegerType()),
            StructField("v", IntegerType()),
            StructField("c", StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def _duck(rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k INTEGER, v INTEGER, c VARCHAR)")
    if rows:
        con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    return con


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows_strategy)
@pytest.mark.slow
def test_filter_group_agg_agreement(spark, rows):
    from pyspark.sql import functions as F

    df = _spark_df(spark, rows)
    got = {
        (r["k"], r["cnt"], r["s"])
        for r in df.filter(F.col("v") > 0)
        .groupBy("k")
        .agg(F.count("*").alias("cnt"), F.sum("v").cast("bigint").alias("s"))
        .collect()
    }
    con = _duck(rows)
    want = set(
        con.execute(
            "SELECT k, count(*) AS cnt, CAST(sum(v) AS BIGINT) AS s FROM t WHERE v > 0 GROUP BY k"
        ).fetchall()
    )
    assert got == want


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows_strategy)
@pytest.mark.slow
def test_distinct_and_setops_agreement(spark, rows):
    df = _spark_df(spark, rows)
    got = {tuple(r) for r in df.select("c", "k").distinct().collect()}
    con = _duck(rows)
    want = set(con.execute("SELECT DISTINCT c, k FROM t").fetchall())
    assert got == want


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows_strategy, rows2=rows_strategy)
@pytest.mark.slow
def test_join_agreement(spark, rows, rows2):
    from pyspark.sql import functions as F

    a = _spark_df(spark, rows)
    b = _spark_df(spark, rows2).select(F.col("k"), F.col("c").alias("c2"))
    got = sorted(
        (r["k"], r["c"], r["c2"])
        for r in a.join(b, "k").select("k", "c", "c2").collect()
    )
    con = _duck(rows)
    con.execute("CREATE TABLE t2 (k INTEGER, v INTEGER, c VARCHAR)")
    if rows2:
        con.executemany("INSERT INTO t2 VALUES (?, ?, ?)", rows2)
    want = sorted(
        con.execute("SELECT t.k, t.c, t2.c AS c2 FROM t JOIN t2 ON t.k = t2.k").fetchall()
    )
    assert got == want


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows_strategy)
@pytest.mark.slow
def test_window_rank_agreement(spark, rows):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = _spark_df(spark, rows)
    w = Window.partitionBy("c").orderBy(F.asc("v"), F.asc("k"))
    got = sorted(
        (r["c"], r["k"], r["v"], r["rn"])
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    )
    con = _duck(rows)
    want = sorted(
        con.execute(
            "SELECT c, k, v, row_number() OVER (PARTITION BY c ORDER BY v, k) AS rn FROM t"
        ).fetchall()
    )
    assert got == want


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows_strategy)
@pytest.mark.slow
def test_rollup_agreement(spark, rows):
    """ROLLUP null-group semantics must agree across engines."""
    from pyspark.sql import functions as F

    df = _spark_df(spark, rows)
    got = sorted(
        (r["c"] if r["c"] is not None else "<ALL>", r["cnt"])
        for r in df.rollup("c").agg(F.count("*").alias("cnt")).collect()
    )
    con = _duck(rows)
    want = sorted(
        (c if c is not None else "<ALL>", n)
        for c, n in con.execute(
            "SELECT c, count(*) AS cnt FROM t GROUP BY ROLLUP(c)"
        ).fetchall()
    )
    if not rows:
        # KNOWN ENGINE DIVERGENCE (found by this fuzzer): on empty input the
        # SQL standard (and DuckDB) emit the grand-total grouping-set row
        # (NULL, 0); Spark's rollup emits nothing. Harmless for non-empty
        # tables; pin both behaviors so a change in either engine surfaces.
        assert got == [] and want == [("<ALL>", 0)]
        return
    assert got == want


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows_strategy, rows2=rows_strategy)
@pytest.mark.slow
def test_setops_agreement(spark, rows, rows2):
    a = _spark_df(spark, rows).select("k", "c")
    b = _spark_df(spark, rows2).select("k", "c")
    got_i = sorted(map(tuple, a.intersect(b).collect()))
    got_e = sorted(map(tuple, a.subtract(b).collect()))
    con = _duck(rows)
    con.execute("CREATE TABLE t2 (k INTEGER, v INTEGER, c VARCHAR)")
    if rows2:
        con.executemany("INSERT INTO t2 VALUES (?, ?, ?)", rows2)
    want_i = sorted(con.execute("SELECT k, c FROM t INTERSECT SELECT k, c FROM t2").fetchall())
    want_e = sorted(con.execute("SELECT k, c FROM t EXCEPT SELECT k, c FROM t2").fetchall())
    assert got_i == want_i
    assert got_e == want_e


# --- BRE translation fuzz: grep binary vs the translated regex -------------

_bre_atom = st.one_of(
    st.sampled_from(list("abcxy z019")),  # literals
    st.sampled_from([".", "[abc]", "[0-9]", "[^a]", "a*", "x*", ".*"]),
    st.sampled_from([r"\(a\)", r"\(ab\)*", r"a\|b", r"b\{2\}", "+", "?", "(", ")", "{", "|"]),
)
_bre_pattern = st.lists(_bre_atom, min_size=1, max_size=5).map("".join)


@settings(max_examples=120, deadline=None, suppress_health_check=list(HealthCheck))
@given(pat=_bre_pattern, anchor_l=st.booleans(), anchor_r=st.booleans())
def test_bre_to_java_matches_real_grep(pat, anchor_l, anchor_r):
    """Fuzz the BRE→Java translation against the grep binary the reference
    shells out to: for random BRE patterns, the matched-line set over a fixed
    corpus must agree. (Python re stands in for Java regex — identical for
    this operator subset.)"""
    import re
    import shutil
    import subprocess

    from streamds_spark.operators.grep import bre_to_java

    if not shutil.which("grep"):
        pytest.skip("grep binary not available")

    corpus = [
        "abc", "axc", "a.c", "aab", "abab", "ab", "a", "b", "bb", "abb",
        "xyz", "x*z", "a|b", "(ab)", "a+b", "0 1 9", "z019", "aa bb", "", "  ",
        "caa", "baz", "a{2}", "[abc]",
    ]
    text = "\n".join(corpus) + "\n"
    if anchor_l:
        pat = "^" + pat
    if anchor_r:
        pat = pat + "$"

    res = subprocess.run(
        ["grep", "--", pat],
        input=text,
        capture_output=True,
        text=True,
        env={"LC_ALL": "C", "PATH": "/usr/bin:/bin"},
    )
    if res.returncode == 2:  # grep rejected the pattern as malformed BRE
        return
    expected = set(res.stdout.splitlines())

    translated = bre_to_java(pat)
    try:
        rx = re.compile(translated)
    except re.error:
        pytest.fail(f"translated pattern does not compile: {pat!r} -> {translated!r}")
    got = {line for line in corpus if rx.search(line)}
    assert got == expected, f"pattern {pat!r} -> {translated!r}"


# --- regexp parity: the PII scrub patterns must behave identically in Java
# regex (Spark) and RE2 (DuckDB) over arbitrary text --------------------------

_pii_text = st.lists(
    st.sampled_from(
        ["user", "a", "1", "10", "255", "999", ".", "@", "-", "_", " ", "com",
         "example.com", "@example.com", "10.0.0.1", "999.1.2.3", "x@y", "a@b.co",
         "..", "@@", "%", "+tag", "3.14", "..1.2.3.4.."]
    ),
    min_size=0,
    max_size=12,
).map("".join)


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=st.lists(_pii_text, min_size=1, max_size=8))
@pytest.mark.slow
def test_pii_regex_parity(spark, texts):
    from streamds_spark.queries.llmdata.redaction import EMAIL_RE, IP_RE

    from pyspark.sql import functions as F

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "i: int, t: string")
    got = {
        r.i: (r.ne, r.ni, r.red)
        for r in df.select(
            "i",
            F.regexp_count("t", F.lit(EMAIL_RE)).alias("ne"),
            F.regexp_count("t", F.lit(IP_RE)).alias("ni"),
            F.regexp_replace(
                F.regexp_replace("t", EMAIL_RE, "<EMAIL>"), IP_RE, "<IP>"
            ).alias("red"),
        ).collect()
    }
    con = duckdb.connect()
    for i, t in rows:
        ne, ni, red = con.execute(
            f"SELECT len(regexp_extract_all(?, '{EMAIL_RE}')), "
            f"len(regexp_extract_all(?, '{IP_RE}')), "
            f"regexp_replace(regexp_replace(?, '{EMAIL_RE}', '<EMAIL>', 'g'), "
            f"'{IP_RE}', '<IP>', 'g')",
            [t, t, t],
        ).fetchone()
        assert got[i] == (ne, ni, red), (t, got[i], (ne, ni, red))


# --- as-of join vs DuckDB's native ASOF JOIN --------------------------------

_asof_left = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # key
        st.integers(min_value=0, max_value=50),  # ts
    ),
    min_size=0,
    max_size=20,
)
# unique (key, ts) on the right so the matched row is well-defined in both engines
_asof_right = st.sets(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=50),
    ),
    min_size=0,
    max_size=20,
).map(sorted)


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(lrows=_asof_left, rrows=_asof_right)
@pytest.mark.slow
def test_asof_join_agreement(spark, lrows, rrows):
    from streamds_spark.operators.asof import asof_join

    lrows = [(k, t, i) for i, (k, t) in enumerate(lrows)]
    rrows = [(k, t, 1000 + 10 * k + t) for (k, t) in rrows]
    l = spark.createDataFrame(lrows, "k: int, t: int, lid: int") if lrows else spark.createDataFrame([], "k int, t int, lid int")
    r = spark.createDataFrame(rrows, "k: int, t: int, rval: int") if rrows else spark.createDataFrame([], "k int, t int, rval int")
    got = {
        (row.k, row.t, row.lid): row.rval
        for row in asof_join(l, r, on=["k"], left_ts="t", right_ts="t").collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE l (k INTEGER, t INTEGER, lid INTEGER)")
    con.execute("CREATE TABLE r (k INTEGER, t INTEGER, rval INTEGER)")
    if lrows:
        con.executemany("INSERT INTO l VALUES (?, ?, ?)", lrows)
    if rrows:
        con.executemany("INSERT INTO r VALUES (?, ?, ?)", rrows)
    want = {
        (k, t, lid): rval
        for k, t, lid, rval in con.execute(
            "SELECT l.k, l.t, l.lid, r.rval FROM l ASOF LEFT JOIN r "
            "ON l.k = r.k AND l.t >= r.t"
        ).fetchall()
    }
    assert got == want
