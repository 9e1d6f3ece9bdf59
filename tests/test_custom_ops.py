"""Custom-operator surface: the reference's line→list contract as vectorized
Pandas UDFs, pluggable into RainStorm job specs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamds_spark.operators.custom import (
    apply_line_operator,
    register_stage1,
    scalar_operator,
)
from streamds_spark.operators.rainstorm import STAGE1_OPS, RainStormJob, compile_rainstorm


@pytest.fixture()
def lines(spark):
    return spark.createDataFrame(
        [("f:1", "alpha beta"), ("f:2", "skip"), ("f:3", "gamma")], ["key", "value"]
    )


def test_flatmap_semantics(spark, lines):
    out = apply_line_operator(lines, lambda v: v.split() if v != "skip" else [])
    rows = sorted((r["key"], r["out"]) for r in out.collect())
    assert rows == [("f:1:0", "alpha"), ("f:1:1", "beta"), ("f:3:0", "gamma")]


def test_scalar_operator_map_filter(spark, lines):
    up = scalar_operator(lambda v: v.upper() if "a" in v else None)
    rows = sorted(
        r["o"] for r in lines.select(up(F.col("value")).alias("o")).collect() if r["o"]
    )
    assert rows == ["ALPHA BETA", "GAMMA"]


def test_register_into_rainstorm(spark, lines, tmp_path):
    name = "test_vowel_counter"
    if name not in STAGE1_OPS:
        register_stage1(name, lambda v: [w for w in v.split() if w[0] in "aeiou"])
    p = tmp_path / "in.txt"
    p.write_text("alpha beta\nepsilon zeta\n")
    job = RainStormJob(name, "", "count_operator", "", str(p))
    got = {r["word"]: r["count"] for r in compile_rainstorm(spark, job).collect()}
    assert got == {"alpha": 1, "epsilon": 1}


def test_double_register_rejected():
    with pytest.raises(ValueError):
        register_stage1("split_operator", lambda v: [v])


def test_udtf_lateral_flatmap(spark, lines):
    """True UDTF path: same flatMap contract, row expansion via lateral join."""
    from streamds_spark.operators.custom import apply_line_udtf

    out = apply_line_udtf(lines, lambda v: v.split() if v != "skip" else [])
    rows = sorted((r["key"], r["out"]) for r in out.collect())
    assert rows == [("f:1:0", "alpha"), ("f:1:1", "beta"), ("f:3:0", "gamma")]


def test_udtf_sql_lateral(spark, lines):
    """SQL users call the registered UDTF with LATERAL — the reference's
    'swap in your binary' store, but addressable from plain SQL."""
    from streamds_spark.operators.custom import line_udtf

    line_udtf(lambda v: [w.upper() for w in v.split()], name="upper_words")
    lines.createOrReplaceTempView("udtf_lines")
    got = sorted(
        (r["key"], r["out"], r["idx"])
        for r in spark.sql(
            "SELECT l.key, s.out, s.idx FROM udtf_lines l, LATERAL upper_words(l.value) s"
        ).collect()
    )
    assert ("f:1", "ALPHA", 0) in got and ("f:1", "BETA", 1) in got
    assert len(got) == 4  # 'skip' still emits its one (uppercased) word


def test_md5_int60_py_matches_spark(spark):
    """md5_int60_py is the driver-side twin of the Spark md5_int60
    expression (delete_docs' takedown token derives from it on the
    small-list path, the DataFrame path uses the Spark expression — the
    overwrite-by-identity idempotency depends on the two agreeing)."""
    from pyspark.sql import functions as F

    from streamds_spark.functions.hashing import md5_int60, md5_int60_py

    vals = [0, 1, 7, 42, 999999, 2**50, -3]
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    got = {
        r["v"]: r["h"]
        for r in df.select("v", md5_int60(F.col("v")).alias("h")).collect()
    }
    for v in vals:
        assert got[v] == md5_int60_py(str(v)), v
