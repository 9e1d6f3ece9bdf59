from __future__ import annotations

from streamds_spark.operators.profile import profile_table


def test_profile_table(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, None, 4.0), (None, "a", None)],
        "k int, c string, v double",
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["k"]["n_rows"] == 4
    assert prof["k"]["n_nulls"] == 1
    assert prof["c"]["n_nulls"] == 1
    assert prof["c"]["approx_distinct"] == 2
    assert prof["c"]["mean"] is None  # non-numeric
    assert abs(prof["v"]["mean"] - (7.0 / 3)) < 1e-9
    assert prof["v"]["dtype"] == "double"


def test_profile_on_testdata(spark):
    from streamds_spark.catalog import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    prof = {r["column"]: r for r in profile_table(li).collect()}
    assert prof["l_orderkey"]["n_rows"] == 6000
    assert all(r["n_nulls"] == 0 for r in prof.values())
    assert prof["l_returnflag"]["approx_distinct"] == 3
