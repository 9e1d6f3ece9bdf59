"""The big gate: every registered query's Spark result must match its DuckDB
oracle at sf0.001 (row count + column names + order-insensitive values) —
the same comparison the driver runs at sf0.01."""

from __future__ import annotations

import os

import duckdb
import pytest

from streamds_spark.catalog import TABLES
from streamds_spark.registry import load_all
from tools.selfcheck import to_multiset

SF_DIR = "/root/testdata/sf0.001"

SPECS = load_all()


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(SF_DIR, t + '.parquet')}'")
    return con


@pytest.mark.parametrize("name", sorted(SPECS))
@pytest.mark.slow
def test_query_matches_oracle(spark, oracle_con, name):
    spec = SPECS[name]
    df = spec.fn(spark, SF_DIR)
    srows = [tuple(r) for r in df.collect()]
    if spec.oracle is None:
        assert len(srows) >= 0  # rows-only contract: just runs and returns a DataFrame
        return
    res = oracle_con.execute(spec.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert len(srows) == len(orows), f"rowcount spark={len(srows)} duckdb={len(orows)}"
    assert sorted(df.columns) == sorted(ocols)
    assert to_multiset(srows, df.columns) == to_multiset(orows, ocols)
