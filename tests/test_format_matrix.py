"""Format matrix (io/sources.read_any / write_any + CLI convert): ORC joins
parquet as a first-class columnar source — same pushdown/pruning path — and
CSV/JSON round-trip typed."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.io.sources import read_any, sniff_format, write_any

SF = "/root/testdata/sf0.001"


def _rows(df, cols=("o_orderkey", "o_totalprice", "o_orderpriority")):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_orc_round_trip_and_pushdown(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    dest = str(tmp_path / "orders.orc")
    write_any(orders, dest)  # sniffed from extension
    assert sniff_format(dest) == "orc"
    assert glob.glob(os.path.join(dest, "*.orc"))
    back = read_any(spark, dest)
    assert _rows(back) == _rows(orders)
    # filters reach the ORC scan like they reach parquet
    plan = (
        back.filter(F.col("o_orderkey") == 7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "o_orderkey" in plan


def test_orc_partitioned_write_prunes(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    dest = str(tmp_path / "orders_part.orc")
    write_any(orders, dest, partition_by=["o_orderpriority"])
    assert glob.glob(os.path.join(dest, "o_orderpriority=*"))
    back = read_any(spark, dest)
    pruned = back.filter(F.col("o_orderpriority") == "1-URGENT")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_orderpriority" in plan
    want = orders.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert pruned.count() == want > 0


def test_csv_and_json_round_trip_typed(spark, tmp_path):
    nation = load_table(spark, SF, "nation")
    for ext in ("csv", "json"):
        dest = str(tmp_path / f"nation.{ext}")
        write_any(nation, dest)
        back = read_any(spark, dest)
        got = sorted(
            (int(r["n_nationkey"]), r["n_name"]) for r in back.collect()
        )
        want = sorted((r["n_nationkey"], r["n_name"]) for r in nation.collect())
        assert got == want
    # csv inferSchema really types the key column
    csv_back = read_any(spark, str(tmp_path / "nation.csv"))
    assert dict(csv_back.dtypes)["n_nationkey"] in ("int", "bigint")


def test_ambiguous_path_requires_fmt(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="cannot infer"):
        read_any(spark, str(tmp_path / "mystery_table"))
    nation = load_table(spark, SF, "nation")
    dest = str(tmp_path / "explicit_dir")
    write_any(nation, dest, fmt="orc")
    assert read_any(spark, dest, fmt="orc").count() == nation.count()


def test_cli_convert_verb(spark, tmp_path, capsys):
    from streamds_spark.cli import main

    src = f"{SF}/region.parquet"
    dest = str(tmp_path / "region.orc")
    assert main(["convert", src, dest]) == 0
    out = capsys.readouterr().out
    assert "converted:5 rows" in out
    assert read_any(spark, dest).count() == 5
    # partitioned conversion
    dest2 = str(tmp_path / "orders_by_prio.orc")
    assert main(
        ["convert", f"{SF}/orders.parquet", dest2, "--partition-by", "o_orderpriority"]
    ) == 0
    assert glob.glob(os.path.join(dest2, "o_orderpriority=*"))
