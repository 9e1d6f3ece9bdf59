"""Z-order layout: three-way key equality (Python reference == portable SQL ==
io/layout.interleave_bits), cross-engine SQL portability, and the file-skipping
payoff — a z-ordered write gives every file a bounded rectangle in (x, y)
space, so footer min/max stats prune reads filtered on EITHER column; a
single-column sort only helps one of them."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from streamds_spark.io.layout import interleave_bits, write_zordered
from streamds_spark.operators.zorder import layout_file_stats, zorder_py, zorder_sql


def test_key_three_way_equality(spark):
    """zorder_sql (oracle-portable) == interleave_bits (canonical writer path)
    == zorder_py (reference) — pins that the oracle-checked key really is the
    key the clustered write sorts by."""
    rng = random.Random(7)
    rows = [(rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(200)]
    df = spark.createDataFrame(rows, "x long, y long").select(
        "x",
        "y",
        F.expr(zorder_sql("x", "y", bits=16)).alias("z_sql"),
        interleave_bits([F.col("x"), F.col("y")], 16).alias("z_impl"),
    )
    for r in df.collect():
        assert r.z_sql == r.z_impl == zorder_py(r.x, r.y, 16)


def test_sql_form_is_engine_portable(spark):
    import duckdb

    expr = zorder_sql("x", "y", bits=10)
    pairs = [(i * 37 % 1024, i * 101 % 1024) for i in range(50)]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", pairs)
    duck = dict(con.execute(f"SELECT x, {expr} FROM t").fetchall())
    sdf = spark.createDataFrame(pairs, "x long, y long").select("x", F.expr(expr).alias("z"))
    for r in sdf.collect():
        assert r.z == duck[r.x] == zorder_py(r.x, dict(pairs)[r.x], 10)


def _avg_file_extent(stats, lo, hi, dim):
    span = hi - lo
    exts = [
        ((r[f"{dim}max"] - r[f"{dim}min"]) / span) for r in stats
    ]
    return sum(exts) / len(exts)


def _files_matching(stats, dim, lo, hi):
    return [r for r in stats if not (r[f"{dim}max"] < lo or r[f"{dim}min"] > hi)]


def test_layout_prunes_on_both_dims(spark, tmp_out):
    # uniform 2-D grid: worst case for a 1-D sort, ideal to show the z payoff
    rng = random.Random(11)
    rows = [(i, rng.randrange(10_000), rng.randrange(10_000)) for i in range(40_000)]
    df = spark.createDataFrame(rows, "id long, x long, y long")

    zpath = f"{tmp_out}/zorder"
    spath = f"{tmp_out}/xsort"
    write_zordered(df, zpath, ["x", "y"], bits=12, n_files=16)
    df.repartitionByRange(16, "x").write.parquet(spath)

    zstats = [r.asDict() for r in layout_file_stats(spark, zpath, "x", "y").collect()]
    xstats = [r.asDict() for r in layout_file_stats(spark, spath, "x", "y").collect()]
    assert len(zstats) >= 8

    # z-order: BOTH dimensions bounded well below the full range per file
    assert _avg_file_extent(zstats, 0, 10_000, "x") < 0.55
    assert _avg_file_extent(zstats, 0, 10_000, "y") < 0.55
    # x-sort: x tight but y spans ~everything in every file
    assert _avg_file_extent(xstats, 0, 10_000, "x") < 0.2
    assert _avg_file_extent(xstats, 0, 10_000, "y") > 0.9

    # a y-range predicate: footer stats prune most z-files, no x-sorted files
    z_hit = _files_matching(zstats, "y", 1000, 1999)
    x_hit = _files_matching(xstats, "y", 1000, 1999)
    assert len(z_hit) <= len(zstats) // 2
    assert len(x_hit) == len(xstats)

    # the layout changes file placement, not content
    zread = spark.read.parquet(zpath)
    assert zread.count() == 40_000
    assert zread.agg(F.sum("x"), F.sum("y")).collect() == df.agg(
        F.sum("x"), F.sum("y")
    ).collect()
