"""Register-table HyperLogLog (operators/hll.py): mergeability (the property
that makes distinct-count state bounded forever in streaming ingest),
idempotence under re-delivery, accuracy in both the linear-counting and raw
regimes, and a real readStream foreachBatch run keeping a persisted register
store whose final estimate equals the batch answer."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from streamds_spark.operators.hll import (
    M,
    hll_estimate,
    hll_merge,
    hll_registers,
)
import pytest


def _regs_dict(df):
    return {r["bucket"]: r["max_rho"] for r in df.collect()}


def test_register_sanity_and_merge_equals_whole(spark):
    df = spark.range(0, 3000).select(F.col("id").alias("k"))
    whole = hll_registers(df, "k")
    regs = _regs_dict(whole)
    assert all(0 <= b < M for b in regs)
    assert all(rho >= 1 for rho in regs.values())
    # split into 3 disjoint chunks, sketch each, merge -> identical registers
    chunks = [
        hll_registers(df.filter((F.col("k") % 3) == i), "k") for i in range(3)
    ]
    merged = hll_merge(*chunks)
    assert _regs_dict(merged) == regs
    # idempotent: re-delivering a chunk changes nothing
    assert _regs_dict(hll_merge(merged, chunks[0])) == regs
    # estimate is a pure function of registers -> merge path agrees too
    assert hll_estimate(merged).first()["est"] == hll_estimate(whole).first()["est"]


def test_accuracy_both_regimes(spark):
    # linear-counting regime: n << m
    small = spark.range(0, 40).select(F.col("id").alias("k"))
    est = hll_estimate(hll_registers(small, "k")).first()["est"]
    assert abs(est - 40) / 40 < 0.25
    # raw-HLL regime: n >> 2.5m; duplicate rows must not move the estimate
    big = spark.range(0, 20000).select((F.col("id") % 8000).alias("k"))
    est_b = hll_estimate(hll_registers(big, "k")).first()["est"]
    sigma = 1.04 / math.sqrt(M)  # ~6.5%
    assert abs(est_b - 8000) / 8000 < 4 * sigma


def test_groupwise_rollup_to_corpus(spark):
    """Per-group sketches re-aggregate to coarser groups without rescanning:
    max-merging every source's registers must equal the whole-corpus sketch
    (the composability hll_distinct_terms_by_source's docstring promises)."""
    from streamds_spark.catalog import load_table
    from streamds_spark.functions.text import tokens as _tokens

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    terms = docs.select(F.explode(_tokens(F.col("text"))).alias("term"))
    whole = hll_registers(terms, "term")
    # group-wise registers (same construction as the registered query)
    keyed = docs.select(
        "source", F.explode(_tokens(F.col("text"))).alias("term")
    )
    # build per-source registers independently, then max-merge
    sources = [r["source"] for r in docs.select("source").distinct().collect()]
    parts = [
        hll_registers(
            keyed.filter(F.col("source") == s).select("term"), "term"
        )
        for s in sources
    ]
    merged = hll_merge(*parts)
    assert _regs_dict(merged) == _regs_dict(whole)


def test_empty_input_linear_counts_to_zero(spark):
    """No keys seen yet (first trigger of a fresh store): the estimate must
    be 0.0, not NULL — sum() over an empty register table is NULL without
    the coalesce."""
    empty = spark.range(0).select(F.col("id").alias("k"))
    row = hll_estimate(hll_registers(empty, "k")).first()
    assert row["n_registers"] == 0
    assert row["est"] == 0.0


def test_set_ops_inclusion_exclusion(spark):
    """Known overlap: A = [0, 4000), B = [2000, 6000) -> |A∩B| = 2000. The
    inclusion-exclusion estimate compounds three sketches' noise, so the
    tolerance is wider than a single estimate's — but it must land in the
    right decade and the union estimate must match the merged registers."""
    a = spark.range(0, 4000).select(F.col("id").alias("k"))
    b = spark.range(2000, 6000).select(F.col("id").alias("k"))
    ra, rb = hll_registers(a, "k"), hll_registers(b, "k")
    ea = hll_estimate(ra).first()["est"]
    eb = hll_estimate(rb).first()["est"]
    eu = hll_estimate(hll_merge(ra, rb)).first()["est"]
    # merged registers must equal the sketch of the concatenated input
    ru = hll_registers(a.unionByName(b), "k")
    assert _regs_dict(hll_merge(ra, rb)) == _regs_dict(ru)
    assert abs(eu - 6000) / 6000 < 4 * (1.04 / math.sqrt(M))
    inter = ea + eb - eu
    assert 2000 * 0.4 < inter < 2000 * 1.9  # compounded-noise band


@pytest.mark.slow
def test_streaming_register_store(spark, tmp_path):
    """Distinct-user counting over a file stream with a PERSISTED register
    store: every trigger sketches its batch, merges into the store, and the
    final estimate equals the batch-mode estimate over all input — with
    state bounded by m rows no matter how many triggers ran."""
    src = str(tmp_path / "in")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    ids = list(range(1000))
    for chunk in range(4):
        spark.createDataFrame(
            [(i,) for i in ids[chunk * 250 : (chunk + 1) * 250]], "user_id long"
        ).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema

    def upsert(batch_df, batch_id):
        batch_regs = hll_registers(batch_df, "user_id")
        sess = batch_df.sparkSession
        try:
            prev = sess.read.parquet(store)
            merged = hll_merge(prev, batch_regs)
        except Exception:  # first batch: no store yet
            merged = batch_regs
        # write-then-swap would be the durable pattern; local test keeps it
        # simple with a collect-backed overwrite (<=m rows by construction)
        rows = merged.collect()
        assert len(rows) <= M
        sess.createDataFrame(rows, merged.schema).write.mode("overwrite").parquet(store)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(upsert)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    final_regs = spark.read.parquet(store)
    batch_regs = hll_registers(spark.read.parquet(src), "user_id")
    assert _regs_dict(final_regs) == _regs_dict(batch_regs)
    est = hll_estimate(final_regs).first()["est"]
    assert abs(est - 1000) / 1000 < 4 * (1.04 / math.sqrt(M))


def test_rolling_mau_window_merge_equals_direct(spark):
    """rolling_mau_hll: merging DAILY register tables over a 30-day window
    must equal the sketch built directly from the window's raw users (the
    mergeability contract applied to the MAU shape), and every day's
    realized error stays inside 2 sigma (deterministic md5 draw)."""
    import duckdb

    from streamds_spark.registry import load_all

    sf = "/root/testdata/sf0.001"
    rows = load_all()["rolling_mau_hll"].fn(spark, sf).collect()
    assert rows
    for r in rows:
        assert r["rel_err_r"] <= 0.13, (r["day_s"], r["rel_err_r"])
    # direct-window sketch for the LAST day == the query's register merge
    last = max(r["day_s"] for r in rows)
    users = duckdb.sql(
        f"""SELECT DISTINCT user_id FROM '{sf}/events.parquet'
        WHERE CAST(ts AS DATE) BETWEEN DATE '{last}' - 29 AND DATE '{last}'"""
    ).fetchall()
    direct = hll_estimate(
        hll_registers(
            spark.createDataFrame(users, "user_id long"), "user_id"
        )
    ).first()
    got = next(r for r in rows if r["day_s"] == last)
    assert got["n_registers"] == direct["n_registers"]
    assert got["est_r"] == round(direct["est"], 4) + 0.0
