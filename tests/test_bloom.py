"""Bloom membership sketch (operators/bloom.py): no false negatives ever,
false positives near theory, two-phase decontamination equal to the exact
join, probe plan map-only."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.functions.text import shingles_expr, tokens
from streamds_spark.operators.bloom import (
    bloom_decontaminate,
    build_bloom,
    probe_bloom,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def keys(spark):
    member = spark.range(0, 2000).select(F.concat(F.lit("key-"), "id").alias("s"))
    non_member = spark.range(50_000, 70_000).select(
        F.concat(F.lit("key-"), "id").alias("s")
    )
    return member, non_member


def test_no_false_negatives(spark, keys):
    member, _ = keys
    bloom = build_bloom(member, "s", m_bits=1 << 18, k=5)
    flagged = probe_bloom(member, "s", bloom).filter(~F.col("maybe_member")).count()
    assert flagged == 0


def test_fp_rate_near_theory(spark, keys):
    member, non_member = keys
    bloom = build_bloom(member, "s", m_bits=1 << 18, k=5)
    theory = bloom.fp_rate(2000)  # ≈ 2.6e-6 at these params… scale m down below
    fp = probe_bloom(non_member, "s", bloom).filter(F.col("maybe_member")).count()
    n = non_member.count()
    # tight sketch: observed FP rate within 5× of theory + slack for small n
    assert fp / n <= theory * 5 + 1e-3, (fp, n, theory)


def test_fp_rate_degrades_as_designed_when_small(spark, keys):
    """A deliberately undersized filter must show the PREDICTED collision
    rate — evidence the k-position math matches the model, not just 'works'."""
    member, non_member = keys
    bloom = build_bloom(member, "s", m_bits=1 << 12, k=3)  # crowded: 2000 keys/4096 bits
    theory = bloom.fp_rate(2000)
    assert theory > 0.3  # genuinely crowded configuration (≈0.45 here)
    fp = probe_bloom(non_member, "s", bloom).filter(F.col("maybe_member")).count()
    rate = fp / non_member.count()
    assert 0.5 * theory <= rate <= min(1.0, 1.5 * theory), (rate, theory)


def test_probe_plan_is_map_only(spark, keys):
    member, non_member = keys
    bloom = build_bloom(member, "s", m_bits=1 << 18, k=5)
    probed = probe_bloom(non_member, "s", bloom)
    from streamds_spark.plans.audit import plan_facts

    f = plan_facts(probed)
    assert f.n_exchanges == 0, "bloom probe must not shuffle the probed side"


def test_decontaminate_equals_exact_join(spark):
    """Two-phase (bloom prune → exact verify) must give EXACTLY the plain
    equi-join's answer on real documents-vs-documents shingle overlap."""
    docs = load_table(spark, SF, "documents")
    sh = (
        docs.select("doc_id", tokens(F.col("text")).alias("toks"))
        .select("doc_id", F.explode(shingles_expr("toks", 3)).alias("shingle"))
    )
    bench = sh.filter(F.col("doc_id") < 25).select("shingle").distinct()
    corpus = sh.filter(F.col("doc_id") >= 25)
    got = {
        (r["doc_id"], r["n_contaminated_shingles"])
        for r in bloom_decontaminate(corpus, bench).collect()
    }
    exact = {
        (r["doc_id"], r["n"])
        for r in corpus.join(bench, "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == exact and got
