"""token_coverage_curve: synthetic exactness against a hand-computed curve,
monotonicity invariants on the real table, and the no-global-window plan
guarantee (the whole point of using the distributed rank)."""

from __future__ import annotations

from collections import Counter

from streamds_spark.queries.llmdata.vocab import COVERAGE_CUTS, token_coverage_curve

SF = "/root/testdata/sf0.001"


def test_synthetic_exact_curve(spark, tmp_path):
    # 3 docs, known frequencies: a×6, b×3, c×2, d×1 (12 tokens total)
    texts = ["a a a b b c", "a a b c", "a d"]
    rows = [(i, t, "s") for i, t in enumerate(texts)]
    spark.createDataFrame(rows, "doc_id long, text string, source string") \
        .write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    counts = Counter(w for t in texts for w in t.split())
    total = sum(counts.values())
    by_freq = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    got = {r["top_v"]: r for r in token_coverage_curve(spark, str(tmp_path)).collect()}
    assert set(got) == set(COVERAGE_CUTS)
    for v in COVERAGE_CUTS:
        covered = sum(c for _, c in by_freq[:v])
        assert got[v]["covered_tokens"] == covered
        assert got[v]["coverage_r"] == round(covered / total, 4)
    # every cut exceeds the 4-term vocab -> full coverage everywhere here
    assert got[COVERAGE_CUTS[0]]["coverage_r"] == 1.0


def test_synthetic_partial_coverage(spark, tmp_path):
    """A corpus with more types than the smallest cut: the curve must be
    strictly below 1.0 there and match the hand-computed prefix sums."""
    words = [f"w{i:02d}" for i in range(30)]
    # w_i appears 30-i times -> unambiguous frequency ranking
    text = " ".join(w for i, w in enumerate(words) for _ in range(30 - i))
    spark.createDataFrame([(0, text, "s")], "doc_id long, text string, source string") \
        .write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    counts = Counter(text.split())
    total = sum(counts.values())
    by_freq = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    got = {r["top_v"]: r for r in token_coverage_curve(spark, str(tmp_path)).collect()}
    for v in COVERAGE_CUTS:
        covered = sum(c for _, c in by_freq[:v])
        assert got[v]["covered_tokens"] == covered
        assert got[v]["coverage_r"] == round(covered / total, 4)
    assert got[COVERAGE_CUTS[0]]["coverage_r"] < 1.0
    assert got[COVERAGE_CUTS[-1]]["coverage_r"] == 1.0


def test_real_table_monotone_and_bounded(spark):
    rows = sorted(token_coverage_curve(spark, SF).collect(), key=lambda r: r["top_v"])
    assert [r["top_v"] for r in rows] == sorted(COVERAGE_CUTS)
    for a, b in zip(rows, rows[1:]):
        assert a["covered_tokens"] <= b["covered_tokens"]
        assert a["coverage_r"] <= b["coverage_r"]
    for r in rows:
        assert 0.0 < r["coverage_r"] <= 1.0
    # the smallest cut (8 < the corpus's ~31-term vocab) must not cover all
    assert rows[0]["coverage_r"] < 1.0


def test_no_global_window(spark):
    from streamds_spark.plans.audit import plan_facts

    # distributed rank: every WindowExec is partitioned by the range bucket
    assert plan_facts(token_coverage_curve(spark, SF)).n_global_windows == 0
