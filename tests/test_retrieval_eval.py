"""Retrieval eval metrics (retrieval_eval_ndcg): hand-computed nDCG parity
on the real table plus metric invariants."""

from __future__ import annotations

import math

from streamds_spark.queries.llmdata.retrieval import (
    QUERY_TERMS,
    retrieval_eval_ndcg,
)

SF = "/root/testdata/sf0.001"


def _py_metrics(docs_rows):
    """Pure-Python reference: same grading, ranking, and DCG math."""
    cand = []
    for doc_id, text in docs_rows:
        toks = text.split()
        tfs = [sum(1 for w in toks if w == t) for t in QUERY_TERMS]
        if sum(tfs) == 0:
            continue
        g = sum(1 for tf in tfs if tf > 0)
        cand.append((doc_id, g))
    # system order needs the bm25 score — instead of replicating BM25 here
    # (bm25_scores already has its own oracle), validate the IDEAL side and
    # the metric arithmetic, which only depend on grades
    ideal = sorted(cand, key=lambda x: (-x[1], x[0]))[:10]
    idcg = {
        k: sum(
            (2.0 ** g - 1) / math.log2(r + 2)
            for r, (_, g) in enumerate(ideal[:k])
        )
        for k in (5, 10)
    }
    return cand, idcg


def test_ndcg_bounds_and_idcg_parity(spark):
    from streamds_spark.catalog import load_table

    rows = {
        r["k"]: r
        for r in retrieval_eval_ndcg(spark, SF).collect()
    }
    assert set(rows) == {5, 10}
    for k, r in rows.items():
        assert 0.0 <= r["ndcg"] <= 1.0, (k, r["ndcg"])
        assert 0.0 <= r["precision_graded"] <= 1.0
    # nDCG@k == 1 would mean BM25 ordering equals grade ordering exactly —
    # not guaranteed; but an empty/degenerate metric is a bug
    assert rows[10]["ndcg"] > 0.0

    # independent check of the ideal-DCG denominator via pure Python:
    # recompute system DCG from the query's own top-10 and divide — the
    # published ndcg must equal sys_dcg / py_idcg
    docs = [
        (r["doc_id"], r["text"])
        for r in load_table(spark, SF, "documents").select("doc_id", "text").collect()
    ]
    cand, idcg = _py_metrics(docs)
    assert idcg[10] > 0
    from streamds_spark.queries.llmdata.retrieval import _bm25_df
    import pyspark.sql.functions as F

    top = (
        _bm25_df(spark, SF)
        .select("doc_id", F.round("bm25", 6).alias("s"), "n_terms_hit")
        .orderBy(F.desc("s"), "doc_id")
        .limit(10)
        .collect()
    )
    for k in (5, 10):
        sys_dcg = sum(
            (2.0 ** r["n_terms_hit"] - 1) / math.log2(i + 2)
            for i, r in enumerate(top[:k])
        )
        assert rows[k]["ndcg"] == round(sys_dcg / idcg[k], 4), k
