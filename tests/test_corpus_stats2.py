"""term_pmi_pairs + ks_doclen_drift: pure-Python reference parity on the
real table and known-answer synthetic checks."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from streamds_spark.queries.llmdata.vocab import (
    KS_SRC_A,
    KS_SRC_B,
    PMI_MIN_CO,
    PMI_MIN_DF,
    PMI_TOPK,
    ks_doclen_drift,
    term_pmi_pairs,
)

SF = "/root/testdata/sf0.001"


def test_pmi_python_parity(spark):
    from streamds_spark.catalog import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    postings = defaultdict(set)
    for r in docs:
        for t in set(r["text"].split()):
            postings[t].add(r["doc_id"])
    n_docs = len({r["doc_id"] for r in docs})
    df = {t: len(ds) for t, ds in postings.items() if len(ds) >= PMI_MIN_DF}
    pairs = {}
    terms = sorted(df)
    for i, a in enumerate(terms):
        for b in terms[i + 1 :]:
            co = len(postings[a] & postings[b])
            if co >= PMI_MIN_CO:
                pairs[(a, b)] = (
                    co,
                    round(math.log(co * n_docs / (df[a] * df[b])), 4) + 0.0,
                )
    want = sorted(
        ((pmi, a, b, co) for (a, b), (co, pmi) in pairs.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:PMI_TOPK]
    got = term_pmi_pairs(spark, SF).collect()
    assert len(got) == len(want)
    for g, (pmi, a, b, co) in zip(got, want):
        assert (g["term_a"], g["term_b"], g["co_df"]) == (a, b, co)
        assert g["pmi_r"] == pmi


def test_ks_python_parity_and_synthetic(spark, tmp_path):
    from streamds_spark.catalog import load_table

    rows = (
        load_table(spark, SF, "documents")
        .filter(F.col("source").isin(KS_SRC_A, KS_SRC_B))
        .select("source", "n_chars")
        .collect()
    )
    s1 = sorted(r["n_chars"] for r in rows if r["source"] == KS_SRC_A)
    s2 = sorted(r["n_chars"] for r in rows if r["source"] == KS_SRC_B)

    def py_ks(a, b):
        xs = sorted(set(a) | set(b))
        ca, cb = Counter(a), Counter(b)
        best, at, f1, f2 = -1.0, None, 0, 0
        for x in xs:
            f1 += ca.get(x, 0)
            f2 += cb.get(x, 0)
            d = abs(f1 / len(a) - f2 / len(b))
            if d > best + 1e-15:
                best, at = d, x
        return round(best, 4) + 0.0, at

    ks, at = py_ks(s1, s2)
    got = ks_doclen_drift(spark, SF).first()
    assert got["n1"] == len(s1) and got["n2"] == len(s2)
    assert got["ks_r"] == ks
    assert got["at_len"] == at
    assert 0.0 <= got["ks_r"] <= 1.0

    # synthetic: disjoint supports -> KS == 1 at the end of the first sample
    a_rows = [(i, KS_SRC_A, 100 + i) for i in range(20)]
    b_rows = [(100 + i, KS_SRC_B, 500 + i) for i in range(20)]
    spark.createDataFrame(
        [(i, s, "x" * 5, n) for i, s, n in a_rows + b_rows],
        "doc_id long, source string, text string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    syn = ks_doclen_drift(spark, str(tmp_path)).first()
    assert syn["ks_r"] == 1.0
    assert syn["at_len"] == 119  # last length of the first sample
