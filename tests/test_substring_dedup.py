"""Exact substring dedup (operators/substring_dedup.py) vs a transparent
Python reference: same duplicated-shingle marking, same interval merge, same
aggressive removal — byte-identical cleaned text."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.operators.substring_dedup import substring_dedup

SF = "/root/testdata/sf0.001"
L = 8


def _py_reference(texts: dict[int, str], l_tokens: int = L) -> dict[int, tuple]:
    toks = {d: [w for w in t.split() if w] for d, t in texts.items()}
    counts: Counter = Counter()
    for t in toks.values():
        for i in range(len(t) - l_tokens + 1):
            counts[" ".join(t[i : i + l_tokens])] += 1
    out = {}
    for d, t in toks.items():
        marked = [
            i
            for i in range(len(t) - l_tokens + 1)
            if counts[" ".join(t[i : i + l_tokens])] > 1
        ]
        spans = []
        for i in marked:
            if spans and i <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], i + l_tokens)
            else:
                spans.append([i, i + l_tokens])
        removed = sum(e - s for s, e in spans)
        cleaned = " ".join(
            w for i, w in enumerate(t) if not any(s <= i < e for s, e in spans)
        )
        out[d] = (len(spans), removed, len(t), cleaned)
    return out


@pytest.fixture(scope="module")
def crafted(spark):
    boiler = "all rights reserved copyright notice follows here exactly"  # 8 tokens
    texts = {
        0: f"alpha beta {boiler} gamma delta",
        1: f"unrelated words one two three four five six {boiler} tail",
        2: "unique text with no repeats anywhere in this corpus at all",
        3: f"{boiler} {boiler} double run",  # within-doc repeat + overlap merge
        4: "short doc",  # shorter than L — no shingles
    }
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    return texts, df


def test_matches_python_reference_on_crafted_corpus(spark, crafted):
    texts, df = crafted
    ref = _py_reference(texts)
    got = {
        r["doc_id"]: (
            r["n_spans"],
            r["n_tokens_removed"],
            r["n_tokens"],
            r["cleaned_text"],
        )
        for r in substring_dedup(df, L).collect()
    }
    assert got == ref
    # the boilerplate is gone from every doc, unique text untouched
    assert "rights reserved" not in got[0][3] and "alpha beta" in got[0][3]
    assert got[2][3] == texts[2]
    assert got[4] == (0, 0, 2, "short doc")


def test_matches_python_reference_on_real_documents(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text").limit(200)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    ref = _py_reference(texts)
    got = {
        r["doc_id"]: (
            r["n_spans"],
            r["n_tokens_removed"],
            r["n_tokens"],
            r["cleaned_text"],
        )
        for r in substring_dedup(docs, L).collect()
    }
    assert got == ref
    assert sum(v[1] for v in got.values()) > 0, "synthetic docs repeat — expect spans"


def test_every_duplicated_shingle_is_removed(spark, crafted):
    """The operator's guarantee: no originally-duplicated L-shingle survives
    in ANY cleaned document."""
    texts, df = crafted
    counts: Counter = Counter()
    for t in texts.values():
        w = t.split()
        for i in range(len(w) - L + 1):
            counts[" ".join(w[i : i + L])] += 1
    dup = {s for s, c in counts.items() if c > 1}
    cleaned = {
        r["doc_id"]: r["cleaned_text"] for r in substring_dedup(df, L).collect()
    }
    for d, t in cleaned.items():
        w = t.split()
        for i in range(len(w) - L + 1):
            assert " ".join(w[i : i + L]) not in dup, (d, i)


def test_plan_has_no_global_windows(spark, crafted):
    _, df = crafted
    from streamds_spark.plans.audit import count_global_windows

    assert count_global_windows(substring_dedup(df, L)) == 0


def test_hashed_shingle_path_equals_string_path(spark):
    """hash_shingles=True (the 100 TB exchange-size path) must produce
    byte-identical output to the raw-string default — xxhash64 only changes
    the JOIN KEY representation, never which shingles count as duplicated."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    want = {
        r["doc_id"]: tuple(r)[1:]
        for r in substring_dedup(docs, L).collect()
    }
    got = {
        r["doc_id"]: tuple(r)[1:]
        for r in substring_dedup(docs, L, hash_shingles=True).collect()
    }
    assert got == want


def _py_reference_keep_one(texts: dict[int, str], l_tokens: int = L) -> dict[int, tuple]:
    """Keep-one variant of _py_reference: the globally-first occurrence
    (min (doc_id, pos)) of each duplicated shingle is NOT marked."""
    toks = {d: [w for w in t.split() if w] for d, t in texts.items()}
    occs: dict[str, list] = {}
    for d in sorted(toks):
        t = toks[d]
        for i in range(len(t) - l_tokens + 1):
            occs.setdefault(" ".join(t[i : i + l_tokens]), []).append((d, i))
    canon = {s: min(o) for s, o in occs.items() if len(o) > 1}
    out = {}
    for d, t in toks.items():
        marked = [
            i
            for i in range(len(t) - l_tokens + 1)
            if " ".join(t[i : i + l_tokens]) in canon
            and canon[" ".join(t[i : i + l_tokens])] != (d, i)
        ]
        spans = []
        for i in marked:
            if spans and i <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], i + l_tokens)
            else:
                spans.append([i, i + l_tokens])
        removed = sum(e - s for s, e in spans)
        cleaned = " ".join(
            w for i, w in enumerate(t) if not any(s <= i < e for s, e in spans)
        )
        out[d] = (len(spans), removed, len(t), cleaned)
    return out


def test_keep_one_matches_python_reference_on_crafted(spark, crafted):
    texts, df = crafted
    ref = _py_reference_keep_one(texts)
    got = {
        r["doc_id"]: (
            r["n_spans"],
            r["n_tokens_removed"],
            r["n_tokens"],
            r["cleaned_text"],
        )
        for r in substring_dedup(df, L, keep_one=True).collect()
    }
    assert got == ref
    # doc 0 holds the global-min occurrence of the boilerplate — it survives
    assert "rights reserved" in got[0][3]
    # later occurrences are stripped
    assert "rights reserved" not in got[1][3]
    # within-doc repeat in doc 3: the first occurrence there is NOT canonical
    # (doc 0 owns it), so both of doc 3's copies go
    assert "rights reserved" not in got[3][3]


def test_keep_one_matches_python_reference_on_real_documents(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text").limit(200)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    ref = _py_reference_keep_one(texts)
    got = {
        r["doc_id"]: (
            r["n_spans"],
            r["n_tokens_removed"],
            r["n_tokens"],
            r["cleaned_text"],
        )
        for r in substring_dedup(docs, L, keep_one=True).collect()
    }
    assert got == ref


def test_keep_one_removes_subset_of_aggressive(spark):
    """keep_one can only UNDO removals relative to the aggressive variant —
    per doc its tokens-removed count is <= the aggressive count, and the
    corpus-wide total is strictly smaller when any duplicate exists."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text").limit(200)
    agg = {r["doc_id"]: r["n_tokens_removed"] for r in substring_dedup(docs, L).collect()}
    one = {
        r["doc_id"]: r["n_tokens_removed"]
        for r in substring_dedup(docs, L, keep_one=True).collect()
    }
    assert all(one[d] <= agg[d] for d in agg)
    assert sum(one.values()) < sum(agg.values())


def test_keep_one_hashed_path_equals_string_path(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text").limit(200)
    want = {
        r["doc_id"]: tuple(r)[1:]
        for r in substring_dedup(docs, L, keep_one=True).collect()
    }
    got = {
        r["doc_id"]: tuple(r)[1:]
        for r in substring_dedup(docs, L, keep_one=True, hash_shingles=True).collect()
    }
    assert got == want


def test_hashed_path_exchanges_long_keys(spark, crafted):
    """Plan pin: with hash_shingles=True the dup-mark aggregation and the
    mark-back join key on a BIGINT xxhash64, i.e. every shingle exchange
    carries 8-byte keys — and the raw string column is gone from the
    exchange's input projection.

    Round 11: the hashed position relation is localCheckpoint-ed (one
    tokenize+posexplode execution for its two consumers), so the xxhash64
    projection itself sits BEHIND the checkpoint; the visible plan starts at
    a Scan ExistingRDD whose shingle column must already be the 8-byte long
    — asserted via the L suffix both there and on every shingle exchange."""
    _, df = crafted
    plan = (
        substring_dedup(df, L, hash_shingles=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    # the checkpointed relation's shingle column is the 8-byte long
    rdd_cols = re.findall(r"Scan ExistingRDD\[doc_id#\d+L,pos#\d+,shingle#\d+(L?)\]", plan)
    assert rdd_cols and all(s == "L" for s in rdd_cols), plan[:400]
    # every hashpartitioning on the shingle key is on the long (L-suffixed) col
    keys = re.findall(r"hashpartitioning\(shingle#\d+(L?)", plan)
    assert keys and all(suffix == "L" for suffix in keys), keys
