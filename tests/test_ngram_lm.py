"""Interpolated Kneser-Ney bigram LM: pure-Python parity, exact
normalization, and OOV backoff behavior."""

import math

import pytest
from pyspark.sql import functions as F

from streamds_spark.operators.ngram_lm import (
    doc_bigrams,
    kn_bigram_model,
    kn_doc_nll,
    kn_score_bigrams,
)

D = 0.75
FLOOR = 1e-10

TRAIN = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
    "the cat saw the dog",
]
SCORE = [
    (0, "the cat sat"),          # all bigrams seen
    (1, "the zebra sat"),        # seen w1, unseen w2 / unseen w1, seen w2
    (2, "qq zz"),                # both fully OOV -> floor
    (3, "single"),               # <2 tokens -> absent from output
]


def py_kn(train_sentences):
    """Pure-Python reference for the interpolated-KN bigram model."""
    c2 = {}
    for s in train_sentences:
        t = s.split()
        for w1, w2 in zip(t, t[1:]):
            c2[(w1, w2)] = c2.get((w1, w2), 0) + 1
    c1, n1f, n1b = {}, {}, {}
    for (w1, w2), c in c2.items():
        c1[w1] = c1.get(w1, 0) + c
        n1f[w1] = n1f.get(w1, 0) + 1
        n1b[w2] = n1b.get(w2, 0) + 1
    bt = float(sum(n1b.values()))

    def p(w1, w2):
        pcont = n1b.get(w2, 0) / bt
        if w1 in c1:
            val = max(c2.get((w1, w2), 0) - D, 0.0) / c1[w1] + D * n1f[
                w1
            ] / c1[w1] * pcont
        else:
            val = pcont
        return max(val, FLOOR)

    return p, c1, n1f, c2, n1b, bt


@pytest.fixture(scope="module")
def model(spark):
    train = spark.createDataFrame(
        [(i, s) for i, s in enumerate(TRAIN)], "doc_id int, text string"
    )
    return kn_bigram_model(doc_bigrams(train).select("w1", "w2"))


def test_matches_python_reference(spark, model):
    docs = spark.createDataFrame(SCORE, "doc_id int, text string")
    scored = kn_score_bigrams(doc_bigrams(docs), model)
    rows = scored.select("doc_id", "w1", "w2", "p").collect()
    pref, *_ = py_kn(TRAIN)
    assert rows, "no scored bigrams"
    for r in rows:
        assert r.p == pytest.approx(pref(r.w1, r.w2), abs=1e-12), (r.w1, r.w2)
    # doc 3 has a single token: no bigrams, absent by contract
    assert {r.doc_id for r in rows} == {0, 1, 2}


def test_exact_normalization_over_vocabulary(spark, model):
    """For every seen left word, P(.|w1) sums to exactly 1 over the full
    continuation vocabulary: the discounted mass D*N1+(w1.)/c(w1.) is
    restored by the Pcont backoff term."""
    vocab = [r.v2 for r in model["right"].select("v2").collect()]
    lefts = [r.u1 for r in model["left"].select("u1").collect()]
    grid = spark.createDataFrame(
        [(w1, w2) for w1 in lefts for w2 in vocab], "w1 string, w2 string"
    ).withColumn("doc_id", F.lit(0))
    sums = (
        kn_score_bigrams(grid, model)
        .groupBy("w1")
        .agg(F.sum("p").alias("total"))
        .collect()
    )
    assert len(sums) == len(lefts)
    for r in sums:
        assert r.total == pytest.approx(1.0, abs=1e-9), r.w1


def test_oov_backoff_chain(spark, model):
    docs = spark.createDataFrame(
        [(0, "zzz the"), (1, "zzz qqq")], "doc_id int, text string"
    )
    rows = {
        (r.w1, r.w2): r.p
        for r in kn_score_bigrams(doc_bigrams(docs), model).collect()
    }
    _, _, _, _, n1b, bt = py_kn(TRAIN)
    # unseen w1, seen w2 -> pure continuation probability
    assert rows[("zzz", "the")] == pytest.approx(n1b["the"] / bt, abs=1e-12)
    # both unseen -> floor (guards log(0))
    assert rows[("zzz", "qqq")] == FLOOR


def test_doc_nll_aggregation(spark, model):
    docs = spark.createDataFrame(SCORE[:1], "doc_id int, text string")
    out = kn_doc_nll(kn_score_bigrams(doc_bigrams(docs), model)).collect()
    assert len(out) == 1
    pref, *_ = py_kn(TRAIN)
    t = SCORE[0][1].split()
    expected = -sum(
        math.log(pref(a, b)) for a, b in zip(t, t[1:])
    ) / (len(t) - 1)
    assert out[0].n_bigrams == len(t) - 1
    # full precision — the round(.,4) oracle normalization lives in the
    # registered query layer, not the operator
    assert out[0].avg_nll == pytest.approx(expected, rel=1e-12)


def test_no_nested_loop_in_scoring_plan(spark, model):
    """Scoring is three equi-joins + one broadcast 1-row total: the plan must
    not fall back to a cartesian/nested-loop join for the model lookups."""
    docs = spark.createDataFrame(SCORE, "doc_id int, text string")
    plan = (
        kn_score_bigrams(doc_bigrams(docs), model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # the only nested-loop allowed is the broadcast of the 1-row total
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_save_load_roundtrip(spark, model, tmp_path):
    from streamds_spark.operators.ngram_lm import load_kn_model, save_kn_model

    path = str(tmp_path / "kn_model")
    save_kn_model(model, path)
    loaded = load_kn_model(spark, path)
    docs = spark.createDataFrame(SCORE, "doc_id int, text string")
    before = {
        (r.doc_id, r.w1, r.w2): r.p
        for r in kn_score_bigrams(doc_bigrams(docs), model).collect()
    }
    after = {
        (r.doc_id, r.w1, r.w2): r.p
        for r in kn_score_bigrams(doc_bigrams(docs), loaded).collect()
    }
    assert before == after


@pytest.mark.slow
def test_stream_scoring_equals_batch(spark, model, tmp_path):
    """Train once, score continuously: a file stream scored against the
    persisted model in foreachBatch lands on exactly the batch scores."""
    import os

    from streamds_spark.operators.ngram_lm import load_kn_model, save_kn_model

    mpath = str(tmp_path / "kn_model")
    save_kn_model(model, mpath)
    loaded = load_kn_model(spark, mpath)

    src = str(tmp_path / "docs_in")
    os.makedirs(src)
    for i, (doc_id, text) in enumerate(SCORE):
        spark.createDataFrame(
            [(doc_id, text)], "doc_id int, text string"
        ).coalesce(1).write.parquet(f"{src}/chunk_{i}")
    out = str(tmp_path / "scores_out")

    bt = float(loaded["total"].collect()[0].bt)

    def score_batch(df, _bid):
        scored = kn_score_bigrams(
            doc_bigrams(df), loaded, total_literal=bt
        )
        kn_doc_nll(scored).write.mode("append").parquet(out)

    q = (
        spark.readStream.schema("doc_id int, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/chunk_*")
        .writeStream.foreachBatch(score_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    docs = spark.createDataFrame(SCORE, "doc_id int, text string")
    batch = {
        r.doc_id: (r.n_bigrams, r.avg_nll)
        for r in kn_doc_nll(kn_score_bigrams(doc_bigrams(docs), model)).collect()
    }
    streamed = {
        r.doc_id: (r.n_bigrams, r.avg_nll)
        for r in spark.read.parquet(out).collect()
    }
    assert streamed == batch


@pytest.mark.slow
def test_stream_static_join_transform(spark, model, tmp_path):
    """kn_score_stream: the direct stream-static append-mode transform (no
    foreachBatch) produces the batch per-bigram probabilities."""
    import os

    from streamds_spark.operators.ngram_lm import kn_score_stream

    src = str(tmp_path / "docs_in2")
    os.makedirs(src)
    spark.createDataFrame(SCORE, "doc_id int, text string").coalesce(1).write.parquet(
        f"{src}/all"
    )
    stream = (
        spark.readStream.schema("doc_id int, text string").parquet(f"{src}/all")
    )
    q = (
        kn_score_stream(stream, model)
        .select("doc_id", "w1", "w2", "p")
        .writeStream.format("memory")
        .queryName("kn_stream_scores")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.doc_id, r.w1, r.w2): r.p
        for r in spark.sql("select * from kn_stream_scores").collect()
    }
    docs = spark.createDataFrame(SCORE, "doc_id int, text string")
    want = {
        (r.doc_id, r.w1, r.w2): r.p
        for r in kn_score_bigrams(doc_bigrams(docs), model).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# Trigram model (kn_trigram_model / kn3_score_trigrams)

from streamds_spark.operators.ngram_lm import (  # noqa: E402
    doc_trigrams,
    kn3_doc_nll,
    kn3_score_trigrams,
    kn_trigram_model,
)

SCORE3 = [
    (0, "the cat sat on"),        # all trigrams seen
    (1, "the cat saw a zebra"),   # mixes seen context / unseen continuation
    (2, "qq zz yy"),              # fully OOV -> floor
    (3, "two words"),             # <3 tokens -> absent from output
]


def py_kn3(train_sentences):
    """Pure-Python interpolated-KN trigram reference (Chen & Goodman:
    raw counts at the top order, continuation counts below)."""
    c3 = {}
    for s in train_sentences:
        t = s.split()
        for w1, w2, w3 in zip(t, t[1:], t[2:]):
            c3[(w1, w2, w3)] = c3.get((w1, w2, w3), 0) + 1
    cx, n3f, cc2 = {}, {}, {}
    for (w1, w2, w3), c in c3.items():
        cx[(w1, w2)] = cx.get((w1, w2), 0) + c
        n3f[(w1, w2)] = n3f.get((w1, w2), 0) + 1
        cc2[(w2, w3)] = cc2.get((w2, w3), 0) + 1
    ccz, n2f, n1b = {}, {}, {}
    for (w2, w3), c in cc2.items():
        ccz[w2] = ccz.get(w2, 0) + c
        n2f[w2] = n2f.get(w2, 0) + 1
        n1b[w3] = n1b.get(w3, 0) + 1
    bt = float(sum(n1b.values()))

    def p(w1, w2, w3):
        p1 = n1b.get(w3, 0) / bt
        if w2 in ccz:
            p2 = max(cc2.get((w2, w3), 0) - D, 0.0) / ccz[w2] + D * n2f[
                w2
            ] / ccz[w2] * p1
        else:
            p2 = p1
        if (w1, w2) in cx:
            p3 = max(c3.get((w1, w2, w3), 0) - D, 0.0) / cx[(w1, w2)] + D * n3f[
                (w1, w2)
            ] / cx[(w1, w2)] * p2
        else:
            p3 = p2
        return max(p3, FLOOR)

    return p, cx, ccz, n1b, bt


@pytest.fixture(scope="module")
def model3(spark):
    train = spark.createDataFrame(
        [(i, s) for i, s in enumerate(TRAIN)], "doc_id int, text string"
    )
    return kn_trigram_model(doc_trigrams(train).select("w1", "w2", "w3"))


def test_trigram_matches_python_reference(spark, model3):
    docs = spark.createDataFrame(SCORE3, "doc_id int, text string")
    rows = (
        kn3_score_trigrams(doc_trigrams(docs), model3)
        .select("doc_id", "w1", "w2", "w3", "p")
        .collect()
    )
    pref, *_ = py_kn3(TRAIN)
    assert rows, "no scored trigrams"
    for r in rows:
        assert r.p == pytest.approx(pref(r.w1, r.w2, r.w3), abs=1e-12), (
            r.w1, r.w2, r.w3,
        )
    # doc 3 has two tokens: no trigrams, absent by contract
    assert {r.doc_id for r in rows} == {0, 1, 2}


def test_trigram_exact_normalization(spark, model3):
    """For every seen context (w1,w2), P(.|w1,w2) sums to exactly 1 over the
    continuation vocabulary — and so does the backoff bigram level for every
    seen w2: the discounted mass at each order is exactly restored one order
    down (the interpolated-KN invariant, now two levels deep)."""
    vocab = [r.v3 for r in model3["cont1"].select("v3").collect()]
    ctxs = [(r.x1, r.x2) for r in model3["ctx"].select("x1", "x2").collect()]
    grid = spark.createDataFrame(
        [(a, b, w) for a, b in ctxs for w in vocab],
        "w1 string, w2 string, w3 string",
    ).withColumn("doc_id", F.lit(0))
    sums = (
        kn3_score_trigrams(grid, model3)
        .groupBy("w1", "w2")
        .agg(F.sum("p").alias("total"))
        .collect()
    )
    assert len(sums) == len(ctxs)
    for r in sums:
        assert r.total == pytest.approx(1.0, abs=1e-9), (r.w1, r.w2)


def test_trigram_oov_backoff_chain(spark, model3):
    docs = spark.createDataFrame(
        [(0, "zzz qqq the"), (1, "zzz the cat"), (2, "zzz qqq vvv")],
        "doc_id int, text string",
    )
    rows = {
        (r.w1, r.w2, r.w3): r.p
        for r in kn3_score_trigrams(doc_trigrams(docs), model3).collect()
    }
    pref, cx, ccz, n1b, bt = py_kn3(TRAIN)
    # unseen context, unseen w2 -> pure continuation unigram
    assert ("zzz", "qqq") not in cx and "qqq" not in ccz
    assert rows[("zzz", "qqq", "the")] == pytest.approx(
        n1b["the"] / bt, abs=1e-12
    )
    # unseen context, seen w2 -> bigram-level continuation backoff
    assert rows[("zzz", "the", "cat")] == pytest.approx(
        pref("zzz", "the", "cat"), abs=1e-12
    )
    # everything unseen -> floor
    assert rows[("zzz", "qqq", "vvv")] == FLOOR


def test_trigram_doc_nll(spark, model3):
    docs = spark.createDataFrame(SCORE3[:1], "doc_id int, text string")
    out = kn3_doc_nll(kn3_score_trigrams(doc_trigrams(docs), model3)).collect()
    pref, *_ = py_kn3(TRAIN)
    t = SCORE3[0][1].split()
    expected = -sum(
        math.log(pref(a, b, c)) for a, b, c in zip(t, t[1:], t[2:])
    ) / (len(t) - 2)
    assert out[0].n_trigrams == len(t) - 2
    assert out[0].avg_nll == pytest.approx(expected, rel=1e-12)


def test_reserved_column_guards(spark, model, model3):
    bad2 = spark.createDataFrame([("a", "b", 1.0)], "w1 string, w2 string, c1 double")
    with pytest.raises(ValueError, match="reserved model column"):
        kn_score_bigrams(bad2, model)
    bad3 = spark.createDataFrame(
        [("a", "b", "c", 1.0)], "w1 string, w2 string, w3 string, ccz double"
    )
    with pytest.raises(ValueError, match="reserved model column"):
        kn3_score_trigrams(bad3, model3)


# ---------------------------------------------------------------------------
# Generic order-n construction (kn_ngram_model / kn_ngram_score)

from streamds_spark.operators.ngram_lm import (  # noqa: E402
    doc_ngrams,
    kn_ngram_doc_nll,
    kn_ngram_model,
    kn_ngram_score,
)


def py_kn_n(train_sentences, order, D=0.75, floor=1e-10):
    """Pure-Python generic interpolated-KN reference for any order."""
    lvl = {}
    top = {}
    for s in train_sentences:
        t = s.split()
        for i in range(len(t) - order + 1):
            g = tuple(t[i : i + order])
            top[g] = top.get(g, 0) + 1
    lvl[order] = top
    for k in range(order - 1, 0, -1):
        lower = {}
        for g in lvl[k + 1]:
            lower[g[1:]] = lower.get(g[1:], 0) + 1
        lvl[k] = lower
    ctx = {}
    for k in range(order, 1, -1):
        t_k, y_k = {}, {}
        for g, c in lvl[k].items():
            t_k[g[:-1]] = t_k.get(g[:-1], 0) + c
            y_k[g[:-1]] = y_k.get(g[:-1], 0) + 1
        ctx[k] = (t_k, y_k)
    bt = float(sum(lvl[1].values()))

    def p(gram):
        val = lvl[1].get(gram[-1:], 0) / bt
        for k in range(2, order + 1):
            t_k, y_k = ctx[k]
            c = gram[-k:-1] if k > 1 else ()
            if c in t_k:
                cnt = lvl[k].get(gram[-k:], 0)
                val = max(cnt - D, 0.0) / t_k[c] + D * y_k[c] / t_k[c] * val
        return max(val, floor)

    return p


def test_generic_order2_bit_identical_to_bigram(spark, model):
    train = spark.createDataFrame(
        [(i, s) for i, s in enumerate(TRAIN)], "doc_id int, text string"
    )
    docs = spark.createDataFrame(SCORE, "doc_id int, text string")
    g2 = kn_ngram_model(doc_ngrams(train, 2).select("w1", "w2"), 2)
    a = {
        (r.w1, r.w2): r.p for r in kn_score_bigrams(doc_bigrams(docs), model).collect()
    }
    b = {
        (r.w1, r.w2): r.p
        for r in kn_ngram_score(doc_ngrams(docs, 2), g2, 2).collect()
    }
    assert a == b  # bit-identical, not approx


def test_generic_order3_bit_identical_to_trigram(spark, model3):
    train = spark.createDataFrame(
        [(i, s) for i, s in enumerate(TRAIN)], "doc_id int, text string"
    )
    docs = spark.createDataFrame(SCORE3, "doc_id int, text string")
    g3 = kn_ngram_model(doc_ngrams(train, 3).select("w1", "w2", "w3"), 3)
    a = {
        (r.w1, r.w2, r.w3): r.p
        for r in kn3_score_trigrams(doc_trigrams(docs), model3).collect()
    }
    b = {
        (r.w1, r.w2, r.w3): r.p
        for r in kn_ngram_score(doc_ngrams(docs, 3), g3, 3).collect()
    }
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], rel=1e-14), k


def test_generic_order4_matches_python_reference(spark):
    order = 4
    train = spark.createDataFrame(
        [(i, s) for i, s in enumerate(TRAIN)], "doc_id int, text string"
    )
    docs = spark.createDataFrame(
        [(0, "the cat sat on the zebra"), (1, "a dog and a cat sat")],
        "doc_id int, text string",
    )
    cols = [f"w{i}" for i in range(1, order + 1)]
    m = kn_ngram_model(doc_ngrams(train, order).select(*cols), order)
    pref = py_kn_n(TRAIN, order)
    rows = kn_ngram_score(doc_ngrams(docs, order), m, order).collect()
    assert rows
    for r in rows:
        gram = tuple(getattr(r, c) for c in cols)
        assert r.p == pytest.approx(pref(gram), abs=1e-12), gram


def test_generic_order4_normalization(spark):
    """Sum of P(.|ctx) over the continuation vocabulary == 1 for every seen
    context — the KN invariant at depth 3 of the backoff chain."""
    order = 4
    train = spark.createDataFrame(
        [(i, s) for i, s in enumerate(TRAIN)], "doc_id int, text string"
    )
    cols = [f"w{i}" for i in range(1, order + 1)]
    m = kn_ngram_model(doc_ngrams(train, order).select(*cols), order)
    vocab = [r[0] for r in m["lvl1"].select("g1_1").collect()]
    ctxs = [tuple(r) for r in m[f"ctx{order}"].select(
        *[f"x{order}_{i + 1}" for i in range(order - 1)]
    ).collect()]
    grid = spark.createDataFrame(
        [c + (w,) for c in ctxs for w in vocab],
        ", ".join(f"w{i} string" for i in range(1, order + 1)),
    ).withColumn("doc_id", F.lit(0))
    sums = (
        kn_ngram_score(grid, m, order)
        .groupBy(*[f"w{i}" for i in range(1, order)])
        .agg(F.sum("p").alias("total"))
        .collect()
    )
    assert len(sums) == len(ctxs)
    for r in sums:
        assert r.total == pytest.approx(1.0, abs=1e-9), tuple(r)


def test_generic_guards(spark):
    train = spark.createDataFrame(
        [(i, s) for i, s in enumerate(TRAIN)], "doc_id int, text string"
    )
    with pytest.raises(ValueError, match="order"):
        doc_ngrams(train, 1)
    with pytest.raises(ValueError, match="order"):
        kn_ngram_model(doc_ngrams(train, 2), 9)
    m = kn_ngram_model(doc_ngrams(train, 2).select("w1", "w2"), 2)
    bad = spark.createDataFrame([("a", "b", 1.0)], "w1 string, w2 string, t2 double")
    with pytest.raises(ValueError, match="reserved"):
        kn_ngram_score(bad, m, 2)
