"""Interpolated Kneser-Ney bigram language model, trained and applied as
DataFrame aggregations — the CCNet-style perplexity filter (Wenzek et al.
2020 train a KenLM on a trusted reference corpus and keep web documents whose
perplexity under it is low; Kneser-Ney smoothing per Kneser & Ney 1995 /
Chen & Goodman 1999, re-derived here with the fixed-discount interpolated
form).

Reference-capability note: the reference stack (StreamDS) has no statistical
LM; this extends the LLM-data layer the same way its operator binaries extend
grep (`operators/*.go` are fixed transforms; here the transform is a trained
model). Cited for parity bookkeeping only.

Model (discount D, default 0.75):
    P(w2|w1) = max(c(w1,w2) - D, 0) / c(w1*)
               + D * N1+(w1*) / c(w1*) * Pcont(w2)          if w1 seen
    P(w2|w1) = Pcont(w2)                                     if w1 unseen
    Pcont(w2) = N1+(*w2) / N1+(**)
where c(w1*) = sum_w2 c(w1,w2), N1+(w1*) = #distinct continuations of w1,
N1+(*w2) = #distinct left-contexts of w2, N1+(**) = #distinct bigram types.
A 1e-10 floor guards log(0) when both words are out-of-vocabulary.

The seen-w1 branch is exactly normalized: summing over the full continuation
vocabulary, sum(max(c-D,0))/c(w1*) = 1 - D*N1+(w1*)/c(w1*) and the backoff
term restores precisely that mass (property-tested in tests/test_ngram_lm.py).

Scale design (100 TB corpus):
  - Training is two shuffled partial aggregations (bigram counts, then
    per-w1 / per-w2 rollups of the *count table*, which is vocabulary-sized,
    not corpus-sized). N1+(**) is a 1-row aggregate broadcast back via a
    crossJoin of a single row.
  - The model tables are NOT broadcast — a web-scale bigram vocabulary can
    be billions of types — scoring joins shuffle on w1 / w2 where Zipf skew
    is AQE-splittable (same shape as text_bigram_logprob, the proven plan).
  - Nothing driver-side: no collect anywhere; the model stays distributed.
  - No UDFs: pure built-in expressions end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from streamds_spark.functions.text import tokens


def doc_bigrams(
    docs: DataFrame, text_col: str = "text", keep: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """(*keep, w1, w2) stream of adjacent whitespace-token pairs; documents
    with fewer than two tokens produce no rows (and are absent from scores).
    Extra `keep` columns ride the explode — cheaper than joining them back
    on doc_id afterwards (that would be a corpus-keyed shuffle)."""
    toks = docs.select(
        *keep, tokens(F.col(text_col)).alias("t")
    ).filter(F.size("t") >= 2)
    return toks.select(
        *keep,
        F.explode(
            F.arrays_zip(
                F.expr("slice(t, 1, size(t) - 1)").alias("w1"),
                F.expr("slice(t, 2, size(t) - 1)").alias("w2"),
            )
        ).alias("p"),
    ).select(*keep, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))


def kn_bigram_model(train_bigrams: DataFrame) -> dict[str, DataFrame]:
    """Train the interpolated-KN bigram model from a (w1, w2) bigram stream.

    Returns four DataFrames (the distributed model):
      pair:  (b1, b2, c2)        bigram occurrence counts
      left:  (u1, c1, n1f)       c(w1*) and N1+(w1*) per left word
      right: (v2, n1b)           N1+(*w2) per right word
      total: (bt,)               one row: N1+(**) as double
    All are aggregates of the pair-count table, so their size tracks
    vocabulary, not corpus rows."""
    # the pair-count table feeds FOUR consumers (left/right/total rollups +
    # the scoring join) — a lazy localCheckpoint makes the sharing structural
    # (one vocab-sized materialization at first action) instead of relying on
    # runtime ReusedExchange across four replicated count subtrees; lazy so
    # no job runs at plan-build time (driver contract)
    pair = (
        train_bigrams.groupBy(F.col("w1").alias("b1"), F.col("w2").alias("b2"))
        .agg(F.count("*").alias("c2"))
        .localCheckpoint(eager=False)
    )
    left = pair.groupBy(F.col("b1").alias("u1")).agg(
        F.sum("c2").cast("double").alias("c1"),
        F.count("*").cast("double").alias("n1f"),
    )
    right = pair.groupBy(F.col("b2").alias("v2")).agg(
        F.count("*").cast("double").alias("n1b")
    )
    total = right.agg(F.sum("n1b").cast("double").alias("bt"))
    return {"pair": pair, "left": left, "right": right, "total": total}


def kn_probability_expr(discount: float = 0.75, floor: float = 1e-10) -> Column:
    """P(w2|w1) over a row that has been left-joined with the model tables
    (columns c2, c1, n1f, n1b, bt; nulls = unseen). The expression mirrors the
    DuckDB oracle twin operation-for-operation so both engines round alike."""
    d = F.lit(float(discount))
    pcont = F.coalesce(F.col("n1b"), F.lit(0.0)) / F.col("bt")
    seen = (
        F.greatest(
            F.coalesce(F.col("c2"), F.lit(0)).cast("double") - d, F.lit(0.0)
        )
        / F.col("c1")
        + d * F.col("n1f") / F.col("c1") * pcont
    )
    return F.greatest(
        F.when(F.col("c1").isNotNull(), seen).otherwise(pcont), F.lit(float(floor))
    )


_BIGRAM_RESERVED = ("b1", "b2", "u1", "v2", "c2", "c1", "n1f", "n1b", "bt")


def kn_score_bigrams(
    bigrams: DataFrame,
    model: dict[str, DataFrame],
    discount: float = 0.75,
    total_literal: float | None = None,
) -> DataFrame:
    """Attach P(w2|w1) to every bigram row (column `p`). Three left joins —
    pair counts on (w1,w2), left stats on w1, right stats on w2 — plus the
    1-row total, either broadcast-crossJoined (batch default) or inlined as
    a literal via `total_literal` (required for STREAMING inputs, where a
    stream-static cross join is not a supported shape). Unseen words fall
    through the KN backoff chain."""
    clash = [c for c in bigrams.columns if c in _BIGRAM_RESERVED]
    if clash:
        raise ValueError(
            f"bigrams DataFrame carries reserved model column(s) {clash}; "
            f"rename them — {_BIGRAM_RESERVED} are joined in and dropped here "
            "(same contract as overlap_join's reserved _BIN guard)"
        )
    scored = (
        bigrams.join(
            model["pair"],
            (bigrams.w1 == F.col("b1")) & (bigrams.w2 == F.col("b2")),
            "left",
        )
        .join(model["left"], bigrams.w1 == F.col("u1"), "left")
        .join(model["right"], bigrams.w2 == F.col("v2"), "left")
    )
    if total_literal is None:
        scored = scored.crossJoin(F.broadcast(model["total"]))
    else:
        scored = scored.withColumn("bt", F.lit(float(total_literal)))
    return scored.withColumn("p", kn_probability_expr(discount)).drop(
        "b1", "b2", "u1", "v2", "c2", "c1", "n1f", "n1b", "bt"
    )


_MODEL_PARTS = ("pair", "left", "right", "total")


def save_kn_model(model: dict[str, DataFrame], path: str) -> None:
    """Persist the four model tables as parquet under `path` — the
    train-once artifact for continuous scoring. The pair table is the only
    corpus-derived one and is vocabulary-sized; at web scale the write is a
    normal distributed parquet job."""
    for part in _MODEL_PARTS:
        model[part].write.mode("overwrite").parquet(f"{path}/{part}")


def load_kn_model(spark, path: str) -> dict[str, DataFrame]:
    """Load a persisted model (see save_kn_model)."""
    return {part: spark.read.parquet(f"{path}/{part}") for part in _MODEL_PARTS}


def kn_score_stream(
    stream_docs: DataFrame, model: dict[str, DataFrame], discount: float = 0.75
) -> DataFrame:
    """Score a STREAMING documents DataFrame (doc_id, text, ...) against a
    static (persisted) model: per-bigram probabilities in append mode via
    stream-static left joins — the train-once / score-continuously half of
    the CCNet recipe. The 1-row N1+(**) total is collected ONCE at stream
    setup (a single scalar; the model is static by definition) and inlined
    as a literal, since stream-static CROSS joins are unsupported. Per-doc
    aggregation belongs in foreachBatch or a watermarked agg downstream."""
    bt = float(model["total"].collect()[0].bt)
    return kn_score_bigrams(
        doc_bigrams(stream_docs), model, discount, total_literal=bt
    )


def doc_trigrams(
    docs: DataFrame, text_col: str = "text", keep: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """(*keep, w1, w2, w3) stream of adjacent whitespace-token triples;
    documents with fewer than three tokens produce no rows."""
    toks = docs.select(
        *keep, tokens(F.col(text_col)).alias("t")
    ).filter(F.size("t") >= 3)
    return toks.select(
        *keep,
        F.explode(
            F.arrays_zip(
                F.expr("slice(t, 1, size(t) - 2)").alias("w1"),
                F.expr("slice(t, 2, size(t) - 2)").alias("w2"),
                F.expr("slice(t, 3, size(t) - 2)").alias("w3"),
            )
        ).alias("p"),
    ).select(
        *keep,
        F.col("p.w1").alias("w1"),
        F.col("p.w2").alias("w2"),
        F.col("p.w3").alias("w3"),
    )


def kn_trigram_model(train_trigrams: DataFrame) -> dict[str, DataFrame]:
    """Interpolated Kneser-Ney TRIGRAM model (Chen & Goodman 1999: highest
    order uses raw counts, every lower order uses CONTINUATION counts) from a
    (w1, w2, w3) stream — the 5-gram-KenLM-shaped upgrade of the bigram
    filter, one more count-table rollup deep.

    Six DataFrames, all aggregates of the trigram-type table (so their size
    tracks vocabulary, not corpus rows):
      tri:   (a1, a2, a3, c3)   trigram occurrence counts
      ctx:   (x1, x2, cx, n3f)  c(w1 w2 *) and N1+(w1 w2 *)
      cont2: (y2, y3, cc2)      N1+(* w2 w3)   — the bigram-level
                                continuation counts (distinct left contexts)
      ctx2:  (z2, ccz, n2f)     N1+(* w2 *) = sum over w3, and the number of
                                distinct w3 types following w2
      cont1: (v3, n1b)          N1+(* * w3) in continuation space
      total: (bt,)              one row: total distinct (w2, w3) types
    """
    tri = (
        train_trigrams.groupBy(
            F.col("w1").alias("a1"),
            F.col("w2").alias("a2"),
            F.col("w3").alias("a3"),
        )
        .agg(F.count("*").alias("c3"))
        .localCheckpoint(eager=False)  # feeds ctx, cont2, and the score join
    )
    ctx = tri.groupBy(F.col("a1").alias("x1"), F.col("a2").alias("x2")).agg(
        F.sum("c3").cast("double").alias("cx"),
        F.count("*").cast("double").alias("n3f"),
    )
    # tri rows are distinct (a1,a2,a3) types, so count(*) per (a2,a3) IS the
    # number of distinct left contexts N1+(*w2w3)
    cont2 = (
        tri.groupBy(F.col("a2").alias("y2"), F.col("a3").alias("y3"))
        .agg(F.count("*").cast("double").alias("cc2"))
        .localCheckpoint(eager=False)  # feeds ctx2, cont1, and the score join
    )
    ctx2 = cont2.groupBy(F.col("y2").alias("z2")).agg(
        F.sum("cc2").cast("double").alias("ccz"),
        F.count("*").cast("double").alias("n2f"),
    )
    cont1 = cont2.groupBy(F.col("y3").alias("v3")).agg(
        F.count("*").cast("double").alias("n1b")
    )
    total = cont1.agg(F.sum("n1b").cast("double").alias("bt"))
    return {
        "tri": tri,
        "ctx": ctx,
        "cont2": cont2,
        "ctx2": ctx2,
        "cont1": cont1,
        "total": total,
    }


def kn3_probability_expr(discount: float = 0.75, floor: float = 1e-10) -> Column:
    """P(w3|w1,w2) over a row left-joined with all five trigram-model tables.
    Three-level interpolation, each level exactly normalized (property-tested):
      p1 = N1+(**w3) / N1+(***)                       (continuation unigram)
      p2 = max(cc2-D,0)/ccz + D*n2f/ccz * p1           if w2 seen, else p1
      p3 = max(c3-D,0)/cx  + D*n3f/cx  * p2            if (w1,w2) seen, else p2
    """
    d = F.lit(float(discount))
    p1 = F.coalesce(F.col("n1b"), F.lit(0.0)) / F.col("bt")
    p2 = F.when(
        F.col("ccz").isNotNull(),
        F.greatest(F.coalesce(F.col("cc2"), F.lit(0.0)) - d, F.lit(0.0))
        / F.col("ccz")
        + d * F.col("n2f") / F.col("ccz") * p1,
    ).otherwise(p1)
    p3 = F.when(
        F.col("cx").isNotNull(),
        F.greatest(
            F.coalesce(F.col("c3"), F.lit(0)).cast("double") - d, F.lit(0.0)
        )
        / F.col("cx")
        + d * F.col("n3f") / F.col("cx") * p2,
    ).otherwise(p2)
    return F.greatest(p3, F.lit(float(floor)))


_TRIGRAM_RESERVED = (
    "a1", "a2", "a3", "c3", "x1", "x2", "cx", "n3f",
    "y2", "y3", "cc2", "z2", "ccz", "n2f", "v3", "n1b", "bt",
)


def kn3_score_trigrams(
    trigrams: DataFrame,
    model: dict[str, DataFrame],
    discount: float = 0.75,
    total_literal: float | None = None,
) -> DataFrame:
    """Attach P(w3|w1,w2) to every trigram row (column `p`): five left
    equi-joins against the model tables — none broadcast, web-scale trigram
    vocabularies are shuffle-joined on their word keys exactly like the
    bigram scorer — plus the 1-row total (broadcast crossJoin, or inlined as
    a literal for streaming inputs)."""
    clash = [c for c in trigrams.columns if c in _TRIGRAM_RESERVED]
    if clash:
        raise ValueError(
            f"trigrams DataFrame carries reserved model column(s) {clash}; "
            f"rename them — {_TRIGRAM_RESERVED} are joined in and dropped here"
        )
    scored = (
        trigrams.join(
            model["tri"],
            (trigrams.w1 == F.col("a1"))
            & (trigrams.w2 == F.col("a2"))
            & (trigrams.w3 == F.col("a3")),
            "left",
        )
        .join(
            model["ctx"],
            (trigrams.w1 == F.col("x1")) & (trigrams.w2 == F.col("x2")),
            "left",
        )
        .join(
            model["cont2"],
            (trigrams.w2 == F.col("y2")) & (trigrams.w3 == F.col("y3")),
            "left",
        )
        .join(model["ctx2"], trigrams.w2 == F.col("z2"), "left")
        .join(model["cont1"], trigrams.w3 == F.col("v3"), "left")
    )
    if total_literal is None:
        scored = scored.crossJoin(F.broadcast(model["total"]))
    else:
        scored = scored.withColumn("bt", F.lit(float(total_literal)))
    return scored.withColumn("p", kn3_probability_expr(discount)).drop(
        *_TRIGRAM_RESERVED
    )


def kn3_doc_nll(scored_trigrams: DataFrame) -> DataFrame:
    """Per-document mean negative trigram log-likelihood, full precision:
    (doc_id, n_trigrams, avg_nll)."""
    return scored_trigrams.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_trigrams"),
        (-F.avg(F.log("p"))).alias("avg_nll"),
    )


def kn_doc_nll(scored_bigrams: DataFrame) -> DataFrame:
    """Per-document mean negative log-likelihood (the CCNet ranking score;
    ppl = exp(avg_nll), kept in log space for float stability):
    (doc_id, n_bigrams, avg_nll). avg_nll is FULL precision — rounding for
    DuckDB-oracle parity belongs in the registered query layer, not here,
    where it would bake ranking ties into the persisted score-lm artifact."""
    return scored_bigrams.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        (-F.avg(F.log("p"))).alias("avg_nll"),
    )


# ---------------------------------------------------------------------------
# Generic order-n interpolated Kneser-Ney (the bigram/trigram construction
# above, folded into one recursion — real CCNet-style filters run 5-gram
# KenLM, and every extra order is one more continuation-count rollup)


def doc_ngrams(
    docs: DataFrame,
    order: int,
    text_col: str = "text",
    keep: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """(*keep, w1..w{order}) stream of adjacent whitespace-token n-grams;
    documents with fewer than `order` tokens produce no rows."""
    if not 2 <= order <= 8:
        raise ValueError(f"order must be in [2, 8], got {order}")
    toks = docs.select(*keep, tokens(F.col(text_col)).alias("t")).filter(
        F.size("t") >= order
    )
    return toks.select(
        *keep,
        F.explode(
            F.arrays_zip(
                *[
                    F.expr(f"slice(t, {k + 1}, size(t) - {order - 1})").alias(
                        f"w{k + 1}"
                    )
                    for k in range(order)
                ]
            )
        ).alias("g"),
    ).select(*keep, *[F.col(f"g.w{k + 1}").alias(f"w{k + 1}") for k in range(order)])


def kn_ngram_model(train_ngrams: DataFrame, order: int) -> dict[str, DataFrame]:
    """Order-n interpolated-KN model from a (w1..wn) stream — raw counts at
    the top order, continuation counts (distinct left-extension types) at
    every level below, exactly the Chen & Goodman recursion the bigram and
    trigram models above instantiate by hand.

    Tables (all rollups of the n-gram-TYPE table — vocabulary-sized):
      lvl{n}:           (g{n}_1..g{n}_n, c{n})    raw n-gram counts
      lvl{k}, k<n:      (g{k}_1..g{k}_k, c{k})    cc_k = distinct types in
                        lvl{k+1} sharing the last-k-gram (lvl rows are
                        distinct types, so count(*) IS the distinct count)
      ctx{k}, k>=2:     (x{k}_1..x{k}_{k-1}, t{k}, y{k})   per-context
                        total mass and continuation-type count of lvl{k}
      total:            (bt,)   1 row: sum of lvl1 counts
    Every lvl table feeds the next rollup, its own ctx rollup, and the
    scoring join — shared via lazy localCheckpoint."""
    if not 2 <= order <= 8:
        raise ValueError(f"order must be in [2, 8], got {order}")
    model: dict[str, DataFrame] = {}
    lvl = (
        train_ngrams.groupBy(
            *[F.col(f"w{i + 1}").alias(f"g{order}_{i + 1}") for i in range(order)]
        )
        .agg(F.count("*").alias(f"c{order}"))
        .localCheckpoint(eager=False)
    )
    model[f"lvl{order}"] = lvl
    for k in range(order - 1, 0, -1):
        # last-k-gram of the level-(k+1) key: positions (k+1-k+1 .. k+1)
        upper = model[f"lvl{k + 1}"]
        lvl_k = (
            upper.groupBy(
                *[
                    F.col(f"g{k + 1}_{i + 2}").alias(f"g{k}_{i + 1}")
                    for i in range(k)
                ]
            )
            .agg(F.count("*").cast("double").alias(f"c{k}"))
            .localCheckpoint(eager=False)
        )
        model[f"lvl{k}"] = lvl_k
    for k in range(order, 1, -1):
        model[f"ctx{k}"] = (
            model[f"lvl{k}"]
            .groupBy(
                *[F.col(f"g{k}_{i + 1}").alias(f"x{k}_{i + 1}") for i in range(k - 1)]
            )
            .agg(
                F.sum(f"c{k}").cast("double").alias(f"t{k}"),
                F.count("*").cast("double").alias(f"y{k}"),
            )
        )
    model["total"] = model["lvl1"].agg(F.sum("c1").cast("double").alias("bt"))
    return model


def kn_ngram_probability_expr(
    order: int, discount: float = 0.75, floor: float = 1e-10
) -> Column:
    """P(wn | w1..w{n-1}) over a row left-joined with all model tables:
    p1 = c1/bt, then for k = 2..n:
    p_k = max(cnt_k - D, 0)/t_k + D*y_k/t_k * p_{k-1} if ctx seen else p_{k-1}."""
    d = F.lit(float(discount))
    p = F.coalesce(F.col("c1"), F.lit(0.0)) / F.col("bt")
    for k in range(2, order + 1):
        cnt = F.coalesce(F.col(f"c{k}"), F.lit(0)).cast("double")
        seen = (
            F.greatest(cnt - d, F.lit(0.0)) / F.col(f"t{k}")
            + d * F.col(f"y{k}") / F.col(f"t{k}") * p
        )
        p = F.when(F.col(f"t{k}").isNotNull(), seen).otherwise(p)
    return F.greatest(p, F.lit(float(floor)))


def kn_ngram_score(
    ngrams: DataFrame,
    model: dict[str, DataFrame],
    order: int,
    discount: float = 0.75,
    total_literal: float | None = None,
) -> DataFrame:
    """Attach P(wn|w1..w{n-1}) (column `p`) to every n-gram row: 2(n-1)
    left equi-joins (one lvl + one ctx per order, shuffled on word keys —
    model tables never broadcast) plus the 1-row total."""
    reserved = [c for c in ngrams.columns if c == "bt" or _KN_COL.match(c)]
    if reserved:
        raise ValueError(
            f"ngrams DataFrame carries reserved model column(s) {reserved}"
        )
    scored = ngrams
    for k in range(order, 0, -1):
        # lvl{k} keys the LAST k score words: w{order-k+1}..w{order}
        cond = None
        for i in range(k):
            c = F.col(f"w{order - k + i + 1}") == F.col(f"g{k}_{i + 1}")
            cond = c if cond is None else (cond & c)
        scored = scored.join(model[f"lvl{k}"], cond, "left").drop(
            *[f"g{k}_{i + 1}" for i in range(k)]
        )
    for k in range(order, 1, -1):
        # ctx{k} keys the last k words MINUS the final one
        cond = None
        for i in range(k - 1):
            c = F.col(f"w{order - k + i + 1}") == F.col(f"x{k}_{i + 1}")
            cond = c if cond is None else (cond & c)
        scored = scored.join(model[f"ctx{k}"], cond, "left").drop(
            *[f"x{k}_{i + 1}" for i in range(k - 1)]
        )
    if total_literal is None:
        scored = scored.crossJoin(F.broadcast(model["total"]))
    else:
        scored = scored.withColumn("bt", F.lit(float(total_literal)))
    drop_cols = ["bt"] + [f"c{k}" for k in range(1, order + 1)] + [
        c for k in range(2, order + 1) for c in (f"t{k}", f"y{k}")
    ]
    return scored.withColumn(
        "p", kn_ngram_probability_expr(order, discount)
    ).drop(*drop_cols)


import re as _re  # noqa: E402

_KN_COL = _re.compile(r"^(c\d+|t\d+|y\d+|g\d+_\d+|x\d+_\d+)$")


def kn_ngram_doc_nll(scored: DataFrame) -> DataFrame:
    """(doc_id, n_ngrams, avg_nll) — full precision, as kn_doc_nll."""
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_ngrams"),
        (-F.avg(F.log("p"))).alias("avg_nll"),
    )


def save_kn_ngram_model(model: dict[str, DataFrame], order: int, path: str) -> None:
    """Persist a generic order-n model: every lvl/ctx table + total as
    parquet, plus a meta.json carrying the order (the load-side dispatch
    key). Same train-once artifact contract as save_kn_model."""
    import json
    import os

    parts = (
        [f"lvl{k}" for k in range(1, order + 1)]
        + [f"ctx{k}" for k in range(2, order + 1)]
        + ["total"]
    )
    for part in parts:
        model[part].write.mode("overwrite").parquet(f"{path}/{part}")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"order": order}, f)


def load_kn_ngram_model(spark, path: str) -> tuple[dict[str, DataFrame], int]:
    """Load a persisted generic model; returns (model, order)."""
    import json
    import os

    with open(os.path.join(path, "meta.json")) as f:
        order = int(json.load(f)["order"])
    parts = (
        [f"lvl{k}" for k in range(1, order + 1)]
        + [f"ctx{k}" for k in range(2, order + 1)]
        + ["total"]
    )
    return {p: spark.read.parquet(f"{path}/{p}") for p in parts}, order
