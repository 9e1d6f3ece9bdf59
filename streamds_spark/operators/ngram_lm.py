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


def kn_doc_nll(scored_bigrams: DataFrame) -> DataFrame:
    """Per-document mean negative log-likelihood (the CCNet ranking score;
    ppl = exp(avg_nll), kept in log space for float stability):
    (doc_id, n_bigrams, avg_nll)."""
    return scored_bigrams.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        (F.round(-F.avg(F.log("p")), 4) + F.lit(0.0)).alias("avg_nll"),
    )
