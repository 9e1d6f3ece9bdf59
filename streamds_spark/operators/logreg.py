"""Distributed logistic-regression trainer over hashed text features — the
training side of the quality-classifier story (queries/llmdata/extras.py's
quality_classifier_score is inference with fixed weights; this learns them
in-engine, fastText-style: hashed bag-of-words + linear model).

Pure DataFrame batch gradient descent, no Python in the data path:
  per iteration —
    1. scores: features ⋈ broadcast weight table on feature id, groupBy(doc)
       sum(v * w) (one doc-keyed shuffle);
    2. residuals: sigmoid(score) - y per doc (map-only);
    3. gradient: features ⋈ residuals, groupBy(feature id) sum(r * v)
       (one feature-keyed shuffle onto a <= dim-sized key space);
    4. driver updates w (dim+1 floats — same driver-state class as k-means
       centroids) and rebroadcasts.
At 100 TB each iteration is two bounded shuffles over the (doc, feature)
relation; dim caps the model, not the corpus. The cached feature relation is
built once (explode + count per (doc, feature))."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamds_spark.functions.hashing import md5_int60
from streamds_spark.functions.text import tokens

DIM = 1024  # hashed feature space (bias gets id = DIM)


def hashed_tf(docs: DataFrame, text_col: str = "text", dim: int = DIM) -> DataFrame:
    """(doc_id, j, v): hashed term-frequency features, L1-normalized per doc,
    plus a bias feature j=dim with v=1."""
    tf = (
        docs.select("doc_id", F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"))
        .select("doc_id", (md5_int60(F.col("tok")) % dim).alias("j"))
        .groupBy("doc_id", "j")
        .agg(F.count("*").alias("c"))
    )
    totals = tf.groupBy("doc_id").agg(F.sum("c").alias("n"))
    feats = tf.join(totals, "doc_id").select(
        "doc_id", "j", (F.col("c").cast("double") / F.col("n")).alias("v")
    )
    bias = totals.select("doc_id", F.lit(dim).alias("j"), F.lit(1.0).alias("v"))
    return feats.unionByName(bias)


def train_logreg(
    features: DataFrame,
    labels: DataFrame,
    dim: int = DIM,
    iters: int = 10,
    lr: float = 2.0,
) -> "tuple[dict, list]":
    """Batch GD for logistic regression; returns (weights {j: w}, per-iter
    mean log-loss). features = (doc_id, j, v) [cached by caller for iteration
    reuse], labels = (doc_id, y) with y in {0, 1}.

    The loss/gradient denominator is the number of docs actually present in
    the scores-labels join (counted in the same aggregate as the loss — no
    extra job), NOT labels.count(): a labeled doc with no feature rows (e.g.
    empty/whitespace-only text yields no tokens and hence no bias row from
    hashed_tf) contributes nothing to the sums and must not deflate the mean
    loss or shrink the effective step size."""
    spark = features.sparkSession
    w: dict = {}
    losses = []
    for _ in range(iters):
        wdf = spark.createDataFrame(
            list(w.items()) or [(0, 0.0)], "j long, wj double"
        )
        scores = (
            features.join(F.broadcast(wdf), "j", "left")
            .groupBy("doc_id")
            .agg(F.sum(F.col("v") * F.coalesce("wj", F.lit(0.0))).alias("s"))
        )
        resid = scores.join(labels, "doc_id").select(
            "doc_id",
            (1.0 / (1.0 + F.exp(-F.col("s"))) - F.col("y")).alias("r"),
            # log-loss via the numerically-stable softplus form
            (
                F.when(F.col("s") > 0, F.col("s") - F.col("y") * F.col("s"))
                .otherwise(-F.col("y") * F.col("s"))
                + F.log1p(F.exp(-F.abs("s")))
            ).alias("ll"),
        )
        # the loss collect and the gradient collect are two Spark actions —
        # cache the per-doc residuals so the scores shuffle runs once per
        # iteration, not twice
        resid = resid.cache()
        try:
            agg = resid.agg(
                F.sum("ll").alias("ll"), F.count("*").alias("n")
            ).collect()[0]
            if agg.ll is None:
                raise ValueError(
                    "features and labels share no doc_ids — nothing to train on"
                )
            n_docs = int(agg.n)
            losses.append(float(agg.ll) / n_docs)
            grad_rows = (
                features.join(resid.select("doc_id", "r"), "doc_id")
                .groupBy("j")
                .agg(F.sum(F.col("r") * F.col("v")).alias("g"))
                .collect()
            )
        finally:
            resid.unpersist()
        for row in grad_rows:
            w[row.j] = w.get(row.j, 0.0) - lr * row.g / n_docs
    return w, losses


def predict_scores(features: DataFrame, w: dict) -> DataFrame:
    """(doc_id, p): sigmoid scores under trained weights (broadcast join —
    the same shape quality_classifier_score uses for inference)."""
    spark = features.sparkSession
    wdf = spark.createDataFrame(list(w.items()), "j long, wj double")
    return (
        features.join(F.broadcast(wdf), "j", "left")
        .groupBy("doc_id")
        .agg(F.sum(F.col("v") * F.coalesce("wj", F.lit(0.0))).alias("s"))
        .select("doc_id", (1.0 / (1.0 + F.exp(-F.col("s")))).alias("p"))
    )
