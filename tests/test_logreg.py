"""Distributed logistic regression (operators/logreg.py): loss descent,
learned separation on a separable corpus, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamds_spark.operators.logreg import hashed_tf, predict_scores, train_logreg
import pytest

EN = "the cat is in the house and that is fine with me today again"
DE = "der hund ist nicht mit der katze und das ist auch gut heute"


def _corpus(spark, n=30):
    rows = []
    for i in range(n):
        rows.append((2 * i, f"{EN} number {i}", 1))
        rows.append((2 * i + 1, f"{DE} nummer {i}", 0))
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


@pytest.mark.slow
def test_loss_decreases_and_separates(spark):
    corpus = _corpus(spark)
    feats = hashed_tf(corpus).cache()
    labels = corpus.select("doc_id", F.col("y").cast("double").alias("y"))
    w, losses = train_logreg(feats, labels, iters=8, lr=4.0)
    assert losses[0] > losses[-1]
    for a, b in zip(losses, losses[1:]):
        assert b <= a + 1e-9  # batch GD with this lr descends monotonically here
    preds = predict_scores(feats, w).join(labels, "doc_id")
    acc = preds.select(
        F.avg(((F.col("p") > 0.5).cast("int") == F.col("y")).cast("int"))
    ).collect()[0][0]
    assert acc == 1.0  # fully separable by stopword families


@pytest.mark.slow
def test_training_is_deterministic(spark):
    corpus = _corpus(spark, n=10)
    feats = hashed_tf(corpus).cache()
    labels = corpus.select("doc_id", F.col("y").cast("double").alias("y"))
    w1, l1 = train_logreg(feats, labels, iters=3)
    w2, l2 = train_logreg(feats, labels, iters=3)
    assert l1 == l2 and w1 == w2


@pytest.mark.slow
def test_bias_only_model_learns_base_rate(spark):
    # one doc class, empty-ish features: probability should move toward 1
    corpus = spark.createDataFrame(
        [(i, "same same", 1) for i in range(8)], "doc_id long, text string, y int"
    )
    feats = hashed_tf(corpus).cache()
    labels = corpus.select("doc_id", F.col("y").cast("double").alias("y"))
    w, losses = train_logreg(feats, labels, iters=10, lr=4.0)
    p = predict_scores(feats, w).agg(F.avg("p")).collect()[0][0]
    assert p > 0.9 and losses[-1] < losses[0]
