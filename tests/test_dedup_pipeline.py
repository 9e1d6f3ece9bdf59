"""End-to-end dedup pipeline: LSH candidates → Jaccard verify → group resolve,
including chained duplicates (A~B~C without direct A~C pairing)."""

from __future__ import annotations

from streamds_spark.operators.dedup_pipeline import dedup_corpus, resolve_groups


BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches the "
    "birds fly south for the winter as leaves fall gently from the old oak tree"
)


def test_dedup_corpus_keeps_one_per_group(spark):
    docs = spark.createDataFrame(
        [
            (0, BASE),
            (1, BASE),                      # exact dup of 0
            (2, BASE + " tonight"),         # near-dup of 0/1
            (3, "unrelated text about query engines and shuffles in distributed systems"),
            (4, "another unique document mentioning vectors indexes and storage layouts"),
        ],
        ["doc_id", "text"],
    )
    kept, dropped = dedup_corpus(docs, threshold=0.7)
    kept_ids = {r["doc_id"] for r in kept.collect()}
    dropped_ids = {r["doc_id"] for r in dropped.collect()}
    assert kept_ids == {0, 3, 4}
    assert dropped_ids == {1, 2}


def test_resolve_groups_chains(spark):
    # chain A-B, B-C: all must resolve to rep=1 even without an A-C edge
    verified = spark.createDataFrame([(1, 2, 0.9), (2, 3, 0.9)], ["id_a", "id_b", "jaccard"])
    labels = {r["node"]: r["rep"] for r in resolve_groups(verified).collect()}
    assert labels == {1: 1, 2: 1, 3: 1}


def test_no_pairs_no_drops(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta"), (1, "one two three four five six")],
        ["doc_id", "text"],
    )
    kept, dropped = dedup_corpus(docs)
    assert dropped.count() == 0
    assert kept.count() == 2
