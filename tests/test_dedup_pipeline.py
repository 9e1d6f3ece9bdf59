"""End-to-end dedup pipeline: LSH candidates → Jaccard verify → group resolve,
including chained duplicates (A~B~C without direct A~C pairing)."""

from __future__ import annotations

from streamds_spark.operators.dedup_pipeline import dedup_corpus, resolve_groups
import pytest


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


def test_resolve_groups_long_chain_converges(spark):
    # 20-hop chain 0-1-2-...-20 with no shortcut edges: fixpoint iteration
    # (with pointer jumping) must collapse the whole chain to rep=0.
    verified = spark.createDataFrame(
        [(i, i + 1, 0.9) for i in range(20)], ["id_a", "id_b", "jaccard"]
    )
    labels = {r["node"]: r["rep"] for r in resolve_groups(verified).collect()}
    assert labels == {i: 0 for i in range(21)}


@pytest.mark.slow
def test_lsh_mega_bucket_capped(spark):
    # 10k identical docs share every band bucket: all-pairs would emit ~50M
    # pairs; the star-connected cap must keep it linear AND still collapse the
    # group to one representative, with near-dup recall elsewhere unchanged.
    from streamds_spark.operators.dedup_pipeline import (
        lsh_bucket_report,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    rows = [(i, BASE) for i in range(10_000)]
    rows += [(20_000, BASE + " tonight"), (20_001, BASE + " tonight again")]
    rows += [(30_000, "unrelated text about query engines and shuffles everywhere")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    sigs = minhash_signatures(docs)
    pairs = lsh_candidate_pairs(sigs, max_bucket_size=64)
    n_pairs = pairs.count()
    assert n_pairs < 50_000, f"quadratic blow-up: {n_pairs} pairs"

    report = lsh_bucket_report(sigs, max_bucket_size=64)
    assert report["n_capped"] >= 1
    assert report["max_occupancy"] >= 10_000

    kept, dropped = dedup_corpus(docs, threshold=0.7)
    kept_ids = {r["doc_id"] for r in kept.collect()}
    # one rep for the 10k-clone group, near-dups 20000/20001 collapse with the
    # clone group iff they verify >= threshold against it; the unrelated doc stays.
    assert 0 in kept_ids and 30_000 in kept_ids
    assert len(kept_ids) <= 4
    assert dropped.count() >= 9_999


def test_evaluate_pairs_precision_recall(spark):
    from streamds_spark.operators.dedup_pipeline import evaluate_pairs

    predicted = spark.createDataFrame(
        [(1, 2), (3, 4), (6, 5)], ["id_a", "id_b"]
    )  # (6,5) reversed on purpose
    truth = spark.createDataFrame([(2, 1), (5, 6), (7, 8)], ["id_a", "id_b"])
    m = evaluate_pairs(predicted, truth)
    assert m["n_hit"] == 2
    assert abs(m["precision"] - 2 / 3) < 1e-9
    assert abs(m["recall"] - 2 / 3) < 1e-9


def test_lsh_recall_on_crafted_near_dups(spark):
    """End-to-end quality signal: LSH candidates over crafted near-dup groups
    recall the labeled pairs (the knob the 100 TB tuning loop watches)."""
    from streamds_spark.operators.dedup_pipeline import (
        evaluate_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    rows, truth = [], []
    for g in range(12):
        base = " ".join(f"w{g}x{i}" for i in range(40))
        rows.append((g * 10, base))
        rows.append((g * 10 + 1, base + " tail"))  # near-dup of base
        truth.append((g * 10, g * 10 + 1))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = lsh_candidate_pairs(minhash_signatures(docs))
    m = evaluate_pairs(pairs, spark.createDataFrame(truth, ["id_a", "id_b"]))
    assert m["recall"] >= 0.9, m


def test_incremental_dedup_against_bucket_store(spark, tmp_path):
    """New-batch ingestion probes the persisted corpus buckets: a near-dup of
    a corpus doc is caught WITHOUT re-hashing the corpus, the new side
    broadcasts, and appending the batch keeps the store current."""
    from streamds_spark.operators.dedup_incremental import (
        incremental_candidates,
        write_bucket_store,
    )
    from streamds_spark.plans.audit import plan_facts

    corpus = spark.createDataFrame(
        [(i, " ".join(f"c{i}w{j}" for j in range(30))) for i in range(20)]
        + [(100, BASE)],
        ["doc_id", "text"],
    )
    store = str(tmp_path / "buckets")
    write_bucket_store(corpus, store)

    new = spark.createDataFrame(
        [(1000, BASE + " tonight"), (1001, "totally unrelated fresh content here")],
        ["doc_id", "text"],
    )
    cands = incremental_candidates(new, spark, store)
    f = plan_facts(cands)
    assert f.has_broadcast_join, "new batch must broadcast against the store scan"
    got = {(r["new_id"], r["corpus_id"]) for r in cands.collect()}
    assert (1000, 100) in got
    assert not any(nid == 1001 for nid, _ in got)

    # append the processed batch; a later duplicate of doc 1000 is now caught
    write_bucket_store(new, store, mode="append")
    later = spark.createDataFrame([(2000, BASE + " tonight")], ["doc_id", "text"])
    got2 = {
        (r["new_id"], r["corpus_id"])
        for r in incremental_candidates(later, spark, store).collect()
    }
    assert (2000, 1000) in got2 and (2000, 100) in got2


@pytest.mark.slow
def test_resolve_groups_fuzz_vs_union_find(spark):
    """Pointer-jumping CC must agree with a reference union-find on random
    graphs — chains, stars, cycles, and disjoint unions all appear at this
    size."""
    import random

    rng = random.Random(1234)
    for trial in range(8):
        n = rng.randrange(2, 30)
        m = rng.randrange(1, 40)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {a for e in edges for a in e}
        want = {x: find(x) for x in touched}
        # canonical rep = min of component
        comp = {}
        for x, r in want.items():
            comp.setdefault(find(r), []).append(x)
        want_min = {x: min(comp[find(x)]) for x in touched}

        df = spark.createDataFrame(edges, "id_a: long, id_b: long")
        got = {r.node: r.rep for r in resolve_groups(df).collect()}
        assert got == want_min, (trial, sorted(edges), got, want_min)
