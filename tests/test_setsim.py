"""Unit tests for the exact prefix-filtered set-similarity join
(operators/setsim.py): completeness fuzz against a driver-side brute force,
the pruning claim (candidates << all token-sharing pairs), threshold
boundary exactness, and input hygiene."""

from __future__ import annotations

import itertools
import random

import pytest

from streamds_spark.operators.setsim import setsim_candidates, setsim_join


def _mk(spark, sets):
    rows = [(i, toks) for i, toks in sets.items()]
    return spark.createDataFrame(rows, "id bigint, tokens array<string>")


def _brute(sets, tau_num, tau_den):
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = set(sets[a]), set(sets[b])
        inter, union = len(sa & sb), len(sa | sb)
        if union > 0 and inter * tau_den >= union * tau_num:
            out[(a, b)] = (inter, union)
    return out


@pytest.mark.slow
def test_fuzz_matches_bruteforce(spark):
    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(40)]
    sets = {
        i: rng.sample(vocab, rng.randint(1, 12)) for i in range(60)
    }
    for tau_num, tau_den in [(1, 2), (3, 10), (4, 5), (1, 1)]:
        got = {
            (r["id_a"], r["id_b"]): (r["n_inter"], r["n_union"])
            for r in setsim_join(_mk(spark, sets), tau_num, tau_den).collect()
        }
        assert got == _brute(sets, tau_num, tau_den), (tau_num, tau_den)


def test_prefix_filter_prunes(spark):
    # 30 sets sharing one stopword-grade token; only two near-dup pairs.
    # All-pairs on shared tokens = C(30,2)=435; the prefix filter at tau=0.8
    # must keep far fewer candidates yet still find both true pairs.
    sets = {i: [f"u{i}a", f"u{i}b", f"u{i}c", f"u{i}d", "common"] for i in range(30)}
    sets[100] = ["x1", "x2", "x3", "x4", "x5"]
    sets[101] = ["x1", "x2", "x3", "x4", "x6"]  # jaccard 4/6 -> 0.667
    sets[102] = ["x1", "x2", "x3", "x4", "x5"]  # jaccard 1.0 with 100
    df = _mk(spark, sets)
    cand = setsim_candidates(df, 2, 3).count()
    assert cand < 50  # vs 435+ token-sharing pairs
    got = {(r["id_a"], r["id_b"]) for r in setsim_join(df, 2, 3).collect()}
    assert got == {(100, 101), (100, 102), (101, 102)}


def test_integer_boundary_inclusive(spark):
    # inter=1, union=2 — exactly tau=1/2: must be INCLUDED (>=, not >),
    # and the length filter boundary (tau*max == min) is inclusive too
    sets = {1: ["a", "b"], 2: ["a"]}
    rows = setsim_join(_mk(spark, sets), 1, 2).collect()
    assert [(r["id_a"], r["id_b"], r["jaccard"]) for r in rows] == [(1, 2, 0.5)]
    # and excluded one notch above: tau = 2/3 > 1/2
    assert setsim_join(_mk(spark, sets), 2, 3).count() == 0


def test_duplicate_tokens_and_empty_sets(spark):
    sets = {1: ["a", "a", "b"], 2: ["b", "a"], 3: []}
    rows = setsim_join(_mk(spark, sets), 1, 1).collect()
    assert [(r["id_a"], r["id_b"], r["n_inter"], r["n_union"]) for r in rows] == [
        (1, 2, 2, 2)
    ]


def test_bad_tau_raises(spark):
    with pytest.raises(ValueError):
        setsim_join(_mk(spark, {1: ["a"]}), 0, 2)
    with pytest.raises(ValueError):
        setsim_join(_mk(spark, {1: ["a"]}), 3, 2)
