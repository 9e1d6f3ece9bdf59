"""Driver-window rotation (registry.rotate_for_driver_window's helpers): the
mechanism every round's CORRECTNESS coverage rides on. Uses synthetic
CORRECTNESS files — no Spark session needed."""

from __future__ import annotations

import json

from streamds_spark.registry import checked_names, verification_backlog


def _write(tmp_path, name, rows):
    p = tmp_path / name
    p.write_text(json.dumps(rows))
    return str(p)


GREEN = {"rows_match": True, "schema_match": True, "hash_match": True}
RED = {"rows_match": True, "schema_match": True, "hash_match": False}
ERR = {"rows_match": None, "schema_match": None, "hash_match": None, "err": "boom"}


def test_no_rounds_means_no_rotation(tmp_path):
    assert verification_backlog([]) is None
    assert checked_names([]) == set()


def test_latest_round_wins_per_query(tmp_path):
    r1 = _write(tmp_path, "CORRECTNESS_r01.json", {"a": GREEN, "b": RED, "c": GREEN})
    r2 = _write(tmp_path, "CORRECTNESS_r02.json", {"b": GREEN, "c": ERR})
    green = verification_backlog([r1, r2])
    # a: green in r1, untouched since → verified
    # b: red in r1 but green in r2 → verified
    # c: green in r1 but ERR in r2 → regression, must re-prove
    assert green == {"a", "b"}
    assert checked_names([r1, r2]) == {"a", "b", "c"}


def test_file_order_is_sorted_not_given(tmp_path):
    """Later rounds override earlier ones by FILENAME sort, regardless of the
    list order passed in (glob order is filesystem-dependent)."""
    r1 = _write(tmp_path, "CORRECTNESS_r01.json", {"q": GREEN})
    r2 = _write(tmp_path, "CORRECTNESS_r02.json", {"q": ERR})
    assert verification_backlog([r2, r1]) == set()  # r2's ERR wins either way
    assert verification_backlog([r1, r2]) == set()


def test_unreadable_file_is_skipped(tmp_path):
    bad = tmp_path / "CORRECTNESS_r01.json"
    bad.write_text("{not json")
    r2 = _write(tmp_path, "CORRECTNESS_r02.json", {"q": GREEN})
    assert verification_backlog([str(bad), r2]) == {"q"}


def test_live_registry_front_is_exactly_the_unproven_set():
    """On the real repo state: every query ahead of the first verified query
    in the registry order must be unverified (red, never-checked, or
    no-oracle), and all verified ones must sit behind them — the invariant
    the driver's first-N window depends on."""
    import glob
    import os

    from streamds_spark.registry import load_all

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
    if not files:
        return  # round 1: nothing to assert
    green = verification_backlog(files)
    names = list(load_all())
    first_green_idx = min(i for i, n in enumerate(names) if n in green)
    assert all(n not in green for n in names[:first_green_idx])
    assert all(n in green for n in names[first_green_idx:])
    # rows-only queries can never turn green; the rotation sorts them to the
    # BACK of the unverified front so they never displace hash-checkable
    # queries from the driver's window
    specs = load_all()
    no_oracle_pos = [i for i, n in enumerate(names) if specs[n].oracle is None]
    assert all(
        i >= first_green_idx - len(no_oracle_pos) for i in no_oracle_pos
    ), (no_oracle_pos, first_green_idx)


def test_selfcheck_multiset_reproduces_driver_unhashable_crash():
    """Driver-canonicalization parity (r3 feature_hash_vectors lesson): the
    driver sorts-then-hashes RAW cells, so a bare list cell must fail in
    tools/selfcheck.to_multiset too — not be silently stringified."""
    import pytest

    from tools.selfcheck import to_multiset

    with pytest.raises(TypeError, match="unhashable"):
        to_multiset([(1, [1, 2, 3])], ["doc_id", "features"])
    # the fixed (array_join'd) form canonicalizes normally
    assert to_multiset([(1, "1,2,3")], ["doc_id", "features"]) == [("1", "1,2,3")]
    # all-NULL columns stay legal (no non-null value to probe)
    assert to_multiset([(None, 1)], ["a", "b"]) == [("NULL", "1")]
