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


def test_latest_green_rounds_stamps_most_recent_green(tmp_path):
    from streamds_spark.registry import latest_green_rounds

    r1 = _write(tmp_path, "CORRECTNESS_r01.json", {"a": GREEN, "b": GREEN, "c": GREEN})
    r2 = _write(tmp_path, "CORRECTNESS_r02.json", {"b": GREEN, "c": RED})
    stamps = latest_green_rounds([r2, r1])  # order-insensitive (filename sort)
    # a: green only in r1 → stamp 0; b: re-proven in r2 → stamp 1;
    # c: latest row red → not verified at all, no stamp
    assert stamps == {"a": 0, "b": 1}


def test_verified_back_is_ordered_oldest_green_first():
    """On the real repo state: within the verified back of the registry
    order, green-row age must be non-decreasing — the driver's spare window
    slots re-check the stalest queries first."""
    import glob
    import os

    from streamds_spark.registry import latest_green_rounds, load_all

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
    if not files:
        return
    green = verification_backlog(files)
    stamps = latest_green_rounds(files)
    names = list(load_all())
    back_stamps = [stamps[n] for n in names if n in green]
    assert back_stamps == sorted(back_stamps), "verified back not age-ordered"
    # and the stalest stamp leads, so round-5's window re-proves r1-era rows
    if back_stamps:
        assert back_stamps[0] == min(stamps.values())


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
