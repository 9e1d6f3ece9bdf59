"""Append-log facade: per-client ordering through append + merge (HyDFS
user-semantics parity)."""

from __future__ import annotations

from streamds_spark.io import appendlog


def test_append_get_merge_ordering(spark, tmp_path):
    path = str(tmp_path / "log")
    appendlog.create(spark, path)
    # interleaved appends from two clients
    for i in range(3):
        appendlog.append(spark.createDataFrame([(f"a{i}",)], ["line"]), path, "clientA")
        appendlog.append(spark.createDataFrame([(f"b{i}",)], ["line"]), path, "clientB")
    before = appendlog.get(spark, path)
    assert before.count() == 6
    appendlog.merge(spark, path)
    rows = appendlog.read_ordered(spark, path).collect()
    # per-client order preserved after merge
    a_lines = [r["line"] for r in rows if r["_client"] == "clientA"]
    b_lines = [r["line"] for r in rows if r["_client"] == "clientB"]
    assert a_lines == ["a0", "a1", "a2"]
    assert b_lines == ["b0", "b1", "b2"]


def test_merge_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "log")
    appendlog.create(spark, path)
    appendlog.append(spark.createDataFrame([("x",), ("y",)], ["line"]), path, "c1")
    appendlog.merge(spark, path)
    appendlog.merge(spark, path)
    assert sorted(r["line"] for r in appendlog.get(spark, path).collect()) == ["x", "y"]


def test_append_after_merge(spark, tmp_path):
    path = str(tmp_path / "log")
    appendlog.create(spark, path)
    appendlog.append(spark.createDataFrame([("one",)], ["line"]), path, "c1")
    appendlog.merge(spark, path)
    appendlog.append(spark.createDataFrame([("two",)], ["line"]), path, "c1")
    rows = [r["line"] for r in appendlog.read_ordered(spark, path).collect()]
    assert rows == ["one", "two"]


def test_within_append_line_order_preserved(spark, tmp_path):
    """Lines inside ONE append must keep their original order (regression:
    a chunk's rows all share _seq; the _pos ordinal disambiguates)."""
    path = str(tmp_path / "log")
    appendlog.create(spark, path)
    lines = [(f"line-{i:03d}",) for i in range(50)]
    appendlog.append(spark.createDataFrame(lines, ["line"]), path, "c1")
    got = [r["line"] for r in appendlog.read_ordered(spark, path).collect()]
    assert got == [l[0] for l in lines]
    appendlog.merge(spark, path)
    got2 = [r["line"] for r in appendlog.read_ordered(spark, path).collect()]
    assert got2 == [l[0] for l in lines]


def test_merge_crash_before_pointer_swap_is_invisible(spark, tmp_path):
    """A merge that dies after writing its generation but BEFORE the CURRENT
    os.replace must leave the previous view fully intact (orphan gen dir is
    garbage, not truth), and the next merge must succeed."""
    import os

    path = str(tmp_path / "log")
    appendlog.create(spark, path)
    appendlog.append(spark.createDataFrame([("x",), ("y",)], ["line"]), path, "c1")
    # simulate the orphan: a fully-written generation that never got committed
    orphan = os.path.join(path, "generations", "g-999")
    os.makedirs(os.path.join(orphan, "data"))
    open(os.path.join(orphan, "data", "_SUCCESS"), "w").close()
    with open(os.path.join(orphan, "merged_chunks.txt"), "w") as f:
        f.write("bogus.parquet\n")
    assert sorted(r["line"] for r in appendlog.get(spark, path).collect()) == ["x", "y"]
    appendlog.merge(spark, path)
    assert sorted(r["line"] for r in appendlog.get(spark, path).collect()) == ["x", "y"]


def test_merge_torn_generation_write_falls_back(spark, tmp_path):
    """CURRENT pointing at a generation whose data write never committed
    (no _SUCCESS — cannot happen via merge(), but storage can tear) must fall
    back to reading raw chunks rather than erroring."""
    import os

    path = str(tmp_path / "log")
    appendlog.create(spark, path)
    appendlog.append(spark.createDataFrame([("a",)], ["line"]), path, "c1")
    os.makedirs(os.path.join(path, "generations", "g-1", "data"))
    with open(os.path.join(path, "CURRENT"), "w") as f:
        f.write("g-1")
    assert [r["line"] for r in appendlog.get(spark, path).collect()] == ["a"]


def test_append_during_merge_window_survives(spark, tmp_path):
    """An append committed after a merge's snapshot must remain visible: the
    new generation's manifest only subsumes snapshotted chunks."""
    path = str(tmp_path / "log")
    appendlog.create(spark, path)
    appendlog.append(spark.createDataFrame([("one",)], ["line"]), path, "c1")

    real_live = appendlog._live_chunk_files

    def snapshot_then_append(p, gen_dir):
        snap = real_live(p, gen_dir)
        # a concurrent client lands an append after the snapshot was taken
        appendlog.append(spark.createDataFrame([("late",)], ["line"]), p, "c2")
        return snap

    orig = appendlog._live_chunk_files
    appendlog._live_chunk_files = snapshot_then_append
    try:
        appendlog.merge(spark, path)
    finally:
        appendlog._live_chunk_files = orig
    got = sorted(r["line"] for r in appendlog.get(spark, path).collect())
    assert got == ["late", "one"]
