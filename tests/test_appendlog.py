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
