"""RainStorm job-spec parity against the reference's OWN datasets and demo
queries (reference local_test.go:230-434 golden runs; MP4 report p.2 queries).

Oracles computed with Python's csv module over the same files — independent of
both Spark and the Go implementation, matching the reference's CSV semantics
(encoding/csv with LazyQuotes)."""

from __future__ import annotations

import csv
import io
from collections import Counter

import pytest

from streamds_spark.operators.rainstorm import (
    RainStormJob,
    compile_rainstorm,
    read_source,
    run_rainstorm,
)
from tests.conftest import reference_file


def _csv_rows(path: str):
    with open(path, newline="", encoding="utf-8", errors="replace") as f:
        yield from csv.reader(f)


@pytest.fixture(scope="module")
def traffic_path():
    return reference_file("Traffic_Signs_1000.txt")


@pytest.fixture(scope="module")
def parking_path():
    return reference_file("Parking_Meter_Spaces.txt")


@pytest.fixture(scope="module")
def lichess_path():
    return reference_file("Lichess.txt")


def test_app2_count_demo(spark, traffic_path):
    """The flagship demo: signs per category WHERE sign_post='Punched Telespar'
    (app2_1 + count_operator; reference local_test.go:230-281)."""
    expected = Counter(
        row[8] for row in _csv_rows(traffic_path) if len(row) > 8 and row[6] == "Punched Telespar"
    )
    result = run_rainstorm(
        spark, "app2_1", "Punched Telespar", "count_operator", "", traffic_path
    )
    got = {r["word"]: r["count"] for r in result.collect()}
    assert got == dict(expected)


def test_app1_contains_filter(spark, traffic_path):
    """app1_1: WHERE line CONTAINS 'Warning' → objectid-sign_type pairs
    (reference local_test.go:283-324, param 'Warning')."""
    expected = sorted(
        f"{row[2]}-{row[3]}"
        for raw, row in zip(open(traffic_path, encoding="utf-8", errors="replace"), _csv_rows(traffic_path))
        if "Warning" in raw and len(row) > 3
    )
    job = RainStormJob("app1_1", "Warning", "identity", "", traffic_path)
    result = compile_rainstorm(spark, job)
    got = sorted(r["value"] for r in result.collect())
    assert got == expected


def test_parking_simple(spark, parking_path):
    """MP4 benchmark query (a): Active='No' → OBJECTID (rate_filter_op_1)."""
    rows = list(_csv_rows(parking_path))
    header, data = rows[0], rows[1:]
    expected = sorted(r[2] for r in data if len(r) > 12 and r[12] == "No")
    job = RainStormJob("rate_filter_op_1", "", "identity", "", parking_path)
    got = sorted(r["value"] for r in compile_rainstorm(spark, job).collect())
    assert got == expected


def test_parking_complex_count_per_zone(spark, parking_path):
    """MP4 benchmark query (b): COUNT per ZONEID WHERE rate <= 0.5
    (rate_filter_operator + count_operator)."""
    rows = list(_csv_rows(parking_path))[1:]
    expected = Counter(
        r[8] for r in rows
        if len(r) > 8 and r[5] not in ("", "RATE") and _is_float(r[5]) and float(r[5]) <= 0.5
    )
    result = run_rainstorm(spark, "rate_filter_operator", "", "count_operator", "", parking_path)
    got = {r["word"]: r["count"] for r in result.collect()}
    assert got == dict(expected)


def test_lichess_simple(spark, lichess_path):
    """MP4 benchmark query (c): winner='white' → game ids (lichess_op_1)."""
    rows = list(_csv_rows(lichess_path))[1:]
    expected = sorted(r[0] for r in rows if len(r) > 6 and r[6] == "white")
    job = RainStormJob("lichess_op_1", "", "identity", "", lichess_path)
    got = sorted(r["value"] for r in compile_rainstorm(spark, job).collect())
    assert got == expected


def test_lichess_complex_group_by_opening(spark, lichess_path):
    """MP4 benchmark query (d): conjunctive filter → condensed opening → COUNT
    (lichess_operator_1 + count_operator; misc/lichess_operator_1.go:28-46)."""
    openings = {
        "Scandinavian Defense", "Sicilian Defense", "Indian Game",
        "Caro-Kann Defense", "Italian Game",
    }
    rows = list(_csv_rows(lichess_path))[1:]
    expected = Counter(
        "_".join(r[14].split(" ")[:2])
        for r in rows
        if len(r) > 14
        and r[6] == "white"
        and r[4].isdigit()
        and int(r[4]) > 40
        and r[5] in {"mate", "resign", "outoftime"}
        and r[14] in openings
    )
    result = run_rainstorm(spark, "lichess_operator_1", "", "count_operator", "", lichess_path)
    got = {r["word"]: r["count"] for r in result.collect()}
    assert got == dict(expected)


def test_wordcount_with_split_operator(spark, tmp_path):
    """split_operator + count_operator on a known text (reference
    local_test.go wordcount golden test shape)."""
    text = "the cat sat on the mat\nthe dog\n\nmat cat the"
    p = tmp_path / "words.txt"
    p.write_text(text)
    result = run_rainstorm(spark, "split_operator", "", "count_operator", "", str(p))
    got = {r["word"]: r["count"] for r in result.collect()}
    assert got == {"the": 4, "cat": 2, "sat": 1, "on": 1, "mat": 2, "dog": 1}


def test_split_operator_key_uniqueness(spark, tmp_path):
    """The word-index key scheme (misc/split_operator.go:24-27): every emitted
    tuple key is unique even for repeated words."""
    p = tmp_path / "w.txt"
    p.write_text("a a a\nb b")
    job = RainStormJob("split_operator", "", "identity", "", str(p))
    rows = compile_rainstorm(spark, job).collect()
    keys = [r["key"] for r in rows]
    assert len(keys) == len(set(keys)) == 5


def test_read_source_split_parallel_numbering(spark, tmp_path):
    """Keyed source at scale: line numbers must be exact per-file 1-based AND
    the plan must not funnel a whole file through one task (the reference keys
    by filename:lineNumber, core_process_utils.go:522-524; a partitionBy(file)
    window would make a 100 GB file a single-task straggler)."""
    from streamds_spark.plans.audit import plan_facts

    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")  # force many splits
    try:
        lines = [f"line-{i:05d}" for i in range(2000)]
        (tmp_path / "a.txt").write_text("\n".join(lines))
        (tmp_path / "b.txt").write_text("\n".join(f"b-{i}" for i in range(50)))
        df = read_source(spark, str(tmp_path))
        n_splits = spark.read.text(str(tmp_path / "a.txt")).rdd.getNumPartitions()
        assert n_splits > 1, "fixture must span multiple splits"
        got = {r["key"]: r["value"] for r in df.collect()}
        assert len(got) == 2050
        for i in (0, 1, 999, 1998, 1999):  # spot-check across split boundaries
            assert got[f"a.txt:{i + 1}"] == f"line-{i:05d}"
        assert got["b.txt:50"] == "b-49"
        f = plan_facts(df)
        assert f.n_single_partition == 0, "keyed source must not serialize a file into one task"
        assert f.has_broadcast_join, "split offsets must join via broadcast"
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_dest_write_and_quantify(spark, tmp_path, traffic_path):
    """S6/S8: dest table write + quantify = read back distinct count."""
    dest = str(tmp_path / "out")
    result = run_rainstorm(
        spark, "app2_1", "Punched Telespar", "count_operator", "", traffic_path, dest=dest
    )
    back = spark.read.parquet(dest)
    assert back.count() == result.count()
    assert {r["word"] for r in back.collect()} == {r["word"] for r in result.collect()}


def _is_float(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


def test_app2_count_on_larger_reference_datasets(spark):
    """Same flagship query on the 5k and 10k reference datasets — the
    reference's own scale ladder (Traffic_Signs_{1000,5000,10000})."""
    for name in ["Traffic_Signs_5000.txt", "Traffic_Signs_10000.txt"]:
        path = reference_file(name)
        expected = Counter(
            row[8]
            for row in _csv_rows(path)
            if len(row) > 8 and row[6] == "Punched Telespar"
        )
        result = run_rainstorm(
            spark, "app2_1", "Punched Telespar", "count_operator", "", path
        )
        got = {r["word"]: r["count"] for r in result.collect()}
        assert got == dict(expected), name
