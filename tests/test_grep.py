"""MP1 grep parity using the reference's golden-log recipe
(generate_test_log_file, core_process/core_process.go:42-86; verification
contract per reference README: pattern ×10, 'Random text' ×100, '100 200 300'
×1000 per node; distributed total = node_count × per-node)."""

from __future__ import annotations

import os

import pytest

from streamds_spark.operators.grep import grep, grep_total, parse_grep, read_logs

N_NODES = 4
PATTERN = "NEWLINE_TEST"


@pytest.fixture(scope="module")
def log_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("vmlogs")
    for i in range(N_NODES):
        lines = (
            [f"prefix {PATTERN} suffix"] * 10
            + ["Random text"] * 100
            + ["100 200 300"] * 1000
        )
        (d / f"vm{i}.log").write_text("\n".join(lines) + "\n")
    return str(d)


def test_grep_count_per_node(spark, log_dir):
    df = read_logs(spark, log_dir)
    counts = {os.path.basename(r["file"]): r["match_count"] for r in grep(df, f"grep -c '{PATTERN}'").collect()}
    assert counts == {f"vm{i}.log": 10 for i in range(N_NODES)}


def test_grep_grand_totals(spark, log_dir):
    df = read_logs(spark, log_dir)
    assert grep_total(df, f"grep -c '{PATTERN}'") == 10 * N_NODES
    assert grep_total(df, "grep -c 'Random text'") == 100 * N_NODES
    assert grep_total(df, "grep -c '100 200 300'") == 1000 * N_NODES


def test_grep_full_lines(spark, log_dir):
    df = read_logs(spark, log_dir)
    rows = grep(df, f"grep '{PATTERN}'").collect()
    assert len(rows) == 10 * N_NODES
    assert all(PATTERN in r["line"] for r in rows)


def test_grep_case_insensitive(spark, log_dir):
    df = read_logs(spark, log_dir)
    assert grep_total(df, "grep -c -i 'rAnDoM TeXt'") == 100 * N_NODES


def test_grep_invert(spark, log_dir):
    df = read_logs(spark, log_dir)
    total_lines = (10 + 100 + 1000) * N_NODES
    assert grep_total(df, f"grep -c -v '{PATTERN}'") == total_lines - 10 * N_NODES


def test_grep_extended_regex(spark, log_dir):
    df = read_logs(spark, log_dir)
    assert grep_total(df, "grep -c -E '^100 [0-9]+ 300$'") == 1000 * N_NODES
    # without -E the pattern is literal: regex metachars must not fire
    assert grep_total(df, "grep -c '100 [0-9]+ 300'") == 0


def test_grep_piped(spark, log_dir):
    df = read_logs(spark, log_dir)
    # reference README pipe form: grep A | grep -v B
    assert grep_total(df, "grep '100' | grep -v '200'") == 0
    assert grep_total(df, "grep 'text' | grep -v 'Random'") == 0
    assert grep_total(df, "grep -i 'random' | grep 'text'") == 100 * N_NODES


def test_parse_rejects_unknown_flag():
    with pytest.raises(ValueError):
        parse_grep("grep -z 'x'")


def test_grep_filename_placeholder_ignored(spark, log_dir):
    """Reference grammar allows `grep 'X' <filename>`; the placeholder token
    must not change the pattern (first non-flag token wins)."""
    df = read_logs(spark, log_dir)
    assert grep_total(df, f"grep -c '{PATTERN}' <filename>") == 10 * N_NODES
