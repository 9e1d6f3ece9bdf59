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
    # without -E, + is a LITERAL in BRE: [0-9]+ means digit-then-plus → no hit
    assert grep_total(df, "grep -c '100 [0-9]+ 300'") == 0


def test_grep_bre_default_grammar(spark, log_dir):
    """Non--E patterns are BREs, as the reference's `bash -c` grep makes them
    (core_process.go:91-124): `.` `*` `[...]` anchors fire; `+ ( ) |` do not."""
    df = read_logs(spark, log_dir)
    assert grep_total(df, "grep -c 'Random.text'") == 100 * N_NODES  # . = any char
    assert grep_total(df, "grep -c '^100 [0-9]* 300$'") == 1000 * N_NODES
    assert grep_total(df, "grep -c 'Rando*m'") == 100 * N_NODES  # o* star
    assert grep_total(df, "grep -c '10*0'") == 1000 * N_NODES
    assert grep_total(df, "grep -c 'Random|text'") == 0  # | literal in BRE
    assert grep_total(df, r"grep -c 'Random\|nothing'") == 100 * N_NODES  # \| = GNU alt
    assert grep_total(df, r"grep -c '\(Random\) text'") == 100 * N_NODES  # \(\) group
    assert grep_total(df, r"grep -c '[[:digit:]]00 200'") == 1000 * N_NODES  # POSIX class
    assert grep_total(df, r"grep -c 'Random\.text'") == 0  # \. literal dot


def test_grep_piped(spark, log_dir):
    """Reference pipe semantics (core_process.go:104-110): without <filename>
    the file is appended to the LAST stage, which then ignores stdin — earlier
    stages are dead (bash hands them EOF). With <filename> in the first stage,
    the whole pipe filters."""
    import warnings

    df = read_logs(spark, log_dir)
    # file attaches to last stage → only `grep -v '200'` runs
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        assert grep_total(df, "grep '100' | grep -v '200'") == 110 * N_NODES
        assert grep_total(df, "grep 'text' | grep -v 'Random'") == 1010 * N_NODES
    # <filename> pins the file to stage 1 → every stage filters
    assert grep_total(df, "grep '100' <filename> | grep -v '200'") == 0
    assert grep_total(df, "grep 'text' <filename> | grep -v 'Random'") == 0
    assert grep_total(df, "grep -i 'random' <filename> | grep 'text'") == 100 * N_NODES


def test_grep_fnactual_restricts_file(spark, log_dir):
    """<fnactual vm0.log> (core_process.go:22-34): grep only that node's log."""
    df = read_logs(spark, log_dir)
    assert grep_total(df, f"grep -c '{PATTERN}' <fnactual vm0.log>") == 10


def test_parse_rejects_unknown_flag():
    with pytest.raises(ValueError):
        parse_grep("grep -z 'x'")


def test_grep_filename_placeholder_ignored(spark, log_dir):
    """Reference grammar allows `grep 'X' <filename>`; the placeholder token
    must not change the pattern (first non-flag token wins)."""
    df = read_logs(spark, log_dir)
    assert grep_total(df, f"grep -c '{PATTERN}' <filename>") == 10 * N_NODES


def test_bre_translation_differential_vs_real_grep(spark, tmp_path):
    """Differential parity: our BRE→Java translation vs the actual grep
    binary the reference shells out to (core_process.go:117) — same matched
    line sets across a battery of metacharacter patterns."""
    import shutil
    import subprocess

    if not shutil.which("grep"):
        pytest.skip("grep binary not available")

    corpus = [
        "axb", "aXb", "a.b", "ab", "aab", "a+b", "a?b", "(ab)", "a|b",
        "ERRORS", "ERROR.", "ERROR", "100 200 300", "1 2 3", "wor*d",
        "word", "woord", "wd", "*star", "star", "^caret", "mid^caret",
        "end$", "mid$dollar", "[set]", "digit5here", "a{2}", "aa",
    ]
    f = tmp_path / "corpus.txt"
    f.write_text("\n".join(corpus) + "\n")
    df = read_logs(spark, str(f))

    patterns = [
        "a.b", "ERROR.", "a*b", "^a", "b$", "a+b", "a?b", "(ab)", "a|b",
        r"\(ab\)", r"a\|b", "10* 200", "[0-9] 2", "wor*d", r"a\{2\}",
        "a{2}", r"\*star", "*star", "mid^caret", r"mid\$dollar", "[[:digit:]]",
    ]
    for pat in patterns:
        res = subprocess.run(
            ["grep", "--", pat, str(f)], capture_output=True, text=True
        )
        expected = set(res.stdout.splitlines())
        got = {r["line"] for r in grep(df, f"grep {shlex_quote(pat)}").collect()}
        assert got == expected, f"pattern {pat!r}: ours={sorted(got)} grep={sorted(expected)}"


def shlex_quote(s: str) -> str:
    import shlex

    return shlex.quote(s)
