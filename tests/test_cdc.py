"""Content-defined chunking: pure-Python parity, full coverage of the text,
and the shift-resistance property that distinguishes CDC from fixed-size
chunking."""

import hashlib

import pytest

from streamds_spark.operators.cdc import cdc_chunks

W, PREFIX = 8, "0"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def py_cdc(text: str, window: int = W, prefix: str = PREFIX):
    """Reference implementation over unicode codepoints (matching Spark's
    character-based substring)."""
    n = len(text)
    if n == 0:
        return []
    bounds = [
        i
        for i in range(window, n + 1)
        if _md5(text[i - window : i]).startswith(prefix)
    ]
    spans, prev = [], 0
    for b in bounds:
        spans.append((prev + 1, b))
        prev = b
    if prev < n:
        spans.append((prev + 1, n))
    return [(s, e, _md5(text[s - 1 : e])) for s, e in spans]


FIXTURES = [
    "the quick brown fox jumps over the lazy dog " * 8,
    "short",
    "",
    "exactly8",
    "unicode: naïve café — ünïcødé text with emoji ☃ snowman " * 6,
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
]


def _spark_chunks(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    out = {}
    for r in cdc_chunks(docs, window=W, prefix=PREFIX).collect():
        out.setdefault(r.doc_id, []).append((r.s, r.e, r.chunk_hash))
    return {k: sorted(v) for k, v in out.items()}


def test_matches_python_reference(spark):
    got = _spark_chunks(spark, FIXTURES)
    for i, t in enumerate(FIXTURES):
        assert got.get(i, []) == sorted(py_cdc(t)), f"doc {i}"


def test_spans_cover_text_exactly(spark):
    got = _spark_chunks(spark, FIXTURES)
    for i, t in enumerate(FIXTURES):
        spans = sorted(got.get(i, []))
        if not t:
            assert spans == []
            continue
        assert spans[0][0] == 1 and spans[-1][1] == len(t)
        for (s1, e1, _), (s2, e2, _) in zip(spans, spans[1:]):
            assert s2 == e1 + 1  # contiguous, no gap/overlap


def test_shift_resistance_vs_fixed_size(spark):
    """Prepend one character: all CDC chunk hashes after the first boundary
    are preserved, while every fixed-size chunk hash shifts."""
    base = "the quick brown fox jumps over the lazy dog " * 20
    shifted = "X" + base
    h_base = {h for _, _, h in py_cdc(base)}
    h_shift = {h for _, _, h in py_cdc(shifted)}
    common = h_base & h_shift
    assert len(common) >= 0.8 * len(h_base)  # almost all chunks survive
    # fixed-size chunking at the same granularity loses everything
    fixed = lambda t: {_md5(t[i : i + 16]) for i in range(0, len(t), 16)}
    assert not (fixed(base) & fixed(shifted))
    # and the Spark operator agrees with the reference on both variants
    got = _spark_chunks(spark, [base, shifted])
    assert got[0] == sorted(py_cdc(base))
    assert got[1] == sorted(py_cdc(shifted))


def test_contract_guard(spark):
    docs = spark.createDataFrame([(0, "x")], "doc_id int, text string")
    with pytest.raises(ValueError, match="hex prefix"):
        cdc_chunks(docs, prefix="Z")
    with pytest.raises(ValueError, match="window"):
        cdc_chunks(docs, window=1)
