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


class TestGearCDC:
    """FastCDC-style gear variant: numpy path vs the sequential reference."""

    def _spark_gear(self, spark, texts, **kw):
        from streamds_spark.operators.cdc import cdc_chunks_gear

        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
        )
        out = {}
        for r in cdc_chunks_gear(docs, **kw).collect():
            out.setdefault(r.doc_id, []).append((r.s, r.e, r.chunk_hash))
        return {k: sorted(v) for k, v in out.items()}

    def _ref(self, text, mask_bits=5, min_len=16, max_len=128):
        from streamds_spark.operators.cdc import gear_boundaries

        data = text.encode("utf-8")
        bounds = gear_boundaries(data, mask_bits, min_len, max_len)
        spans, prev = [], 0
        for b in bounds:
            spans.append((prev + 1, b, _md5_bytes(data[prev:b])))
            prev = b
        return sorted(spans)

    def test_matches_sequential_reference(self, spark):
        texts = FIXTURES + ["x" * 500, "ab" * 300]
        got = self._spark_gear(spark, texts)
        for i, t in enumerate(texts):
            if not t:
                assert i not in got
                continue
            assert got[i] == self._ref(t), f"doc {i}"

    def test_min_max_clamps_and_coverage(self, spark):
        texts = ["the quick brown fox jumps over the lazy dog " * 30]
        got = self._spark_gear(spark, texts, mask_bits=4, min_len=8, max_len=64)
        spans = sorted(got[0])
        n = len(texts[0].encode("utf-8"))
        assert spans[0][0] == 1 and spans[-1][1] == n
        for (s1, e1, _), (s2, e2, _) in zip(spans, spans[1:]):
            assert s2 == e1 + 1
        lens = [e - s + 1 for s, e, _ in spans]
        assert all(ln <= 64 for ln in lens)
        assert all(ln >= 8 for ln in lens[:-1])  # final chunk may be short

    def test_shift_resistance(self, spark):
        # non-periodic text: periodic fixtures collapse to a handful of
        # DISTINCT chunk hashes, making set overlap too coarse to measure
        import random

        rng = random.Random(42)
        words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "iota"]
        base = " ".join(rng.choice(words) for _ in range(400))
        shifted = "X" + base
        hb = {h for _, _, h in self._ref(base)}
        hs = {h for _, _, h in self._ref(shifted)}
        assert len(hb) >= 30  # enough distinct chunks for the ratio to mean something
        assert len(hb & hs) >= 0.9 * len(hb)

    def test_partitioning_invariance(self, spark):
        from streamds_spark.operators.cdc import cdc_chunks_gear

        texts = [w * k for k, w in enumerate(["alpha ", "beta ", "gamma "] * 7, 1)]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
        )
        one = sorted(map(tuple, cdc_chunks_gear(docs.coalesce(1)).collect()))
        many = sorted(map(tuple, cdc_chunks_gear(docs.repartition(4)).collect()))
        assert one == many

    def test_guards(self, spark):
        from streamds_spark.operators.cdc import cdc_chunks_gear

        docs = spark.createDataFrame([(0, "x")], "doc_id int, text string")
        with pytest.raises(ValueError, match="mask_bits"):
            cdc_chunks_gear(docs, mask_bits=0)
        with pytest.raises(ValueError, match="mask_bits"):
            cdc_chunks_gear(docs, min_len=10, max_len=5)


def _md5_bytes(b: bytes) -> str:
    return hashlib.md5(b).hexdigest()
