"""Property tests for pure-Python operator kernels (no Spark session needed):
the unigram-LM Viterbi DP against brute-force enumeration of every
composition, and the Morton key against bit-twiddling identities."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from streamds_spark.operators.unigram_lm import UNK_PENALTY, _viterbi
from streamds_spark.operators.zorder import zorder_py

_ALPHA = "abc"


def _brute_force_best(word: str, lp: dict, max_len: int) -> float:
    """Max total score over every segmentation into pieces of length <= max_len
    (unknown single chars allowed at UNK_PENALTY)."""
    n = len(word)
    if n == 0:
        return 0.0
    best = float("-inf")
    for l in range(1, min(max_len, n) + 1):
        piece = word[:l]
        s = lp.get(piece)
        if s is None:
            if l != 1:
                continue
            s = UNK_PENALTY
        rest = _brute_force_best(word[l:], lp, max_len)
        best = max(best, s + rest)
    return best


@settings(max_examples=200, deadline=None)
@given(
    word=st.text(alphabet=_ALPHA, min_size=1, max_size=8),
    pieces=st.dictionaries(
        st.text(alphabet=_ALPHA, min_size=1, max_size=4),
        st.integers(min_value=-15, max_value=-1),
        max_size=12,
    ),
)
def test_viterbi_matches_brute_force(word, pieces):
    lp = {p: float(s) for p, s in pieces.items()}
    path = _viterbi(word, lp, 4)
    assert "".join(path) == word  # always a valid segmentation
    got = sum(lp.get(p, UNK_PENALTY) for p in path)
    assert got == _brute_force_best(word, lp, 4)


@settings(max_examples=200, deadline=None)
@given(
    x=st.integers(min_value=0, max_value=(1 << 16) - 1),
    y=st.integers(min_value=0, max_value=(1 << 16) - 1),
)
def test_morton_key_identities(x, y):
    z = zorder_py(x, y, 16)
    # de-interleaving recovers both coordinates
    rx = sum(((z >> (2 * i)) & 1) << i for i in range(16))
    ry = sum(((z >> (2 * i + 1)) & 1) << i for i in range(16))
    assert (rx, ry) == (x, y)
    # monotone in each coordinate along the same row/column
    if x > 0:
        assert zorder_py(x - 1, y, 16) < z
    if y > 0:
        assert zorder_py(x, y - 1, 16) < z
