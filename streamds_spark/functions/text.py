"""Text primitives: tokenization, shingling, quality metrics.

Mirrors the reference's split_operator (whitespace tokenize,
misc/split_operator.go:24-27) but as Catalyst expressions — the reference forked
one OS process per tuple; here everything is codegen'd JVM expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Words used for the naive stopword-ratio language/quality heuristics.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")


def tokens(col: Column) -> Column:
    """Whitespace tokens with empties removed (split_operator parity)."""
    return F.filter(F.split(col, r"\s+"), lambda w: w != "")


def shingles_expr(tokens_col_name: str, n: int = 3) -> Column:
    """Shingle expression over an existing array<string> column (by name)."""
    t = tokens_col_name
    joined = ", ".join(f"{t}[i + {j}]" for j in range(n))
    return F.expr(
        f"CASE WHEN size({t}) >= {n} "
        f"THEN transform(sequence(0, size({t}) - {n}), i -> concat_ws(' ', {joined})) "
        f"ELSE array() END"
    )


def stopword_ratio(toks: Column, stopwords=EN_STOPWORDS) -> Column:
    """Fraction of tokens that are (lowercased) stopwords; 0.0 for empty docs."""
    sw = F.array(*[F.lit(w) for w in stopwords])
    n_sw = F.size(F.filter(toks, lambda w: F.array_contains(sw, F.lower(w))))
    return F.when(F.size(toks) > 0, n_sw / F.size(toks)).otherwise(F.lit(0.0))
