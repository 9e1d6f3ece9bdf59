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


def html_to_text(col: Column) -> Column:
    """Extract readable text from HTML — the step between a WARC response
    payload and the documents table. Pure chained regexp_replace (codegen,
    embarrassingly parallel, same posture as the PII scrub):

      1. drop <script>/<style>/<head> blocks and HTML comments wholesale
         (their contents are not prose);
      2. turn block-level closers/openers into newlines so paragraph
         structure survives for segment-level ops;
      3. strip every remaining tag;
      4. decode the half-dozen entities that dominate real pages (a full
         entity table belongs in a lookup-join or UDF if ever needed);
      5. collapse runs of whitespace, trim.

    Regexes are case-insensitive ((?i)) and non-greedy; Java regex applies
    DOTALL via (?s) for the block rules. Not a browser — malformed nesting
    degrades to extra whitespace, never to dropped prose."""
    c = F.regexp_replace(col, r"(?is)<(script|style|head)\b.*?</\1\s*>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|blockquote)\b[^>]*>", "\n")
    c = F.regexp_replace(c, r"(?s)<[^>]+>", " ")
    # &amp; decodes LAST (standard unescape ordering): decoding it first
    # turns doubly-escaped text like '&amp;lt;' (which renders as '&lt;')
    # into '&lt;' and then a second pass would eat it — every other entity
    # must be resolved before the ampersand itself is.
    for ent, ch in (
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", "\""),
        ("&#39;", "'"),
        ("&apos;", "'"),
        ("&amp;", "&"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    c = F.regexp_replace(c, r"[ \t\r\f]+", " ")
    c = F.regexp_replace(c, r"\s*\n\s*", "\n")
    return F.trim(c)
