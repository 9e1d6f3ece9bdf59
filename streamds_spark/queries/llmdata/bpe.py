r"""BPE tokenizer-training queries: the first merge round's pair statistics
(oracle-checked against DuckDB) — the full iterative trainer lives in
operators/bpe.py with a pure-Python reference test (tests/test_bpe.py),
since N chained argmax rounds are not one SQL statement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.operators.bpe import pair_counts, word_symbol_table
from streamds_spark.registry import query

TOP_N = 50


@query(
    "bpe_top_merges",
    oracle=rf"""
    WITH words AS (
        SELECT w AS word, count(*) AS cnt
        FROM (SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                                        x -> x <> '')) AS w
              FROM documents)
        GROUP BY w
    ),
    syms AS (
        SELECT cnt,
               list_append(list_transform(range(1, length(word) + 1),
                                          i -> word[i]), '</w>') AS s
        FROM words
    ),
    pairs AS (
        SELECT cnt,
               unnest(list_transform(range(1, len(s)),
                                     i -> struct_pack(a := s[i], b := s[i+1]))) AS p
        FROM syms WHERE len(s) >= 2
    )
    SELECT p.a AS a, p.b AS b, CAST(sum(cnt) AS BIGINT) AS pair_cnt
    FROM pairs GROUP BY p.a, p.b
    ORDER BY pair_cnt DESC, a, b LIMIT {TOP_N}
    """,
)
def bpe_top_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{N} first-round BPE merge candidates: adjacent character-pair
    frequencies over the frequency-weighted distinct-word table (end-of-word
    marker included). Deterministic total order (count desc, pair asc) →
    TakeOrdered, no global sort."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = word_symbol_table(docs)
    return (
        pair_counts(vocab)
        .select("a", "b", F.col("pair_cnt").cast("bigint").alias("pair_cnt"))
        .orderBy(F.desc("pair_cnt"), F.asc("a"), F.asc("b"))
        .limit(TOP_N)
    )


# Fixed integer-scored piece inventory for the unigram-LM segmentation check:
# deterministic, engine-portable, and integer so best-path scores compare
# exactly. The trained (EM) inventory lives in operators/unigram_lm.py; this
# registry twin verifies the SEGMENTATION DP itself cross-engine.
UNIGRAM_CHECK_PIECES = {
    "ta": -2, "ble": -3, "able": -4, "val": -3, "ue": -2, "row": -3,
    "the": -1, "er": -2, "or": -2, "at": -2, "an": -2, "in": -2,
    "sc": -3, "st": -3, "qu": -3, "ar": -2, "gg": -4, "wi": -3,
    "nd": -3, "ow": -3, "a": -5, "e": -5, "t": -5, "r": -6, "o": -6,
    "s": -6, "l": -6, "n": -6, "i": -6, "u": -6, "w": -7, "b": -7,
    "c": -7, "d": -7, "f": -7, "g": -7, "h": -7, "j": -8, "k": -8,
    "m": -7, "p": -7, "q": -8, "v": -8, "x": -8, "y": -8, "z": -8,
}
_UNIGRAM_UNK = -20
_UNIGRAM_MAXLEN = 4
_UNIGRAM_WORDS = 50


@query(
    "unigram_segment_scores",
    oracle=rf"""
    WITH RECURSIVE words AS (
        SELECT word FROM (
            SELECT DISTINCT unnest(list_filter(string_split_regex(text, '\s+'),
                                               x -> x <> '')) AS word
            FROM documents
        ) WHERE length(word) <= 8 ORDER BY word LIMIT {_UNIGRAM_WORDS}
    ),
    pieces(piece, score) AS (VALUES {', '.join(
        f"('{p}', {s})" for p, s in sorted(UNIGRAM_CHECK_PIECES.items())
    )}),
    dp AS (
        SELECT word, 0 AS pos, 0 AS score FROM words
        UNION ALL
        SELECT d.word, d.pos + t.l, d.score + coalesce(p.score, {_UNIGRAM_UNK})
        FROM dp d
        CROSS JOIN (SELECT unnest(range(1, {_UNIGRAM_MAXLEN} + 1)) AS l) t
        LEFT JOIN pieces p ON substr(d.word, d.pos + 1, t.l) = p.piece
        WHERE d.pos + t.l <= length(d.word)
          AND (p.score IS NOT NULL OR t.l = 1)
    )
    SELECT word, CAST(max(score) AS INT) AS best_score
    FROM dp WHERE pos = length(word) GROUP BY word
    """,
)
def unigram_segment_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viterbi best-segmentation SCORE per word under the fixed integer piece
    inventory above — the unigram-LM tokenizer's DP, hash-checked against a
    DuckDB oracle that enumerates every composition of the word into pieces
    (recursive CTE; words are capped at 8 chars so the path space stays tiny)
    and takes the max. Scores are integers, so cross-engine equality is
    exact; comparing the max score rather than the argmax path sidesteps
    tie-break conventions.

    Plan: 50-word driver-bounded input, broadcast piece dict, Arrow-batched
    DP — the same E-step kernel operators/unigram_lm.py runs over the full
    word table during training."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    from streamds_spark.operators.unigram_lm import _viterbi

    docs = load_table(spark, sf_dir, "documents")
    from streamds_spark.functions.text import tokens

    words = (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .distinct()
        .filter(F.length("word") <= 8)
        .orderBy("word")
        .limit(_UNIGRAM_WORDS)
    )
    bc = spark.sparkContext.broadcast(dict(UNIGRAM_CHECK_PIECES))

    @pandas_udf(IntegerType())
    def best_score_udf(ws):
        lp = bc.value

        def go(w):
            path = _viterbi(w, lp, _UNIGRAM_MAXLEN)
            return int(sum(lp.get(p, _UNIGRAM_UNK) for p in path))

        return ws.map(go)

    return words.select("word", best_score_udf(F.col("word")).alias("best_score"))
