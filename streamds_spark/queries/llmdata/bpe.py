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
