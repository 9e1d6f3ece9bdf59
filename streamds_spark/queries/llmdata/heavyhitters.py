r"""Heavy-hitter terms over the corpus via the two-pass Misra-Gries operator
(operators/heavy_hitters.py) — exact output, sketch-bounded shuffle. The
oracle is the naive full-group-by formulation; at 100 TB the naive plan
shuffles the whole vocabulary while this one shuffles ~k keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.functions.text import tokens
from streamds_spark.operators.heavy_hitters import heavy_hitters
from streamds_spark.registry import query

MG_CAPACITY = 199  # exact heavy hitters above n/200


@query(
    "heavy_hitter_terms",
    oracle=rf"""
    WITH toks AS (
        SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                                  w -> w <> '')) AS term
        FROM documents
    ),
    tot AS (SELECT count(*) AS n FROM toks)
    SELECT term, count(*) AS cnt
    FROM toks, tot
    GROUP BY term, n
    HAVING count(*) * {MG_CAPACITY + 1} > n
    """,
)
def heavy_hitter_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terms occurring in more than 1/200th of all token positions, found by
    partition-local Misra-Gries summaries + exact candidate recount."""
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(F.explode(tokens(F.col("text"))).alias("term"))
    return heavy_hitters(terms, k=MG_CAPACITY)
