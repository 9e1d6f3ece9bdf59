"""Unicode normalization: the canonical-form (NFC) pass a multilingual corpus
runs before hashing/dedup, since visually-identical strings with different
codepoint sequences (e.g. precomposed é vs e + combining accent) would
otherwise dodge exact dedup and fragment vocabulary counts.

Spark has no built-in unicode-normalize expression, so this is the repo's
canonical example of the sanctioned slow path: an Arrow-batched pandas UDF
(unicodedata.normalize per batch — vectorized transfer, per-string Python
work) rather than a row-at-a-time Python UDF. The DuckDB oracle uses its
native nfc_normalize; both implement the same Unicode standard, so results
hash-match exactly.

At 100 TB this is a map-only pass whose cost is the Python worker lane;
normalize EARLY (at ingest, once) and store the normalized text so every
downstream op reads the canonical form instead of re-paying this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from streamds_spark.catalog import load_table
from streamds_spark.registry import query


def nfc_normalize_udf():
    """Arrow-batched NFC normalizer. Built lazily — @pandas_udf parses its
    return type against the ACTIVE session, so decorating at import time
    would require a SparkSession before the registry can even load."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(StringType())
    def _nfc(s):
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    return _nfc


def normalize_text(df: DataFrame, col: str = "text") -> DataFrame:
    """Replace `col` with its NFC form (Arrow-batched)."""
    return df.withColumn(col, nfc_normalize_udf()(F.col(col)))


@query(
    "normalization_drift",
    oracle=r"""
    WITH n AS (
        SELECT lang, text, nfc_normalize(text) AS norm FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS docs,
           CAST(sum(CASE WHEN norm <> text THEN 1 ELSE 0 END) AS BIGINT) AS changed_docs,
           CAST(sum(length(text) - length(norm)) AS BIGINT) AS chars_saved
    FROM n GROUP BY lang
    """,
)
def normalization_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How far the corpus is from NFC canonical form, per language: docs whose
    text changes under normalization and the codepoint count saved. The
    ingest-time health check that decides whether the normalize pass is
    worth scheduling. (The synthetic corpus is ASCII — drift 0 — so the
    non-trivial path is exercised on accented fixtures in
    tests/test_textnorm.py.)"""
    docs = load_table(spark, sf_dir, "documents")
    n = docs.select("lang", "text", nfc_normalize_udf()(F.col("text")).alias("norm"))
    return n.groupBy("lang").agg(
        F.count("*").alias("docs"),
        F.sum((F.col("norm") != F.col("text")).cast("int")).cast("bigint").alias(
            "changed_docs"
        ),
        F.sum(F.length("text") - F.length("norm")).cast("bigint").alias("chars_saved"),
    )
