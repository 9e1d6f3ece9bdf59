"""PII scrubbing over the documents table.

The synthetic corpus contains no organic PII, so the query first APPENDS a
deterministic synthetic contact line derived from doc_id (same expression in
both engines), then runs the real scrub operators over the combined text. The
scrub path — regexp_count + chained regexp_replace — is exactly what runs in
production; only the injection step is test scaffolding.

Pattern notes: the regexes are written in the common subset of Java regex
(Spark) and RE2 (DuckDB) — no backreferences, no lookbehind. Spark's
regexp_replace is global by default; DuckDB needs the 'g' flag.

Scale posture: map-only pass, no shuffle, no UDF — regexp_* are JVM codegen
expressions, so the scrub rides the scan at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.functions.hashing import md5_int60
from streamds_spark.registry import query

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


@query(
    "pii_redaction",
    oracle=rf"""
    WITH aug AS (
        SELECT doc_id,
               text || ' contact user' || doc_id || '@example.com from 10.0.'
                    || (doc_id % 256) || '.7' AS txt
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(txt, '{EMAIL_RE}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(txt, '{IP_RE}')) AS INT) AS n_ips,
           ('0x' || substr(md5(regexp_replace(regexp_replace(txt,
                '{EMAIL_RE}', '<EMAIL>', 'g'), '{IP_RE}', '<IP>', 'g')), 1, 15))::BIGINT
               AS redacted_fp
    FROM aug
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count and redact emails / IPv4 addresses per document; the redacted text
    is fingerprinted (cross-engine md5-int) so the oracle verifies the EXACT
    post-scrub bytes, not just the counts."""
    docs = load_table(spark, sf_dir, "documents")
    txt = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(txt, EMAIL_RE, "<EMAIL>"), IP_RE, "<IP>"
    )
    return docs.select(
        "doc_id",
        F.regexp_count(txt, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(txt, F.lit(IP_RE)).alias("n_ips"),
        md5_int60(redacted).alias("redacted_fp"),
    )
