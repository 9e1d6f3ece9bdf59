"""Web-corpus ingest: WARC segments → documents table, in one declarative plan.

The standard pretraining front door (the shape CCNet/C4 pipelines use):

  1. `read_warc` — binaryFile scan, one task per segment file (io/sources.py);
  2. keep `response` records whose content-type looks like HTML;
  3. `html_to_text` — codegen regexp chain, no UDF (functions/text.py);
  4. quality heuristics on the extracted text (token count, stopword ratio,
     chars-per-token — the same C4/Gopher-style expressions as the
     text_quality_score registry query) plus a keep/drop verdict;
  5. deterministic doc ids (xxhash64 of record id + source file), so re-runs
     and distributed retries assign identical ids with no global counter.

Everything after the Arrow-batched WARC parse is whole-stage codegen; the
output is documents-shaped (doc_id, url, source_file, text, n_chars plus the
quality columns) so every downstream operator — dedup, decontamination,
tokenization, sampling — composes directly.

At 100 TB: parallelism = number of segment files (the web-corpus norm is
~1 GB segments, so tens of thousands of tasks); the whole pipeline is
map-only — zero shuffles, no driver state — and the parquet write streams
per-task. Quality thresholds are plain column predicates, pushed into the
same stage as the parse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamds_spark.functions.text import html_to_text, stopword_ratio, tokens
from streamds_spark.io.sources import read_warc

# C4/Gopher-flavored keep rules (public heuristics; tuned loose — the point
# is the plumbing, callers override per corpus)
MIN_TOKENS = 5
MAX_AVG_TOKEN_LEN = 40.0  # catches minified JS / base64 blobs
MIN_STOPWORD_RATIO = 0.0  # raise for English-only corpora


def warc_to_documents(
    spark: SparkSession,
    path: str,
    on_error: str = "quarantine",
    min_tokens: int = MIN_TOKENS,
    max_avg_token_len: float = MAX_AVG_TOKEN_LEN,
    min_stopword_ratio: float = MIN_STOPWORD_RATIO,
) -> DataFrame:
    """WARC path/glob → documents-shaped DataFrame with quality columns.

    Returns EVERY parsed HTML response with `keep` (boolean) materialized —
    filtering is the caller's one-line choice, and corpus-health reporting
    wants the rejects' stats too. Parse errors follow read_warc's on_error
    contract (quarantine rows are dropped here — they carry no text).
    """
    recs = read_warc(spark, path, on_error=on_error)
    html = recs.filter(
        (F.col("warc_type") == "response")
        & (F.lower(F.coalesce("content_type", F.lit(""))).contains("html"))
    )
    text = html.select(
        F.xxhash64(F.col("record_id"), F.col("source_file")).alias("doc_id"),
        F.col("target_uri").alias("url"),
        "source_file",
        html_to_text(F.col("payload").cast("string")).alias("text"),
    )
    toks = tokens(F.col("text"))
    n_toks = F.size(toks)
    scored = text.select(
        "doc_id",
        "url",
        "source_file",
        "text",
        F.length("text").alias("n_chars"),
        n_toks.alias("n_tokens"),
        F.round(stopword_ratio(toks), 4).alias("stopword_ratio"),
        F.round(
            F.when(n_toks > 0, F.length("text").cast("double") / n_toks).otherwise(
                F.lit(0.0)
            ),
            4,
        ).alias("avg_token_len"),
    )
    return scored.withColumn(
        "keep",
        (F.col("n_tokens") >= min_tokens)
        & (F.col("avg_token_len") <= max_avg_token_len)
        & (F.col("stopword_ratio") >= min_stopword_ratio),
    )
