"""Multimodal queries: binary-column stats (oracle-checked) and the
decode/resize/frame-sample passes (rows-only — the mapInPandas pipeline has no
SQL twin; semantics are pinned by tests/test_multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamds_spark.catalog import load_table
from streamds_spark.functions.multimodal import decode_media, synth_media_table
from streamds_spark.registry import query


@query(
    "multimodal_binary_stats",
    oracle="""
    SELECT octet_length(encode(text)) AS n_bytes,
           count(*) AS cnt
    FROM documents
    GROUP BY 1
    """,
)
def multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column handling without UDFs: byte length distribution of the
    utf-8 payload (binary casts/length are codegen'd JVM expressions)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.octet_length(F.col("text").cast("binary")).alias("n_bytes"))
        .groupBy("n_bytes")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "multimodal_decode_meta",
    # The synthetic payload layout is exactly derivable (header 11 bytes +
    # max(16, width*48/16) body; width = 64 + doc_id%64; kind = doc_id%3), so
    # the Spark side exercises REAL mapInPandas decode while the oracle checks
    # the decoded metadata analytically.
    oracle="""
    WITH m AS (
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'img' WHEN 1 THEN 'aud' ELSE 'vid' END AS kind,
               CAST(64 + doc_id % 64 AS INT) AS width
        FROM documents
    )
    SELECT kind,
           count(*) AS n_media,
           CAST(min(width) AS INT) AS min_width,
           CAST(max(width) AS INT) AS max_width,
           CAST(sum(11 + greatest(16, (width * 48) // 16)) AS BIGINT) AS total_bytes
    FROM m GROUP BY kind
    """,
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode pass over a synthetic media table derived from documents:
    media_id → (kind, width, height, n_bytes, checksum). Exercises the full
    Arrow-batched binary plumbing the image/audio pipeline uses at scale."""
    docs = load_table(spark, sf_dir, "documents")
    media = synth_media_table(docs)
    meta = decode_media(media)
    return meta.groupBy("kind").agg(
        F.count("*").alias("n_media"),
        F.min("width").alias("min_width"),
        F.max("width").alias("max_width"),
        F.sum("n_bytes").alias("total_bytes"),
    )


@query(
    "audio_window_rms",
    # PCM samples are analytically derivable (sample_i = (doc_id*2654435761 +
    # i*40503) mod 65536 - 32768, 1024 samples, 256-sample windows), so the
    # oracle recomputes the RMS in SQL while the Spark side exercises the
    # REAL numpy-over-Arrow decode path.
    oracle="""
    WITH s AS (
        SELECT doc_id, i.i AS i,
               CAST((doc_id * 2654435761 + i.i * 40503) % 65536 - 32768 AS DOUBLE) AS amp
        FROM documents, (SELECT unnest(range(0, 1024)) AS i) i
    ),
    w AS (
        SELECT doc_id, i // 256 AS win, sqrt(sum(amp * amp) / 256) AS rms
        FROM s GROUP BY 1, 2
    )
    SELECT doc_id AS media_id,
           CAST(count(*) AS BIGINT) AS n_windows,
           round(avg(rms), 4) AS avg_rms,
           round(max(rms), 4) AS max_rms
    FROM w GROUP BY doc_id
    """,
)
def audio_window_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio featurization end-to-end: synthesize PCM clips (mapInPandas),
    decode bytes → int16 samples → vectorized per-window RMS (numpy over
    Arrow batches), then a per-clip Spark aggregate. The audio leg of the
    multimodal triad — the plumbing (schema, batching, binary locality) is
    exactly what a real-codec pipeline uses."""
    from streamds_spark.functions.multimodal import audio_window_rms as rms_op
    from streamds_spark.functions.multimodal import synth_pcm_table

    docs = load_table(spark, sf_dir, "documents")
    rms = rms_op(synth_pcm_table(docs))
    return rms.groupBy("media_id").agg(
        F.count("*").alias("n_windows"),
        F.round(F.avg("rms"), 4).alias("avg_rms"),
        F.round(F.max("rms"), 4).alias("max_rms"),
    )


# Real container magics first (what production data would carry), then the
# synthetic IMG/AUD/VID magics that this environment's stub payloads use.
MAGIC_SNIFF = [
    ("png", b"\x89PNG\r\n\x1a\n"),
    ("jpeg", b"\xff\xd8\xff"),
    ("gif", b"GIF8"),
    ("pdf", b"%PDF"),
    ("zip", b"PK\x03\x04"),
    ("riff", b"RIFF"),
    ("synthetic-img", b"IMG"),
    ("synthetic-aud", b"AUD"),
    ("synthetic-vid", b"VID"),
]


@query(
    "multimodal_filetype_sniff",
    # Oracle is analytic (payload layout is exactly derivable from doc_id —
    # same pattern as multimodal_decode_meta): kind = doc_id%3, size =
    # 11-byte header + max(16, width*48//16) body, width = 64 + doc_id%64.
    oracle="""
    WITH m AS (
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'synthetic-img'
                               WHEN 1 THEN 'synthetic-aud'
                               ELSE 'synthetic-vid' END AS filetype,
               CAST(64 + doc_id % 64 AS BIGINT) AS width
        FROM documents
    )
    SELECT filetype,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(11 + greatest(16, (width * 48) // 16)) AS BIGINT) AS total_bytes
    FROM m GROUP BY filetype
    """,
)
def multimodal_filetype_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-type detection from magic bytes — the first pass of any multimodal
    ingest (route payloads to the right decoder, quarantine unknowns). The
    sniffer is a chained binary-prefix comparison over PNG/JPEG/GIF/PDF/ZIP/
    RIFF plus the synthetic magics, entirely codegen'd (substring on the
    binary column + literal compares — no UDF, no decode). Unknown payloads
    fall through to 'unknown'. The binary column is only read for its first
    8 bytes; Parquet column-index/page pruning keeps the scan cheap at scale."""
    docs = load_table(spark, sf_dir, "documents")
    media = synth_media_table(docs)
    detect = None
    for name, prefix in MAGIC_SNIFF:
        cond = F.substring(F.col("payload"), 1, len(prefix)) == F.lit(prefix)
        detect = F.when(cond, name) if detect is None else detect.when(cond, name)
    detect = detect.otherwise("unknown")
    return media.select(
        detect.alias("filetype"), F.octet_length("payload").alias("nb")
    ).groupBy("filetype").agg(
        F.count("*").alias("n_files"),
        F.sum(F.col("nb").cast("long")).alias("total_bytes"),
    )


def _phash_oracle() -> str:
    from streamds_spark.operators.phash import duckdb_phash_hist_sql

    return duckdb_phash_hist_sql(max_hamming=3)


@query("image_phash_neardups", oracle=_phash_oracle())
def image_phash_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup census via perceptual hashing: synthesize the media
    table from documents, pHash every image payload (operators/phash.py:
    stub pixels → 32×32 → FIXED-POINT INTEGER DCT → 63-bit hash), find pairs
    within Hamming 3 by the banded candidate join, and report the pair-count
    histogram by distance.

    Formerly the repo's last algorithmic rows-only row: the integer DCT
    (shared MINT coefficient table, exact int64 matmuls, order-statistic
    median) makes the hash a pure-integer function both engines compute
    identically, so the DuckDB twin (duckdb_phash_hist_sql) replays payload
    synthesis → pixels → DCT → hash → BRUTE-FORCE all-pairs Hamming — which
    hash-checks the histogram AND independently re-proves the banded join's
    completeness at radius 3, since the oracle never bands."""
    from streamds_spark.functions.multimodal import synth_media_table
    from streamds_spark.operators.phash import image_phash, phash_neardup_pairs

    docs = load_table(spark, sf_dir, "documents")
    media = synth_media_table(docs).filter(F.col("kind") == "img")
    pairs = phash_neardup_pairs(image_phash(media), max_hamming=3)
    return pairs.groupBy(F.col("hamming").cast("bigint").alias("hamming")).agg(
        F.count("*").cast("bigint").alias("n_pairs")
    )
