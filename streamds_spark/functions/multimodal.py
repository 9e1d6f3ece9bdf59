"""Multimodal column plumbing: image/audio/video as opaque binary columns with
typed metadata, processed via Arrow-batched mapInPandas.

The container has no image/audio codecs, so the DECODE step is a deterministic
fake (parse our own synthetic header) clearly marked below; everything around
it — schema, batch iteration, partitioning, UDF signatures — is the real
production shape: at 100 TB you'd swap `_fake_decode` for PIL/ffmpeg calls and
nothing else changes.

Payload format (synthetic, deterministic from a seed string):
    magic(3s) kind | width(u32 BE) | height(u32 BE) | payload bytes (md5 chain)

Scale notes:
  - mapInPandas streams Arrow record batches; binary columns never materialize
    on the driver and never round-trip through per-row pickling.
  - spark.sql.execution.arrow.maxRecordsPerBatch bounds batch memory when
    payloads are large (set it small for video-sized blobs).
  - Metadata-only passes (resolution filters etc.) read the struct column and
    prune the binary column out of the scan entirely.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAGIC = {"img": b"IMG", "aud": b"AUD", "vid": b"VID"}

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", IntegerType()),
        StructField("checksum", StringType()),
    ]
)


def synth_payload(seed: str, kind: str = "img", width: int = 64, height: int = 48) -> bytes:
    """Deterministic fake media blob: header + md5-chained bytes (size w*h//16)."""
    header = MAGIC[kind] + struct.pack(">II", width, height)
    n = max(16, width * height // 16)
    out = bytearray()
    cur = seed.encode()
    while len(out) < n:
        cur = hashlib.md5(cur).digest()
        out.extend(cur)
    return bytes(header + out[:n])


def _fake_decode(payload: bytes) -> tuple[str, int, int]:
    """STUB DECODER — stands in for PIL.Image.open / ffprobe, which are not in
    this container. Parses the synthetic header written by synth_payload."""
    magic = payload[:3]
    kind = {v: k for k, v in MAGIC.items()}.get(magic)
    if kind is None:
        raise NotImplementedError(
            "real codec decode not available in this environment; payload is not "
            "a synthetic blob (expected IMG/AUD/VID magic)"
        )
    width, height = struct.unpack(">II", payload[3:11])
    return kind, width, height


def decode_media(df: DataFrame) -> DataFrame:
    """media(media_id, kind, payload) → typed metadata via Arrow-batched
    mapInPandas (the production decode pass)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                kind, w, h = _fake_decode(b)
                rows.append(
                    {
                        "media_id": media_id,
                        "kind": kind,
                        "width": w,
                        "height": h,
                        "n_bytes": len(b),
                        "checksum": hashlib.md5(b).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA.fields])

    return df.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_media(df: DataFrame, out_width: int, out_height: int) -> DataFrame:
    """Resize pass: subsamples the fake pixel bytes deterministically (a real
    impl calls the codec here; the batch shape / schema contract is identical)."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                kind, w, h = _fake_decode(b)
                body = b[11:]
                n_out = max(16, out_width * out_height // 16)
                step = max(1, len(body) // n_out)
                resized = body[::step][:n_out]
                header = MAGIC[kind] + struct.pack(">II", out_width, out_height)
                rows.append(
                    {
                        "media_id": media_id,
                        "width": out_width,
                        "height": out_height,
                        "payload": header + resized,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return df.mapInPandas(resize_batches, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(df: DataFrame, frame_bytes: int = 64, every_k: int = 4) -> DataFrame:
    """Video frame sampling: split payload into fixed-size frames, keep every
    k-th — the flatMap-shaped multimodal pass (one row in, many out)."""

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                body = bytes(payload)[11:]
                frames = [
                    body[i : i + frame_bytes] for i in range(0, len(body), frame_bytes)
                ]
                for idx in range(0, len(frames), every_k):
                    rows.append(
                        {"media_id": media_id, "frame_no": idx, "frame": frames[idx]}
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.mapInPandas(frame_batches, schema=FRAME_SCHEMA)


def synth_media_table(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from `documents` (JVM-side md5 chain is
    overkill here; the seed path uses the text column so payloads are stable
    across engines and runs)."""
    kinds = F.array(F.lit("img"), F.lit("aud"), F.lit("vid"))

    def synth_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text, kind in zip(pdf["doc_id"], pdf["text"], pdf["kind"]):
                rows.append(
                    {
                        "media_id": doc_id,
                        "kind": kind,
                        "payload": synth_payload(text, kind, 64 + doc_id % 64, 48),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    seeded = docs.select(
        F.col("doc_id"), F.col("text"), F.element_at(kinds, (F.col("doc_id") % 3 + 1).cast("int")).alias("kind")
    )
    return seeded.mapInPandas(synth_batches, schema=MEDIA_SCHEMA)
