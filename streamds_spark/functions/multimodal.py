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
    DoubleType,
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
    """Deterministic fake media blob: header + md5-chained bytes (size w*h//16).

    The chain advances over HEX STRINGS (h_1 = md5hex(seed), h_{k+1} =
    md5hex(h_k as ascii); body = unhex(h_1 || h_2 || ...)) rather than raw
    digest bytes — deliberately: md5-of-VARCHAR is the only md5 most SQL
    engines expose (DuckDB has no md5(BLOB)), and the hex chain lets the
    image_phash_neardups oracle regenerate payload bodies character for
    character in pure SQL."""
    header = MAGIC[kind] + struct.pack(">II", width, height)
    n = max(16, width * height // 16)
    out = bytearray()
    cur = seed
    while len(out) < n:
        cur = hashlib.md5(cur.encode()).hexdigest()
        out.extend(bytes.fromhex(cur))
    return bytes(header + out[:n])


def _pil_image_module():
    """Pillow's Image module if installed, else None — the real-codec gate.
    Pure-Python Pillow is not in this container; when a deployment provides
    it, decode_image_pixels and _fake_decode use it with no other change."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _fake_decode(payload: bytes) -> tuple[str, int, int]:
    """STUB DECODER for synthetic blobs — stands in for PIL.Image.open /
    ffprobe. Non-synthetic payloads fall through to Pillow when installed
    (real-codec path), else raise the documented guard."""
    magic = payload[:3]
    kind = {v: k for k, v in MAGIC.items()}.get(magic)
    if kind is None:
        image_mod = _pil_image_module()
        if image_mod is not None:
            import io

            with image_mod.open(io.BytesIO(payload)) as im:
                return "img", int(im.width), int(im.height)
        raise NotImplementedError(
            "real codec decode not available in this environment (Pillow not "
            "installed); payload is not a synthetic blob (expected IMG/AUD/VID "
            "magic)"
        )
    width, height = struct.unpack(">II", payload[3:11])
    return kind, width, height


def decode_image_pixels(payload: bytes):
    """Grayscale uint8 pixel array (h×w) for an image payload: synthetic
    blobs decode via the deterministic stub; real image bytes (PNG/JPEG/...)
    decode via Pillow when installed — the swap point the multimodal layer
    documents, now wired so providing the dependency IS the deployment step.
    Raises NotImplementedError for real payloads without Pillow."""
    import numpy as np

    if payload[:3] == MAGIC["img"]:
        if len(payload) < 11:
            raise ValueError(f"truncated synthetic image blob ({len(payload)} bytes)")
        width, height = struct.unpack(">II", payload[3:11])
        if width == 0 or height == 0:
            raise ValueError(f"degenerate image dimensions {width}x{height}")
        body = np.frombuffer(payload[11:], dtype=np.uint8)
        if body.size == 0:
            body = np.zeros(1, dtype=np.uint8)
        reps = -(-(width * height) // body.size)
        return np.tile(body, reps)[: width * height].reshape(height, width)
    image_mod = _pil_image_module()
    if image_mod is None:
        raise NotImplementedError(
            "real image decode requires Pillow, which is not installed in "
            "this environment (synthetic IMG blobs decode without it)"
        )
    import io

    with image_mod.open(io.BytesIO(payload)) as im:
        return np.asarray(im.convert("L"), dtype=np.uint8)


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
    impl calls the codec here; the batch shape / schema contract is identical).

    SYNTHETIC BLOBS ONLY: the byte-subsample below is meaningless on real
    codec bytes, so non-synthetic payloads are refused loudly even when
    Pillow is installed (a real resize must decode → resample → re-encode;
    decode_image_pixels is the decode half of that path)."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:3] not in MAGIC.values():
                    raise NotImplementedError(
                        "resize_media only supports synthetic blobs: real "
                        "image resize requires a codec re-encode step "
                        "(decode via decode_image_pixels, resample, encode) "
                        f"— got a non-synthetic payload for media_id={media_id}"
                    )
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


PCM_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
    ]
)

RMS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("win", LongType()),
        StructField("rms", DoubleType()),
    ]
)

PCM_SAMPLES = 1024  # samples per synthetic clip
PCM_WINDOW = 256  # samples per RMS window


def synth_pcm_payload(media_id: int, n_samples: int = PCM_SAMPLES) -> bytes:
    """Deterministic fake 16-bit little-endian PCM: sample_i =
    (media_id*2654435761 + i*40503) mod 65536 - 32768. Analytically
    reproducible in SQL, so the decode path can be oracle-checked."""
    import numpy as np

    i = np.arange(n_samples, dtype=np.int64)
    amp = (media_id * 2654435761 + i * 40503) % 65536 - 32768
    return amp.astype("<i2").tobytes()


def synth_pcm_table(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """doc table → (media_id, payload) of synthetic PCM clips (mapInPandas;
    payload bytes never leave the executors)."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "payload": [synth_pcm_payload(int(m)) for m in pdf[id_col]],
                }
            )

    return docs.select(id_col).mapInPandas(synth, schema=PCM_SCHEMA)


def audio_window_rms(pcm: DataFrame, window: int = PCM_WINDOW) -> DataFrame:
    """Audio featurization: binary PCM → per-window RMS energy rows.

    The real-codec shape: numpy `frombuffer` over the Arrow-delivered bytes,
    vectorized square/mean per fixed window — no per-sample Python, no bytes
    at the driver. Swapping the synthetic payloads for real PCM (or an ffmpeg
    decode in front) changes none of the plumbing."""
    import numpy as np

    def rms_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_win, out_rms = [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                amp = np.frombuffer(bytes(payload), dtype="<i2").astype(np.float64)
                n_win = len(amp) // window
                if n_win == 0:
                    continue
                chunks = amp[: n_win * window].reshape(n_win, window)
                rms = np.sqrt((chunks * chunks).sum(axis=1) / window)
                out_id.extend([media_id] * n_win)
                out_win.extend(range(n_win))
                out_rms.extend(rms.tolist())
            yield pd.DataFrame({"media_id": out_id, "win": out_win, "rms": out_rms})

    return pcm.mapInPandas(rms_batches, schema=RMS_SCHEMA)


def image_dimensions_cols(payload_col: str = "payload") -> "list[Column]":
    """[format, img_width, img_height] parsed DIRECTLY from a binary column's
    container headers with built-in expressions — no codec, no UDF, no
    Python: real metadata extraction that runs at scan speed on 100 TB of
    opaque image bytes (the decode-free half of multimodal processing;
    Pillow-gated decode handles pixels).

    Formats handled header-side:
      PNG:  IHDR width/height are big-endian uint32 at byte offsets 17-20 /
            21-24 (8-byte signature + 4-byte length + "IHDR").
      GIF:  logical-screen width/height, little-endian uint16 at 7-8 / 9-10.
      BMP:  BITMAPINFOHEADER width/height, little-endian int32 at 19-22 /
            23-26.
    JPEG dimensions live in a variable-offset SOFn segment — finding it
    needs a scan loop, which is exactly what expressions shouldn't fake;
    JPEG rows report format 'jpeg' with NULL dims (decode-side job).
    Unknown payloads -> (NULL, NULL, NULL)."""
    p = F.col(payload_col)

    def be32(off: int) -> Column:  # 1-based big-endian uint32
        b = [F.expr(f"cast(conv(hex(substring({payload_col}, {off + i}, 1)), 16, 10) as bigint)") for i in range(4)]
        return (b[0] * 16777216 + b[1] * 65536 + b[2] * 256 + b[3]).cast("int")

    def le16(off: int) -> Column:
        b = [F.expr(f"cast(conv(hex(substring({payload_col}, {off + i}, 1)), 16, 10) as bigint)") for i in range(2)]
        return (b[1] * 256 + b[0]).cast("int")

    def le32(off: int) -> Column:
        b = [F.expr(f"cast(conv(hex(substring({payload_col}, {off + i}, 1)), 16, 10) as bigint)") for i in range(4)]
        return (b[3] * 16777216 + b[2] * 65536 + b[1] * 256 + b[0]).cast("int")

    is_png = F.expr(f"hex(substring({payload_col}, 1, 8))") == "89504E470D0A1A0A"
    is_gif = F.expr(f"substring(cast({payload_col} as string), 1, 3)") == "GIF"
    is_bmp = F.expr(f"hex(substring({payload_col}, 1, 2))") == "424D"
    is_jpg = F.expr(f"hex(substring({payload_col}, 1, 3))") == "FFD8FF"
    fmt = (
        F.when(is_png, F.lit("png"))
        .when(is_gif, F.lit("gif"))
        .when(is_bmp, F.lit("bmp"))
        .when(is_jpg, F.lit("jpeg"))
        .otherwise(F.lit(None).cast("string"))
    )
    width = (
        F.when(is_png, be32(17))
        .when(is_gif, le16(7))
        .when(is_bmp, le32(19))
        .otherwise(F.lit(None).cast("int"))
    )
    height = (
        F.when(is_png, be32(21))
        .when(is_gif, le16(9))
        .when(is_bmp, le32(23))
        .otherwise(F.lit(None).cast("int"))
    )
    return [fmt.alias("format"), width.alias("img_width"), height.alias("img_height")]
