"""Multimodal binary-column plumbing: synth → decode → resize → frame-sample,
all through Arrow-batched mapInPandas on real DataFrames."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from streamds_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    resize_media,
    sample_frames,
    synth_media_table,
    synth_payload,
    _fake_decode,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, "img", synth_payload("seed-a", "img", 64, 48)),
        (1, "aud", synth_payload("seed-b", "aud", 128, 1)),
        (2, "vid", synth_payload("seed-c", "vid", 320, 240)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).cache()


def test_decode_roundtrips_header(spark, media):
    meta = {r["media_id"]: r for r in decode_media(media).collect()}
    assert (meta[0]["kind"], meta[0]["width"], meta[0]["height"]) == ("img", 64, 48)
    assert (meta[1]["kind"], meta[1]["width"]) == ("aud", 128)
    assert (meta[2]["kind"], meta[2]["width"], meta[2]["height"]) == ("vid", 320, 240)
    # checksum matches a local recompute of the same payload
    assert meta[0]["checksum"] == hashlib.md5(synth_payload("seed-a", "img", 64, 48)).hexdigest()


def test_decode_is_deterministic(spark, media):
    a = sorted(map(tuple, decode_media(media).collect()))
    b = sorted(map(tuple, decode_media(media).collect()))
    assert a == b


def test_fake_decode_rejects_unknown_magic():
    with pytest.raises(NotImplementedError):
        _fake_decode(b"XXX" + b"\x00" * 20)


def test_resize_changes_header_and_shrinks(spark, media):
    out = {r["media_id"]: r for r in resize_media(media, 16, 16).collect()}
    for r in out.values():
        assert (r["width"], r["height"]) == (16, 16)
        kind, w, h = _fake_decode(bytes(r["payload"]))
        assert (w, h) == (16, 16)
    assert len(bytes(out[2]["payload"])) < 320 * 240 // 16


def test_frame_sampling_flatmap_shape(spark, media):
    frames = sample_frames(media.filter(F.col("kind") == "vid"), frame_bytes=64, every_k=4).collect()
    assert len(frames) > 1
    assert all(r["frame_no"] % 4 == 0 for r in frames)
    body = synth_payload("seed-c", "vid", 320, 240)[11:]
    assert bytes(frames[0]["frame"]) == body[:64]


def test_synth_media_table_from_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = synth_media_table(docs)
    meta = decode_media(media)
    assert meta.count() == docs.count()
    kinds = {r["kind"] for r in meta.select("kind").distinct().collect()}
    assert kinds == {"img", "aud", "vid"}


def test_registered_multimodal_queries(spark):
    from streamds_spark.registry import load_all

    specs = load_all()
    out = specs["multimodal_decode_meta"].fn(spark, "/root/testdata/sf0.001").collect()
    assert {r["kind"] for r in out} == {"img", "aud", "vid"}
    assert sum(r["n_media"] for r in out) == 500


def test_audio_window_rms_plumbing(spark):
    """PCM decode plumbing: known payload → exact numpy-computed RMS values,
    flatMap shape (1 clip → n_windows rows), no bytes at the driver beyond
    this test's asserts."""
    import numpy as np

    from streamds_spark.functions.multimodal import (
        PCM_WINDOW,
        audio_window_rms,
        synth_pcm_payload,
        synth_pcm_table,
    )

    docs = spark.createDataFrame([(1,), (2,)], ["doc_id"])
    rows = audio_window_rms(synth_pcm_table(docs)).collect()
    assert {r["media_id"] for r in rows} == {1, 2}
    assert sum(1 for r in rows if r["media_id"] == 1) == 1024 // PCM_WINDOW

    amp = np.frombuffer(synth_pcm_payload(1), dtype="<i2").astype(np.float64)
    expect0 = float(np.sqrt((amp[:PCM_WINDOW] ** 2).sum() / PCM_WINDOW))
    got0 = next(r["rms"] for r in rows if r["media_id"] == 1 and r["win"] == 0)
    assert abs(got0 - expect0) < 1e-9


def test_filetype_sniffer_recognizes_real_magics(spark):
    """The sniffer's real-format arms (never exercised by synthetic payloads)
    must classify genuine container headers: PNG, JPEG, GIF, PDF, ZIP, RIFF,
    and route garbage to 'unknown'."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import BinaryType, StringType, StructField, StructType

    from streamds_spark.queries.llmdata.multimodal import MAGIC_SNIFF

    samples = [
        ("png", b"\x89PNG\r\n\x1a\n" + b"\x00" * 20),
        ("jpeg", b"\xff\xd8\xff\xe0" + b"\x00" * 20),
        ("gif", b"GIF89a" + b"\x00" * 10),
        ("pdf", b"%PDF-1.7\n%" + b"\x00" * 10),
        ("zip", b"PK\x03\x04\x14\x00" + b"\x00" * 10),
        ("riff", b"RIFF\x24\x00\x00\x00WAVE" + b"\x00" * 10),
        ("synthetic-img", b"IMG" + b"\x00" * 16),
        ("unknown", b"\x00\x01\x02\x03" + b"\x00" * 16),
    ]
    schema = StructType(
        [StructField("expect", StringType()), StructField("payload", BinaryType())]
    )
    df = spark.createDataFrame(
        [(e, bytearray(p)) for e, p in samples], schema=schema
    )
    detect = None
    for name, prefix in MAGIC_SNIFF:
        cond = F.substring(F.col("payload"), 1, len(prefix)) == F.lit(prefix)
        detect = F.when(cond, name) if detect is None else detect.when(cond, name)
    got = {r["expect"]: r["d"] for r in df.select("expect", detect.otherwise("unknown").alias("d")).collect()}
    assert got == {e: e for e, _ in samples}


def test_image_dimensions_from_real_headers(spark):
    """Header-side dimension parsing (no codec): real container bytes for
    PNG/GIF/BMP parse to their true dimensions with pure expressions; JPEG
    identifies but defers dims (variable-offset SOF); junk -> NULLs."""
    import struct
    import zlib

    from streamds_spark.functions.multimodal import image_dimensions_cols

    def png(w, h):
        ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
        chunk = b"IHDR" + ihdr
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", len(ihdr))
            + chunk
            + struct.pack(">I", zlib.crc32(chunk))
        )

    def gif(w, h):
        return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"

    def bmp(w, h):
        # 14-byte file header + BITMAPINFOHEADER
        return (
            b"BM" + struct.pack("<IHHI", 70, 0, 0, 54)
            + struct.pack("<IiiHH", 40, w, h, 1, 24) + b"\x00" * 24
        )

    jpeg = b"\xff\xd8\xff\xe0" + b"\x00\x10JFIF\x00" + b"\x00" * 8
    rows = [
        (0, png(640, 480)),
        (1, gif(320, 200)),
        (2, bmp(128, 64)),
        (3, jpeg),
        (4, b"not an image at all"),
    ]
    df = spark.createDataFrame(rows, "media_id int, payload binary")
    got = {
        r["media_id"]: (r["format"], r["img_width"], r["img_height"])
        for r in df.select("media_id", *image_dimensions_cols()).collect()
    }
    assert got[0] == ("png", 640, 480)
    assert got[1] == ("gif", 320, 200)
    assert got[2] == ("bmp", 128, 64)
    assert got[3] == ("jpeg", None, None)
    assert got[4] == (None, None, None)
    # and the plan stays pure expressions: no Python evaluation anywhere
    plan = df.select(*image_dimensions_cols())._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "mapInPandas" not in plan
