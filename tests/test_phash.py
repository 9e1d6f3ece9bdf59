"""Perceptual image hash (operators/phash.py): DCT correctness, hash
stability under small perturbations, and banded near-dup pair completeness."""

from __future__ import annotations

import random

import numpy as np

from streamds_spark.functions.multimodal import synth_payload
from streamds_spark.operators.phash import (
    PHASH_SIZE,
    _dct_matrix,
    _stub_pixels,
    image_phash,
    phash64,
    phash_neardup_pairs,
)


def test_dct_matrix_matches_definition():
    n = 8
    m = _dct_matrix(n)
    a = np.arange(n * n, dtype=float).reshape(n, n)
    got = m @ a @ m.T
    # direct DCT-II (orthonormal) definition
    want = np.zeros((n, n))
    for k in range(n):
        for l in range(n):
            s = 0.0
            for i in range(n):
                for j in range(n):
                    s += (
                        a[i, j]
                        * np.cos(np.pi * (2 * i + 1) * k / (2 * n))
                        * np.cos(np.pi * (2 * j + 1) * l / (2 * n))
                    )
            ck = np.sqrt(1 / n) if k == 0 else np.sqrt(2 / n)
            cl = np.sqrt(1 / n) if l == 0 else np.sqrt(2 / n)
            want[k, l] = ck * cl * s
    assert np.allclose(got, want)


def test_identical_pixels_identical_hash():
    px = _stub_pixels(synth_payload("seed-1"))
    assert phash64(px) == phash64(px.copy())


def test_small_noise_small_hamming():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(48, 64)).astype(np.uint8)
    noisy = px.astype(int).copy()
    idx = rng.integers(0, px.size, size=20)
    noisy.flat[idx] = np.clip(noisy.flat[idx] + rng.integers(-8, 9, size=20), 0, 255)
    h1, h2 = phash64(px), phash64(noisy.astype(np.uint8))
    assert bin(h1 ^ h2).count("1") <= 10

    other = rng.integers(0, 256, size=(48, 64)).astype(np.uint8)
    assert bin(h1 ^ phash64(other)).count("1") >= 16


def test_image_phash_and_pair_join(spark):
    payloads = [(i, synth_payload(f"s{i}")) for i in range(20)]
    payloads.append((100, synth_payload("s3")))  # exact duplicate of media 3
    media = spark.createDataFrame(payloads, "media_id long, payload binary")
    hashes = image_phash(media)
    pairs = phash_neardup_pairs(hashes, max_hamming=3).collect()
    assert any(p.id_a == 3 and p.id_b == 100 and p.hamming == 0 for p in pairs)


def test_band_join_is_complete_at_radius(spark):
    """Every planted pair within Hamming 3 must be found (pigeonhole over the
    4 bands) — verified against brute force on random hashes."""
    rng = random.Random(9)
    hashes = [rng.getrandbits(63) for _ in range(60)]
    # plant close pairs: flip up to 3 random bits
    for i in range(10):
        base = hashes[i]
        flipped = base
        for _ in range(rng.randint(0, 3)):
            flipped ^= 1 << rng.randrange(64)
        hashes.append(flipped)
    df = spark.createDataFrame(
        [(i, h - (1 << 64) if h >= 1 << 63 else h) for i, h in enumerate(hashes)],
        "media_id long, phash long",
    )
    got = {(r.id_a, r.id_b) for r in phash_neardup_pairs(df, max_hamming=3).collect()}
    want = set()
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            if bin((hashes[i] ^ hashes[j]) & ((1 << 64) - 1)).count("1") <= 3:
                want.add((i, j))
    assert got == want


def test_band_join_complete_at_radius_7_and_15(spark):
    """The widened band tables (8x8-bit, 16x4-bit) stay complete at their
    pigeonhole radii — verified against brute force on random hashes with
    planted near-pairs at the exact radius boundary."""
    rng = random.Random(23)
    hashes = [rng.getrandbits(63) for _ in range(50)]
    for radius in (7, 15):
        for i in range(8):
            flipped = hashes[i]
            for _ in range(radius):  # exactly at the boundary
                flipped ^= 1 << rng.randrange(63)
            hashes.append(flipped)
    df = spark.createDataFrame(
        [(i, h - (1 << 64) if h >= 1 << 63 else h) for i, h in enumerate(hashes)],
        "media_id long, phash long",
    )

    def brute(radius):
        return {
            (i, j)
            for i in range(len(hashes))
            for j in range(i + 1, len(hashes))
            if bin((hashes[i] ^ hashes[j]) & ((1 << 64) - 1)).count("1") <= radius
        }

    for radius, bands in ((7, 8), (15, 16)):
        got = {
            (r.id_a, r.id_b)
            for r in phash_neardup_pairs(df, max_hamming=radius).collect()
        }
        assert got == brute(radius), f"incomplete at radius {radius} ({bands} bands)"


def test_band_join_rejects_impossible_radii():
    import pytest

    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    df = spark.createDataFrame([(1, 5)], "media_id long, phash long")
    with pytest.raises(ValueError, match="banded join"):
        phash_neardup_pairs(df, max_hamming=16)  # 2-bit bands refused
    with pytest.raises(ValueError, match="divide 64"):
        phash_neardup_pairs(df, max_hamming=3, n_bands=6)
    # explicit n_bands must not bypass the all-pairs refusal either
    with pytest.raises(ValueError, match="band width"):
        phash_neardup_pairs(df, max_hamming=20, n_bands=32)


def test_stub_pixels_rejects_short_payload():
    import pytest

    with pytest.raises(ValueError, match="synth_payload"):
        _stub_pixels(b"\x00\x01")


def test_decode_rejects_degenerate_dimensions():
    import struct as _struct

    import pytest

    from streamds_spark.functions.multimodal import decode_image_pixels

    blob = b"IMG" + _struct.pack(">II", 0, 48) + b"\x01" * 16
    with pytest.raises(ValueError, match="degenerate"):
        decode_image_pixels(blob)


def test_resize_media_refuses_real_payloads(spark):
    """resize_media's byte-subsample is meaningless on codec bytes — real
    payloads must fail loudly even when Pillow is installed (it would
    otherwise wrap sliced PNG bytes in a fake-blob header, silently)."""
    import pytest

    from streamds_spark.functions.multimodal import resize_media

    png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 32
    media = spark.createDataFrame([(1, png)], "media_id long, payload binary")
    with pytest.raises(Exception, match="synthetic"):
        resize_media(media, 8, 8).collect()


def test_real_payload_without_pillow_raises_guard():
    import pytest

    from streamds_spark.functions.multimodal import (
        _pil_image_module,
        decode_image_pixels,
    )

    png_magic = b"\x89PNG\r\n\x1a\n" + b"\x00" * 16
    if _pil_image_module() is None:
        with pytest.raises(NotImplementedError, match="Pillow"):
            decode_image_pixels(png_magic)
    else:
        # with Pillow installed a malformed PNG is a decode error, not a guard
        with pytest.raises(Exception):
            decode_image_pixels(png_magic)


def test_phash_on_real_pixels_via_pillow(spark):
    """Real-codec path (skipped when Pillow is absent): encode genuine PNGs,
    hash through the SAME image_phash plumbing, and verify a noisy copy is
    near its original while a different image is far."""
    import pytest

    from streamds_spark.functions.multimodal import _pil_image_module

    image_mod = _pil_image_module()
    if image_mod is None:
        pytest.skip("Pillow not installed — real-codec path is env-gated")
    import io

    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, size=(48, 64)).astype(np.uint8)
    noisy = np.clip(
        base.astype(int) + rng.integers(-4, 5, size=base.shape), 0, 255
    ).astype(np.uint8)
    other = rng.integers(0, 256, size=(48, 64)).astype(np.uint8)

    def png(arr):
        buf = io.BytesIO()
        image_mod.fromarray(arr, mode="L").save(buf, format="PNG")
        return buf.getvalue()

    media = spark.createDataFrame(
        [(0, png(base)), (1, png(noisy)), (2, png(other))],
        "media_id long, payload binary",
    )
    h = {r["media_id"]: r["phash"] for r in image_phash(media).collect()}
    assert bin(h[0] ^ h[1]).count("1") <= 10
    assert bin(h[0] ^ h[2]).count("1") >= 16
