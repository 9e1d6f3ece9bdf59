"""WebDataset-style tar-shard ingest (io/sources.read_tar_shards +
webdataset_samples): the de-facto multimodal training layout — samples as
<key>.<ext> members across sharded tars, shard = unit of parallelism."""

from __future__ import annotations

import gzip
import io
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from streamds_spark.io.sources import read_tar_shards, webdataset_samples

PNG = b"\x89PNG\r\n\x1a\n" + b"fakepixels" * 20
WAV = b"RIFF....WAVEfmt " + b"\x00" * 40


def _tar_bytes(members: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in members.items():
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


@pytest.fixture()
def shard_dir(tmp_path):
    d = tmp_path / "shards"
    d.mkdir()
    shard0 = _tar_bytes(
        {
            "000000.jpg": PNG,
            "000000.txt": b"a red square",
            "000000.json": b'{"w": 8, "h": 8}',
            "000001.jpg": PNG + b"x",
            "000001.txt": b"a blue circle",
        }
    )
    shard1 = _tar_bytes(
        {
            # nested dir + multi-dot ext (WebDataset: key = before FIRST dot)
            "train/000002.seg.png": PNG,
            "train/000002.txt": b"masked",
            "000003.wav": WAV,
        }
    )
    (d / "shard-000000.tar").write_bytes(shard0)
    (d / "shard-000001.tar.gz").write_bytes(gzip.compress(shard1))
    return str(d)


def test_read_tar_shards_members(spark, shard_dir):
    rows = read_tar_shards(spark, shard_dir).collect()
    by = {(r["key"], r["ext"]): r for r in rows}
    assert len(rows) == 8
    assert by[("000000", "jpg")]["payload"] == PNG  # byte-exact through gz too
    assert by[("000002", "seg.png")]["content_length"] == len(PNG)
    assert by[("000003", "wav")]["payload"] == WAV
    # two distinct shards, distributed one task per tar
    assert len({r["shard"] for r in rows}) == 2


def test_webdataset_samples_regroup(spark, shard_dir):
    samples = webdataset_samples(read_tar_shards(spark, shard_dir))
    got = {r["key"]: r for r in samples.collect()}
    assert set(got) == {"000000", "000001", "000002", "000003"}
    assert got["000000"]["n_parts"] == 3
    assert got["000000"]["texts"]["txt"] == "a red square"
    assert got["000000"]["texts"]["json"] == '{"w": 8, "h": 8}'
    assert bytes(got["000000"]["parts"]["jpg"]) == PNG
    # binary exts never leak into the decoded-text map
    assert "jpg" not in got["000000"]["texts"] and "wav" not in got["000003"]["texts"]
    assert got["000002"]["texts"]["txt"] == "masked"


def test_corrupt_shard_error_contract(spark, shard_dir, tmp_path):
    bad_dir = str(tmp_path / "bad")
    os.makedirs(bad_dir)
    with open(os.path.join(bad_dir, "good.tar"), "wb") as f:
        f.write(_tar_bytes({"0.txt": b"ok"}))
    with open(os.path.join(bad_dir, "broken.tar"), "wb") as f:
        f.write(b"this is not a tar file at all" * 10)

    with pytest.raises(Exception, match="broken.tar"):
        read_tar_shards(spark, bad_dir, on_error="fail").collect()
    q = read_tar_shards(spark, bad_dir, on_error="quarantine").collect()
    assert {r["ext"] for r in q} == {"txt", "_parse_error"}
    s = read_tar_shards(spark, bad_dir, on_error="skip").collect()
    assert [r["ext"] for r in s] == ["txt"]
    # quarantine rows are filtered out of sample regrouping
    keys = {r["key"] for r in webdataset_samples(
        read_tar_shards(spark, bad_dir, on_error="quarantine")).collect()}
    assert keys == {"0"}


def test_samples_compose_with_multimodal_sniff(spark, shard_dir):
    """The parts map feeds the existing multimodal layer directly: sniff the
    jpg payload's magic bytes per sample (same codegen path as
    multimodal_filetype_sniff)."""
    samples = webdataset_samples(read_tar_shards(spark, shard_dir))
    sniffed = samples.filter(F.map_contains_key("parts", "jpg")).select(
        "key",
        F.hex(F.substring(F.element_at("parts", "jpg"), 1, 4)).alias("magic"),
    )
    got = {r["key"]: r["magic"] for r in sniffed.collect()}
    assert got == {"000000": "89504E47", "000001": "89504E47"}
