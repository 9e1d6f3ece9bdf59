"""End-to-end web-corpus ingest (operators/ingest.py + the ingest-warc CLI
verb): WARC segments → html_to_text → quality scoring → documents parquet,
as ONE composed pipeline — the pieces are covered separately in test_warc /
test_textstats; this locks the chain."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from streamds_spark.operators.ingest import warc_to_documents

GOOD_HTML = (
    b"<html><head><title>skip</title></head><body>"
    b"<h1>A good page</h1><p>the cat sat on the mat and it is a fine day "
    b"for the dog to run in the park with a ball</p></body></html>"
)
JUNK_HTML = (
    b"<html><body><p>"
    + b"aGVsbG8d" * 40  # one 320-char "token": minified/base64 shape
    + b"</p></body></html>"
)
SHORT_HTML = b"<html><body><p>too short</p></body></html>"


def _record(rec_id: str, rtype: str, uri: str, payload: bytes, ctype: str) -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Record-ID: <urn:uuid:{rec_id}>\r\n"
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


@pytest.fixture()
def warc_dir(tmp_path):
    d = tmp_path / "warcs"
    d.mkdir()
    seg1 = (
        _record("info", "warcinfo", "", b"software: test\r\n", "text/plain")
        + _record("good", "response", "http://x/good", GOOD_HTML, "text/html")
        + _record("junk", "response", "http://x/junk", JUNK_HTML, "text/html; charset=utf-8")
        + _record("img", "response", "http://x/img", b"\x89PNG...", "image/png")
    )
    seg2 = _record("short", "response", "http://x/short", SHORT_HTML, "text/html")
    (d / "seg1.warc").write_bytes(seg1)
    (d / "seg2.warc.gz").write_bytes(gzip.compress(seg2))
    return str(d)


@pytest.mark.slow
def test_warc_to_documents_end_to_end(spark, warc_dir):
    docs = warc_to_documents(spark, warc_dir).cache()
    by_url = {r["url"]: r for r in docs.collect()}
    # non-HTML (png) and non-response (warcinfo) records never become docs
    assert set(by_url) == {"http://x/good", "http://x/junk", "http://x/short"}

    good = by_url["http://x/good"]
    assert good["keep"] is True
    assert "A good page" in good["text"] and "<" not in good["text"]
    assert good["n_tokens"] > 10 and good["stopword_ratio"] > 0.2

    # one 320-char pseudo-token → avg_token_len rejects it
    assert by_url["http://x/junk"]["keep"] is False
    # 2 tokens < min_tokens=5
    assert by_url["http://x/short"]["keep"] is False

    # doc ids: deterministic across runs (re-ingest assigns identical ids,
    # the distributed-retry contract) and unique
    again = {r["url"]: r["doc_id"] for r in warc_to_documents(spark, warc_dir).collect()}
    assert again == {u: r["doc_id"] for u, r in by_url.items()}
    assert len({r["doc_id"] for r in by_url.values()}) == 3
    docs.unpersist()


def test_ingest_plan_is_map_only(spark, warc_dir):
    """100 TB posture: the whole WARC→text→score pipeline must run in the
    scan stage — no Exchange anywhere in the plan."""
    plan = (
        warc_to_documents(spark, warc_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_ingest_warc_cli_verb(spark, warc_dir, tmp_path, capsys):
    from streamds_spark.cli import main

    dest = str(tmp_path / "corpus")
    assert main(["ingest-warc", warc_dir, dest]) == 0
    out = capsys.readouterr().out
    assert "responses:3 kept:1" in out
    written = spark.read.parquet(dest)
    assert written.count() == 1
    row = written.first()
    assert row["url"] == "http://x/good" and "keep" not in written.columns
    # documents-shaped: downstream ops (dedup, tokenize) compose directly
    for c in ("doc_id", "text", "n_chars", "n_tokens"):
        assert c in written.columns
