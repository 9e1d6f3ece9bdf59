"""WARC source (io/sources.read_warc): Content-Length-driven parsing must
survive payloads containing the record delimiter, read gzip members, and
distribute across files."""

from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import functions as F

from streamds_spark.io.sources import parse_warc_bytes, read_warc


def _record(rec_id: str, rtype: str, uri: str, payload: bytes) -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Record-ID: <urn:uuid:{rec_id}>\r\n"
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"Content-Type: text/plain\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


TRICKY = b"embedded\r\n\r\nWARC/1.0\r\nfake header inside payload\r\n\r\nmore"


def _warc_file() -> bytes:
    return (
        _record("aaa", "warcinfo", "", b"software: test\r\n")
        + _record("bbb", "response", "http://example.com/1", b"hello world")
        + _record("ccc", "response", "http://example.com/2", TRICKY)
    )


def test_parse_warc_bytes_survives_embedded_delimiters():
    recs = parse_warc_bytes(_warc_file())
    assert [r[1] for r in recs] == ["warcinfo", "response", "response"]
    assert recs[2][6] == TRICKY  # payload byte-exact despite fake WARC header inside
    assert recs[1][2] == "http://example.com/1"
    assert all(r[5] == len(r[6]) for r in recs)


def test_parse_warc_bytes_gzip_members():
    # the Common Crawl layout: each record its own gzip member, concatenated
    raw = b"".join(
        gzip.compress(_record(f"r{i}", "response", f"http://x/{i}", b"p" * i))
        for i in range(1, 4)
    )
    recs = parse_warc_bytes(raw)
    assert len(recs) == 3 and [len(r[6]) for r in recs] == [1, 2, 3]


def test_read_warc_distributes_across_files(spark, tmp_path):
    d = str(tmp_path / "warcs")
    os.makedirs(d)
    with open(os.path.join(d, "seg-0.warc"), "wb") as f:
        f.write(_warc_file())
    with open(os.path.join(d, "seg-1.warc.gz"), "wb") as f:
        f.write(gzip.compress(_warc_file()))
    df = read_warc(spark, d)
    rows = df.collect()
    assert len(rows) == 6
    assert {os.path.basename(r["source_file"].split("file:")[-1]) for r in rows} == {
        "seg-0.warc",
        "seg-1.warc.gz",
    }
    responses = df.filter(F.col("warc_type") == "response")
    assert responses.count() == 4
    # payloads byte-exact through the Arrow boundary
    tricky = responses.filter(F.col("target_uri") == "http://example.com/2").collect()
    assert all(bytes(r["payload"]) == TRICKY for r in tricky) and len(tricky) == 2


def test_read_warc_feeds_text_pipeline(spark, tmp_path):
    """The corpus-ingest path: WARC → response payloads → text column →
    standard tokenize/quality ops run unchanged."""
    d = str(tmp_path / "warcs2")
    os.makedirs(d)
    with open(os.path.join(d, "a.warc"), "wb") as f:
        f.write(
            _record("x1", "response", "http://a", b"the quick brown fox")
            + _record("x2", "response", "http://b", b"jumps over the lazy dog")
        )
    docs = (
        read_warc(spark, d)
        .filter(F.col("warc_type") == "response")
        .select(
            F.col("target_uri").alias("url"),
            F.col("payload").cast("string").alias("text"),
        )
    )
    from streamds_spark.functions.text import tokens

    counts = docs.select("url", F.size(tokens(F.col("text"))).alias("n_tokens")).collect()
    assert {(r["url"], r["n_tokens"]) for r in counts} == {("http://a", 4), ("http://b", 5)}


# ---- HTML → text (the step after WARC) --------------------------------------


def test_html_to_text_extraction(spark):
    from streamds_spark.functions.text import html_to_text

    html = (
        "<html><head><title>skip me</title><style>p{color:red}</style></head>"
        "<body><!-- comment --><h1>Title</h1><p>Para one with <b>bold</b> "
        "&amp; entities &lt;tag&gt;.</p>\n<script>var x = '<p>not text</p>';"
        "</script><ul><li>item A</li><li>item B</li></ul></body></html>"
    )
    df = spark.createDataFrame([(1, html)], ["id", "raw"])
    got = df.select(html_to_text(F.col("raw")).alias("t")).first()["t"]
    assert "skip me" not in got and "color:red" not in got
    assert "not text" not in got and "comment" not in got
    assert "Title" in got and "Para one with bold & entities <tag>." in got
    assert "item A" in got and "item B" in got
    # block boundaries became newlines (segment ops can split on them)
    assert got.index("Title") < got.index("Para one")
    assert "\n" in got


def test_html_to_text_double_escaped_entities_single_decode(spark):
    """ADVICE r3: '&amp;lt;' renders as the literal text '&lt;', NOT '<' —
    the ampersand must decode LAST or escaped entities double-decode."""
    from streamds_spark.functions.text import html_to_text

    df = spark.createDataFrame(
        [(1, "<p>write &amp;lt; for a literal &lt; and &amp;amp; for &amp;</p>")],
        ["id", "raw"],
    )
    got = df.select(html_to_text(F.col("raw")).alias("t")).first()["t"]
    assert got.strip() == "write &lt; for a literal < and &amp; for &"


def test_warc_html_to_documents_pipeline(spark, tmp_path):
    """Full ingest: WARC response → html_to_text → tokenizable documents."""
    import gzip
    from streamds_spark.functions.text import html_to_text, tokens
    from streamds_spark.io.sources import read_warc

    d = str(tmp_path / "warc_html")
    os.makedirs(d)
    page = b"<html><body><p>alpha beta</p><p>gamma</p></body></html>"
    with open(os.path.join(d, "seg.warc.gz"), "wb") as f:
        f.write(gzip.compress(_record("h1", "response", "http://h", page)))
    docs = (
        read_warc(spark, d)
        .filter(F.col("warc_type") == "response")
        .select(
            F.col("target_uri").alias("url"),
            html_to_text(F.col("payload").cast("string")).alias("text"),
        )
    )
    r = docs.select("url", F.size(tokens(F.col("text"))).alias("n")).first()
    assert (r["url"], r["n"]) == ("http://h", 3)


def test_read_warc_quarantines_corrupt_segment(spark, tmp_path):
    """A truncated/garbage segment must not kill the scan in quarantine mode:
    good files parse fully, the bad file yields its salvageable prefix plus
    one _parse_error row; skip mode drops it; fail mode raises."""
    d = str(tmp_path / "warc_bad")
    os.makedirs(d)
    with open(os.path.join(d, "good.warc"), "wb") as f:
        f.write(_warc_file())
    with open(os.path.join(d, "bad.warc"), "wb") as f:
        f.write(_record("ok1", "response", "http://ok", b"salvage me") + b"GARBAGE-NOT-A-WARC-HEADER")
    q = read_warc(spark, d, on_error="quarantine")
    errs = q.filter(F.col("warc_type") == "_parse_error").collect()
    assert len(errs) == 1 and "bad.warc" in errs[0]["source_file"]
    # salvaged record before the corruption point survives
    ok = q.filter(F.col("record_id").contains("ok1")).collect()
    assert len(ok) == 1 and bytes(ok[0]["payload"]) == b"salvage me"
    assert q.count() == 3 + 1 + 1  # good file + salvaged + error row
    assert read_warc(spark, d, on_error="skip").count() == 3 + 1
    with pytest.raises(Exception, match="bad.warc"):
        read_warc(spark, d, on_error="fail").count()


# ---- parser fuzz (no Spark needed) ------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

payload_st = st.binary(min_size=0, max_size=200)
rtype_st = st.sampled_from(["response", "request", "metadata", "warcinfo"])


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(rtype_st, payload_st), min_size=1, max_size=8), st.booleans())
def test_parse_warc_roundtrip_fuzz(records, gz):
    """Any sequence of records — arbitrary binary payloads (CRLFs, fake WARC
    headers, NULs), optionally gzipped — must round-trip byte-exactly."""
    raw = b"".join(
        _record(f"r{i}", t, f"http://fuzz/{i}", p) for i, (t, p) in enumerate(records)
    )
    if gz:
        raw = gzip.compress(raw)
    recs = parse_warc_bytes(raw)
    assert len(recs) == len(records)
    for (want_type, want_payload), got in zip(records, recs):
        assert got[1] == want_type
        assert got[6] == want_payload
        assert got[5] == len(want_payload)


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=1, max_size=300))
def test_parse_warc_rejects_garbage_without_hanging(junk):
    """Arbitrary non-WARC bytes must raise (or parse cleanly if they happen
    to be valid) — never loop forever or return phantom records."""
    if junk[:2] == b"\x1f\x8b":
        return  # random bytes that fake a gzip magic die inside gzip — fine
    try:
        recs = parse_warc_bytes(junk)
    except (ValueError, IndexError):
        return
    assert all(r[5] == len(r[6]) for r in recs)
