"""Ingest robustness: JSONL reading with corrupt-record quarantine (the
schema-on-read path LLM corpora arrive through)."""

from __future__ import annotations

def test_read_jsonl_with_quarantine(spark, tmp_path):
    """JSONL ingest: valid rows typed, malformed lines quarantined with their
    raw text — nothing dropped, nothing fatal (PERMISSIVE + corrupt column)."""
    from streamds_spark.io.sources import read_jsonl, split_valid_rows

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world"}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "second"}\n'
        '{"doc_id": "NaN-ish", "text": 3}\n'  # wrong types → corrupt under schema
    )
    df = read_jsonl(spark, str(p), schema="doc_id BIGINT, text STRING")
    good, bad = split_valid_rows(df)
    good_rows = {(r["doc_id"], r["text"]) for r in good.collect()}
    assert good_rows == {(1, "hello world"), (2, "second")}
    bad_rows = [r["raw_line"] for r in bad.collect()]
    assert "this is not json at all" in bad_rows
    assert len(bad_rows) == 2
    assert "_corrupt_record" not in good.columns


def test_read_jsonl_infers_without_schema(spark, tmp_path):
    from streamds_spark.io.sources import read_jsonl

    p = tmp_path / "d.jsonl"
    p.write_text('{"a": 1}\n{"a": 2}\n')
    assert read_jsonl(spark, str(p)).count() == 2
