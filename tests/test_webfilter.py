"""Web-corpus hygiene filters (queries/llmdata/webfilter.py) on realistic
fixture documents — the registry runs these over the synthetic word-salad
`documents` table, so the line/punctuation/mojibake rule logic is exercised
here with text that actually has newlines, bullets, duplicate lines, repeated
n-grams, and encoding damage."""

from __future__ import annotations

import pytest

from streamds_spark.queries.llmdata.webfilter import (
    GOPHER_THRESHOLDS,
    c4_line_filter,
    gopher_quality_flags,
    mojibake_score,
    script_profile,
)

GOOD_BODY = (
    "the quick brown fox jumps over the lazy dog and then runs away to have "
    "a rest with plenty of friends that come along for dinner every single "
    "evening because they enjoy good company and be happy about all of it "
    "while the moon rises over the quiet hills of the valley town tonight "
    "and every cat naps softly near the warm fire place downstairs again"
)


def _write_docs(spark, tmp_out, rows):
    df = spark.createDataFrame(
        [(i, text, "en", "fixture", len(text)) for i, text in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_out}/documents.parquet")
    return tmp_out


class TestGopher:
    @pytest.mark.slow
    def test_clean_doc_keeps(self, spark, tmp_out):
        sf = _write_docs(spark, tmp_out, [GOOD_BODY])
        row = gopher_quality_flags(spark, sf).collect()[0]
        assert row.n_words >= GOPHER_THRESHOLDS["min_words"]
        assert row.stopword_hits >= 2
        assert row.alpha_word_frac == 1.0
        assert row.gopher_keep is True

    @pytest.mark.slow
    def test_too_short_rejected(self, spark, tmp_out):
        sf = _write_docs(spark, tmp_out, ["too short to pass the fifty word gate"])
        row = gopher_quality_flags(spark, sf).collect()[0]
        assert row.n_words < 50 and row.gopher_keep is False

    @pytest.mark.slow
    def test_duplicate_lines_rejected(self, spark, tmp_out):
        dup_line = "this exact line repeats many times in the page."
        text = GOOD_BODY + "\n" + "\n".join([dup_line] * 10)
        sf = _write_docs(spark, tmp_out, [text])
        row = gopher_quality_flags(spark, sf).collect()[0]
        # 9 of 11 lines are repeats of an earlier value
        assert row.dup_line_frac == round(9 / 11, 4)
        assert row.dup_line_char_frac > GOPHER_THRESHOLDS["max_dup_line_char_frac"]
        assert row.gopher_keep is False

    @pytest.mark.slow
    def test_repeated_ngram_rejected(self, spark, tmp_out):
        text = GOOD_BODY + " " + ("click here to buy now " * 30)
        sf = _write_docs(spark, tmp_out, [text])
        row = gopher_quality_flags(spark, sf).collect()[0]
        assert row.dup5gram_char_frac > GOPHER_THRESHOLDS["max_dup5gram_char_frac"]
        assert row.gopher_keep is False

    @pytest.mark.slow
    def test_bullet_lines_rejected(self, spark, tmp_out):
        bullets = "\n".join(f"- item number {i} in the list" for i in range(20))
        sf = _write_docs(spark, tmp_out, [bullets])
        row = gopher_quality_flags(spark, sf).collect()[0]
        assert row.bullet_line_frac == 1.0 and row.gopher_keep is False

    @pytest.mark.slow
    def test_symbol_ratio(self, spark, tmp_out):
        text = "see more ... and more ... # tags # everywhere # now"
        sf = _write_docs(spark, tmp_out, [text])
        row = gopher_quality_flags(spark, sf).collect()[0]
        # 2 ellipses + 3 hashes over 12 whitespace tokens
        assert row.symbol_word_ratio == round(5 / 12, 4)

    @pytest.mark.slow
    def test_no_alpha_words(self, spark, tmp_out):
        sf = _write_docs(spark, tmp_out, ["12 34 56 78 90 11 22 33"])
        row = gopher_quality_flags(spark, sf).collect()[0]
        assert row.alpha_word_frac == 0.0 and row.gopher_keep is False


class TestC4:
    @pytest.mark.slow
    def test_line_rules(self, spark, tmp_out):
        text = "\n".join(
            [
                "This line ends with proper punctuation.",  # kept
                "no terminal punctuation here",  # dropped: no punct
                "Short.",  # dropped: < 3 words
                "Please enable javascript to continue.",  # dropped: javascript
                'He said "stop right there."',  # kept
            ]
        )
        sf = _write_docs(spark, tmp_out, [text])
        row = c4_line_filter(spark, sf).collect()[0]
        assert row.n_lines == 5
        assert row.n_kept_lines == 2
        assert row.page_dropped is False
        kept = ["This line ends with proper punctuation.", 'He said "stop right there."']
        assert row.cleaned_chars == len("\n".join(kept))

    @pytest.mark.parametrize("poison", ["some Lorem Ipsum filler text.", "code { display }"])
    @pytest.mark.slow
    def test_page_drops(self, spark, tmp_out, poison):
        sf = _write_docs(spark, tmp_out, ["A good line stays here.\n" + poison])
        row = c4_line_filter(spark, sf).collect()[0]
        assert row.page_dropped is True
        assert row.n_kept_lines == 0 and row.cleaned_chars == 0


class TestMojibake:
    @pytest.mark.slow
    def test_detects_double_decode(self, spark, tmp_out):
        sf = _write_docs(
            spark,
            tmp_out,
            [
                "itâ€™s a classic â€œquoteâ€ gone wrong with cafÃ© Ã©clair",
                "clean text with no encoding damage at all",
                "bad byte � here and � there",
            ],
        )
        rows = {r.doc_id: r for r in mojibake_score(spark, sf).collect()}
        assert rows[0].is_suspect is True and rows[0].mojibake_hits >= 3
        assert rows[1].is_suspect is False and rows[1].mojibake_hits == 0
        assert rows[2].replacement_chars == 2 and rows[2].is_suspect is True


@pytest.mark.slow
def test_c4_columns_stream_equals_batch(spark, tmp_out):
    """The C4 expressions are stateless Catalyst columns, so the exact same
    c4_stat_columns() list runs on readStream — filter-at-ingest and
    filter-in-batch can never diverge because they share the expression
    objects."""
    from streamds_spark.queries.llmdata.webfilter import c4_stat_columns

    texts = [
        "Good line one stays here.\nshort\nAnother keeper line stays too.",
        "lorem ipsum dolor sit amet.",
        "Line mentioning javascript gets dropped.\nBut this line is fine.",
    ]
    sf = _write_docs(spark, tmp_out, texts)

    batch = {
        r.doc_id: r for r in spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", *c4_stat_columns())
        .collect()
    }
    stream_df = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .parquet(f"{sf}/documents.parquet")
        .select("doc_id", *c4_stat_columns())
    )
    q = (
        stream_df.writeStream.format("memory")
        .queryName("c4_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    streamed = {r.doc_id: r for r in spark.sql("SELECT * FROM c4_stream").collect()}
    assert len(streamed) == len(texts)
    for i in streamed:
        assert streamed[i] == batch[i]


class TestScriptProfile:
    @pytest.mark.slow
    def test_script_fractions(self, spark, tmp_out):
        # 10 latin letters + 2 spaces + 4 CJK chars
        sf = _write_docs(spark, tmp_out, ["hello world 你好世界 42"])
        row = script_profile(spark, sf).collect()[0]
        n = len("hello world 你好世界 42")
        assert row.docs == 1
        assert row.latin_frac == round(10 / n, 4)
        assert row.cjk_frac == round(4 / n, 4)
        assert row.digit_frac == round(2 / n, 4)
        assert row.cyrillic_frac == 0.0
