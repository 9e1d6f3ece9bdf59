"""Round-4 corpus additions: NFC normalization (textnorm.py), multi-language
stopword voting, sentence stats, domain caps, license flags — exercised on
fixtures with real unicode / multilingual / licensing content (the registry
runs them over the ASCII synthetic corpus, where most signals are trivially
zero)."""

from __future__ import annotations

import unicodedata

from pyspark.sql import functions as F

from streamds_spark.queries.llmdata.sampling import domain_cap_sample
from streamds_spark.queries.llmdata.textnorm import normalization_drift, normalize_text
from streamds_spark.queries.llmdata.textstats import lang_id_multi, sentence_stats
from streamds_spark.queries.llmdata.webfilter import license_flag_docs


def _write_docs(spark, tmp_out, rows):
    df = spark.createDataFrame(
        [
            (i, text, lang, source, len(text))
            for i, (text, lang, source) in enumerate(rows)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_out}/documents.parquet")
    return tmp_out


DECOMPOSED = "café résumé"  # e + combining acute, NFD form


class TestNormalize:
    def test_nfc_canonicalizes(self, spark, tmp_out):
        sf = _write_docs(
            spark,
            tmp_out,
            [(DECOMPOSED, "fr", "web"), ("plain ascii text", "en", "web")],
        )
        out = {
            r.doc_id: r.text
            for r in normalize_text(
                spark.read.parquet(f"{sf}/documents.parquet")
            ).collect()
        }
        assert out[0] == unicodedata.normalize("NFC", DECOMPOSED)
        assert len(out[0]) < len(DECOMPOSED)  # combining pairs precomposed
        assert out[1] == "plain ascii text"

    def test_drift_report(self, spark, tmp_out):
        sf = _write_docs(
            spark,
            tmp_out,
            [
                (DECOMPOSED, "fr", "web"),
                ("ccafé already composed", "fr", "web"),
                ("ascii only", "en", "web"),
            ],
        )
        rows = {r.lang: r for r in normalization_drift(spark, sf).collect()}
        assert rows["fr"].docs == 2 and rows["fr"].changed_docs == 1
        assert rows["fr"].chars_saved == 3  # three combining marks removed
        assert rows["en"].changed_docs == 0 and rows["en"].chars_saved == 0

    def test_normalized_forms_dedup_together(self, spark, tmp_out):
        """The reason this pass exists: NFD and NFC spellings of the same word
        hash apart before normalization, together after."""
        sf = _write_docs(
            spark,
            tmp_out,
            [(DECOMPOSED, "fr", "a"), (unicodedata.normalize("NFC", DECOMPOSED), "fr", "b")],
        )
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        assert docs.select(F.md5("text")).distinct().count() == 2
        assert normalize_text(docs).select(F.md5("text")).distinct().count() == 1


class TestLangIdMulti:
    def test_votes_per_language(self, spark, tmp_out):
        sf = _write_docs(
            spark,
            tmp_out,
            [
                ("the cat is in the house and that is fine with me", "en", "w"),
                ("der hund ist nicht mit der katze und das ist gut", "de", "w"),
                ("le chat est dans les jardins et des fleurs pour toi", "fr", "w"),
                ("el perro que ladra en un parque y los gatos", "es", "w"),
            ],
        )
        got = {r.doc_id: r.lang_guess for r in lang_id_multi(spark, sf).collect()}
        assert got == {0: "en", 1: "de", 2: "fr", 3: "es"}


class TestSentenceStats:
    def test_counts(self, spark, tmp_out):
        sf = _write_docs(
            spark,
            tmp_out,
            [("First one. Second, with clause; done! Third?? Yes.", "en", "w")],
        )
        r = sentence_stats(spark, sf).collect()[0]
        assert r.n_sentences == 4  # ". " "! " "?? " ". at end"
        assert r.n_clause_marks == 2


class TestDomainCap:
    def test_cap_enforced_and_deterministic(self, spark, tmp_out):
        rows = [(f"doc number {i} text", "en", f"s{i % 3}") for i in range(200)]
        sf = _write_docs(spark, tmp_out, rows)
        out = domain_cap_sample(spark, sf)
        per_src = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
        assert all(n == 40 for n in per_src.values())  # 66+ docs per source, capped at 40
        again = domain_cap_sample(spark, sf)
        assert sorted(r.doc_id for r in out.collect()) == sorted(
            r.doc_id for r in again.collect()
        )


class TestLicenseFlags:
    def test_phrases_flagged(self, spark, tmp_out):
        sf = _write_docs(
            spark,
            tmp_out,
            [
                ("This work is licensed under a Creative Commons license.", "en", "a"),
                ("All Rights Reserved. Do not redistribute.", "en", "a"),
                ("Plain text with no rights language.", "en", "b"),
            ],
        )
        rows = {r["source"]: r for r in license_flag_docs(spark, sf).collect()}
        assert rows["a"].flagged_docs == 2 and rows["a"].flag_rate == 1.0
        assert rows["b"].flagged_docs == 0
