"""Chunking coverage properties and LSH planner sanity (segments.py /
lshplan.py additions)."""

from __future__ import annotations

from streamds_spark.queries.llmdata.lshplan import N_HASHES, lsh_param_planner
from streamds_spark.queries.llmdata.segments import (
    CHUNK_STRIDE,
    CHUNK_WIDTH,
    chunk_documents_overlap,
)

SF = "/root/testdata/sf0.001"


class TestChunking:
    def test_full_coverage_and_overlap(self, spark):
        """Every token index of every doc is inside >= 1 chunk; consecutive
        chunks overlap by WIDTH - STRIDE except possibly the tail."""
        from pyspark.sql import functions as F

        from streamds_spark.catalog import load_table
        from streamds_spark.functions.text import tokens

        docs = (
            load_table(spark, SF, "documents")
            .select("doc_id", F.size(tokens(F.col("text"))).alias("n"))
            .where(F.col("n") > 0)
        )
        chunks = chunk_documents_overlap(spark, SF)
        per_doc = chunks.groupBy("doc_id").agg(
            F.max(F.col("start_token") + F.col("n_chunk_tokens")).alias("max_end"),
            F.min("start_token").alias("min_start"),
            F.count("*").alias("n_chunks"),
        )
        j = docs.join(per_doc, "doc_id").collect()
        assert len(j) == docs.count()
        for r in j:
            assert r.min_start == 0
            assert r.max_end == r.n  # tail chunk reaches the last token
            assert r.n_chunks == (r.n + CHUNK_STRIDE - 1) // CHUNK_STRIDE

    def test_chunk_text_reconstructs(self, spark):
        """Concatenating the non-overlapping prefix (first STRIDE tokens) of
        each chunk reproduces the tokenized doc."""
        from pyspark.sql import functions as F

        from streamds_spark.catalog import load_table
        from streamds_spark.functions.text import tokens

        doc = (
            load_table(spark, SF, "documents")
            .select("doc_id", tokens(F.col("text")).alias("t"))
            .where(F.size("t") > CHUNK_WIDTH)
            .limit(1)
            .collect()[0]
        )
        rows = sorted(
            chunk_documents_overlap(spark, SF)
            .where(F.col("doc_id") == doc.doc_id)
            .collect(),
            key=lambda r: r.chunk_idx,
        )
        rebuilt: list[str] = []
        for r in rows:
            rebuilt.extend(r.chunk_text.split(" ")[:CHUNK_STRIDE])
        assert rebuilt == list(doc.t)


class TestLshPlanner:
    def test_scurve_properties(self, spark):
        rows = {r.rows_per_band: r for r in lsh_param_planner(spark, SF).collect()}
        assert set(rows) == set(range(1, 17))
        for r in rows.values():
            assert r.rows_per_band * r.bands <= N_HASHES
            assert r.hashes_used == r.rows_per_band * r.bands
            # p monotonically increases with s
            ps = [r.p030, r.p050, r.p060, r.p070, r.p080, r.p090]
            assert ps == sorted(ps)
        # more rows per band -> higher detection threshold (sharper curve)
        th = [rows[r].threshold for r in range(2, 17)]
        assert th == sorted(th)
        # the canonical (b=16, r=8) setup detects s=0.9 reliably, s=0.3 rarely
        assert rows[8].p090 > 0.95 and rows[8].p030 < 0.01
