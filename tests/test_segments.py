"""Segment-level operators: boilerplate stripping, inverted index, SemDeDup.

Crafted corpora with hand-computable segment frequencies and postings verify
the semantics independent of the DuckDB oracle (which selfcheck covers).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streamds_spark.functions.text import tokens
from streamds_spark.queries.llmdata import segments as seg


def _boilerplate_report(spark, rows):
    """Run the segment-dedup plan fragment on an in-memory corpus."""
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    n = seg.SEG_TOKENS
    chunks = F.expr(
        f"CASE WHEN size(toks) >= 1 THEN transform("
        f"  sequence(0, CAST(ceil(size(toks) / {n}.0) AS INT) - 1),"
        f"  i -> concat_ws(' ', slice(toks, i*{n}+1, {n}))) "
        f"ELSE array() END"
    )
    segs = (
        docs.select("doc_id", tokens(F.col("text")).alias("toks"))
        .select("doc_id", F.posexplode(chunks).alias("pos", "seg"))
        .withColumn("seg_h", F.md5(F.col("seg").cast("binary")))
    )
    freq = segs.groupBy("seg_h").agg(F.countDistinct("doc_id").alias("df"))
    joined = segs.join(freq, "seg_h")
    kept = F.when(F.col("df") <= seg.SEG_DF_MAX, F.struct("pos", "seg"))
    rep = joined.groupBy("doc_id").agg(
        F.count("*").alias("n_segs"),
        F.count(F.when(F.col("df") <= seg.SEG_DF_MAX, 1)).alias("kept_segs"),
        F.concat_ws(
            " ",
            F.transform(F.array_sort(F.collect_list(kept)), lambda x: x["seg"]),
        ).alias("clean_text"),
    )
    return {r["doc_id"]: r.asDict() for r in rep.collect()}


def test_boilerplate_segments_stripped(spark):
    # "nav bar home" appears in all 4 docs (df=4 > SEG_DF_MAX=2) -> stripped;
    # each doc's unique tail (df=1) survives.
    rows = [
        (0, "nav bar home alpha beta gamma"),
        (1, "nav bar home delta epsilon zeta"),
        (2, "nav bar home eta theta iota"),
        (3, "nav bar home kappa lambda mu"),
    ]
    got = _boilerplate_report(spark, rows)
    assert got[0]["n_segs"] == 2 and got[0]["kept_segs"] == 1
    assert got[0]["clean_text"] == "alpha beta gamma"
    assert got[3]["clean_text"] == "kappa lambda mu"


def test_boilerplate_df_at_threshold_kept(spark):
    # shared segment in exactly SEG_DF_MAX docs is NOT boilerplate.
    rows = [
        (0, "shared seg one alpha beta gamma"),
        (1, "shared seg one delta epsilon zeta"),
    ]
    got = _boilerplate_report(spark, rows)
    assert got[0]["kept_segs"] == 2
    assert got[0]["clean_text"] == "shared seg one alpha beta gamma"


def test_boilerplate_short_tail_segment(spark):
    # 4 tokens -> segments "a b c" and "d"; both unique, both kept, order stable.
    got = _boilerplate_report(spark, [(0, "a b c d")])
    assert got[0]["n_segs"] == 2
    assert got[0]["clean_text"] == "a b c d"


def test_inverted_index_postings_semantics(spark, monkeypatch):
    docs = spark.createDataFrame(
        [
            (3, "apple banana apple"),
            (1, "apple cherry"),
            (2, "banana"),
        ],
        ["doc_id", "text"],
    )
    monkeypatch.setattr(
        "streamds_spark.queries.llmdata.segments.load_table",
        lambda _s, _d, _t: docs,
    )
    got = {
        r["w"]: r.asDict()
        for r in seg.inverted_index_postings(spark, "ignored").collect()
    }
    assert got["apple"]["doc_freq"] == 2
    assert got["apple"]["term_freq"] == 3
    assert got["apple"]["postings_head"] == "1,3"  # sorted doc_ids
    assert got["banana"]["postings_head"] == "2,3"
    assert got["cherry"]["doc_freq"] == 1


def test_semdedup_clusters_on_real_table(spark):
    # End-to-end on sf0.001: every embedding assigned, cluster sizes sum to
    # n - k (centroids excluded from member stats), cosines bounded.
    df = seg.semdedup_clusters(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    emb_n = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").count()
    assert sum(r["cluster_size"] for r in rows) == emb_n - seg.SEMDEDUP_K
    for r in rows:
        assert -1.0 <= r["avg_cos_centroid"] <= 1.0
        assert -1.0 <= r["max_noncentroid_cos"] <= 1.0
        assert r["neardup_pairs"] >= 0


def test_semdedup_identical_vectors_found(spark, monkeypatch):
    # Two identical vectors in the same cluster within the id band must be
    # reported as a near-dup pair (cos = 1.0 >= tau).
    base = [[1.0] + [0.0] * 63, [0.0] * 32 + [1.0] + [0.0] * 31]
    vecs = []
    for i in range(seg.SEMDEDUP_K):
        v = [0.0] * 64
        v[i] = 1.0
        vecs.append((i, v))
    vecs.append((100, base[0]))
    vecs.append((101, base[0]))  # identical to 100, id-adjacent
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs], ["vec_id", "embedding"]
    )
    monkeypatch.setattr(
        "streamds_spark.queries.llmdata.segments.load_table",
        lambda _s, _d, _t: emb,
    )
    rows = seg.semdedup_clusters(spark, "ignored").collect()
    # vecs 100/101 both align with centroid 0 (cos=1); pair must be counted.
    by_cid = {r["centroid_id"]: r for r in rows}
    assert by_cid[0]["neardup_pairs"] >= 1
