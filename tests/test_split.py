"""train_valid_test_split (queries/llmdata/sampling.py): the leakage guard —
byte-identical content must co-assign regardless of ids — plus determinism
and ratio sanity. Oracle equality is the driver/selfcheck gate's job."""

from __future__ import annotations

from streamds_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def test_identical_content_coassigns_regardless_of_id(spark):
    specs = load_all()
    fn = specs["train_valid_test_split"].fn
    base = {r["doc_id"]: r["split"] for r in fn(spark, SF).collect()}
    # clone every doc under shifted ids: every clone must land in its
    # original's split (assignment keys on content, not id)
    from pyspark.sql import functions as F

    from streamds_spark.catalog import load_table

    docs = load_table(spark, SF, "documents")
    n = docs.agg(F.max("doc_id")).collect()[0][0] + 1

    import streamds_spark.queries.llmdata.sampling as s

    cloned = docs.select((F.col("doc_id") + n).alias("doc_id"), "source", "text")
    b = (
        s.md5_int60(
            F.concat(F.lit(s._SPLIT_SALT), F.md5(F.col("text").cast("binary")))
        )
        % 1000
    )
    split = (
        F.when(b < s._SPLIT_TRAIN, "train")
        .when(b < s._SPLIT_VALID, "valid")
        .otherwise("test")
    )
    clone_splits = {
        r["doc_id"] - n: r["split"]
        for r in cloned.select("doc_id", split.alias("split")).collect()
    }
    assert clone_splits == base


def test_split_is_deterministic_and_ratio_sane(spark):
    specs = load_all()
    fn = specs["train_valid_test_split"].fn
    a = sorted(tuple(r) for r in fn(spark, SF).collect())
    b = sorted(tuple(r) for r in fn(spark, SF).collect())
    assert a == b
    counts: dict = {}
    for _, _, sp in a:
        counts[sp] = counts.get(sp, 0) + 1
    # 98/1/1 targets on 50 docs: train must dominate, eval splits tiny
    assert counts.get("train", 0) >= 0.9 * len(a)
    assert counts.get("valid", 0) + counts.get("test", 0) <= 0.1 * len(a)
