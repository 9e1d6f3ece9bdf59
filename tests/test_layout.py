"""Physical layout: small-file compaction and the sorted/sized corpus writer."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamds_spark.io.layout import compact_small_files, dir_file_stats, write_corpus


def test_compact_small_files(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    # simulate the small-files problem: 64 tiny files
    spark.range(0, 64_000).repartition(64).write.parquet(src)
    assert dir_file_stats(src)["n_files"] == 64

    dest = str(tmp_path / "compacted")
    report = compact_small_files(spark, src, dest, target_file_bytes=10 * 1024 * 1024)
    assert report["after"]["n_files"] < report["before"]["n_files"]
    assert report["after"]["n_files"] == report["target_files"]
    # no rows lost
    assert spark.read.parquet(dest).count() == 64_000


def test_compact_respects_max_records_cap(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.range(0, 10_000).repartition(8).write.parquet(src)
    dest = str(tmp_path / "dst")
    compact_small_files(
        spark, src, dest, target_file_bytes=1024 * 1024 * 1024, max_records_per_file=2_500
    )
    stats = dir_file_stats(dest)
    assert stats["n_files"] >= 4  # 10k rows / 2.5k cap
    assert spark.read.parquet(dest).count() == 10_000


def test_write_corpus_clustering_enables_rowgroup_stats(spark, tmp_path):
    """Sorted write → each file covers a narrow id range (row-group/min-max
    locality), and a selective filter still reaches the scan as a pushed
    filter over the clustered column."""
    from streamds_spark.plans.audit import plan_facts

    df = spark.range(0, 50_000).select(
        F.col("id"), (F.col("id") % 7).alias("bucket"), F.md5(F.col("id").cast("string")).alias("pad")
    )
    path = str(tmp_path / "corpus")
    write_corpus(df, path, sort_col="id", n_files=8)
    stats = dir_file_stats(path)
    assert stats["n_files"] == 8

    back = spark.read.parquet(path).filter(F.col("id") == 123)
    f = plan_facts(back)
    assert any("id" in p for p in f.pushed_filters)
    assert back.count() == 1


def test_write_corpus_partitioned(spark, tmp_path):
    from streamds_spark.plans.audit import formatted_plan

    df = spark.range(0, 1_000).select(F.col("id"), (F.col("id") % 3).alias("part"))
    path = str(tmp_path / "parted")
    write_corpus(df, path, partition_cols=["part"])
    back = spark.read.parquet(path).filter(F.col("part") == 1)
    plan = formatted_plan(back)
    assert "PartitionFilters" in plan
    assert back.count() == 334 or back.count() == 333
