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


def test_zorder_write_clusters_both_dims(spark, tmp_path):
    """Z-order layout: per-file min/max boxes must be tight in BOTH clustered
    dimensions, so a 2-D box predicate can skip most files — the property a
    single-column sort cannot provide for the second column."""
    from streamds_spark.io.layout import write_zordered

    n = 40_000
    # exact 200x200 grid: x and y independent (row/column decomposition)
    df = spark.range(0, n).select(
        (F.col("id") % 200).alias("x"),
        (F.col("id") / 200).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    zpath = str(tmp_path / "zordered")
    spath = str(tmp_path / "xsorted")
    write_zordered(df, zpath, cols=["x", "y"], bits=8, n_files=64)
    write_corpus(df.repartitionByRange(64, "x"), spath, sort_col="x", n_files=None)

    def file_boxes(path):
        back = spark.read.parquet(path).withColumn("f", F.input_file_name())
        return [
            tuple(r[1:])
            for r in back.groupBy("f")
            .agg(F.min("x"), F.max("x"), F.min("y"), F.max("y"))
            .collect()
        ]

    zboxes, sboxes = file_boxes(zpath), file_boxes(spath)

    def files_hit(boxes, qxmn, qxmx, qymn, qymx):
        return sum(
            1
            for xmn, xmx, ymn, ymx in boxes
            if xmx >= qxmn and xmn <= qxmx and ymx >= qymn and ymn <= qymx
        )

    # predicate on the NON-sorted dim y in [40,60]: every x-sorted file spans
    # all of y (all 64 hit); z-order confines y to tiles → most files skipped
    z_y = files_hit(zboxes, 0, 199, 40, 60)
    s_y = files_hit(sboxes, 0, 199, 40, 60)
    assert s_y == len(sboxes), "x-sorted layout cannot skip on y"
    assert z_y <= len(zboxes) // 2, (z_y, len(zboxes))

    # predicate on x must STILL skip under z-order (the trade: good on all
    # dims instead of perfect on one)
    z_x = files_hit(zboxes, 40, 60, 0, 199)
    assert z_x <= len(zboxes) // 2, (z_x, len(zboxes))

    # no rows lost, values intact
    assert spark.read.parquet(zpath).agg(F.sum("payload")).first()[0] == n * (n - 1) // 2


def test_interleave_bits_orders_like_morton_curve(spark):
    """The generated key equals a reference Morton encoding computed in Python."""
    from streamds_spark.io.layout import interleave_bits

    rows = [(x, y) for x in range(0, 16) for y in range(0, 16)]
    df = spark.createDataFrame(rows, "x: long, y: long")
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn(
            "z", interleave_bits([F.col("x"), F.col("y")], bits=4)
        ).collect()
    }

    def morton(x, y, bits=4):
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
        return z

    assert got == {(x, y): morton(x, y) for x, y in rows}


def test_morton_key_preserves_dominance(spark):
    """If a dominates b in every dimension (a.x >= b.x and a.y >= b.y), then
    morton(a) >= morton(b) — the property that makes per-file z-key ranges
    translate into per-dimension min/max bounds."""
    import random

    from streamds_spark.io.layout import interleave_bits

    rng = random.Random(7)
    pts = [(rng.randrange(256), rng.randrange(256)) for _ in range(300)]
    df = spark.createDataFrame(pts, "x: long, y: long")
    z = {
        (r.x, r.y): r.z
        for r in df.withColumn("z", interleave_bits([F.col("x"), F.col("y")], bits=8)).collect()
    }
    for (x1, y1) in pts[:60]:
        for (x2, y2) in pts[:60]:
            if x1 >= x2 and y1 >= y2:
                assert z[(x1, y1)] >= z[(x2, y2)], ((x1, y1), (x2, y2))
