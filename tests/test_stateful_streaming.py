"""Custom stateful streaming operator (applyInPandasWithState): running keyed
count with explicit managed state — the generalized stage-2 stateful contract."""

from __future__ import annotations

import glob
import os
from collections import Counter

from pyspark.sql import functions as F

from streamds_spark.streaming.stateful import running_keyed_count


def test_running_keyed_count_stream(spark, tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src)
    golden: Counter = Counter()
    chunks = [["a a b", "c b"], ["a c", "c c d"]]
    for i, lines in enumerate(chunks):
        with open(os.path.join(src, f"c{i}.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
        for line in lines:
            golden.update(line.split())

    stream = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(src)
        .select(F.explode(F.split("value", r"\s+")).alias("word"))
        .filter(F.col("word") != "")
    )
    counts = running_keyed_count(stream)
    out = str(tmp_path / "out")

    def sink(batch_df, batch_id):
        batch_df.write.mode("overwrite").parquet(os.path.join(out, f"batch={batch_id}"))

    q = (
        counts.writeStream.outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # update mode emits touched keys per batch; the LAST emission per key is
    # the running total (A1's full-map re-emit, incrementalized)
    final: dict[str, int] = {}
    for b in sorted(glob.glob(os.path.join(out, "batch=*")), key=lambda p: int(p.split("=")[1])):
        for r in spark.read.parquet(b).collect():
            final[r["word"]] = r["count"]
    assert final == dict(golden)


def test_state_survives_restart(spark, tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src)
    open(os.path.join(src, "c0.txt"), "w").write("x x y\n")

    def run():
        stream = (
            spark.readStream.format("text")
            .option("maxFilesPerTrigger", 1)
            .load(src)
            .select(F.explode(F.split("value", r"\s+")).alias("word"))
            .filter(F.col("word") != "")
        )
        counts = running_keyed_count(stream)
        out = str(tmp_path / "out")

        def sink(batch_df, batch_id):
            batch_df.write.mode("overwrite").parquet(os.path.join(out, f"batch={batch_id}"))

        q = (
            counts.writeStream.outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .foreachBatch(sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    open(os.path.join(src, "c1.txt"), "w").write("x z\n")
    run()  # restart from checkpoint: x's state must carry over (2 → 3)

    final: dict[str, int] = {}
    for b in sorted(
        glob.glob(os.path.join(str(tmp_path / "out"), "batch=*")),
        key=lambda p: int(p.split("=")[1]),
    ):
        for r in spark.read.parquet(b).collect():
            final[r["word"]] = r["count"]
    assert final == {"x": 3, "y": 1, "z": 1}
