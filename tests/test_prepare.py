"""End-to-end prepare pipeline (streamds_spark/pipeline.py + CLI verb):
raw docs -> gates -> dedup -> decontamination -> tokenize -> pack -> shards,
with per-stage manifest accounting, pack-budget invariants, and no doc
lost or duplicated between tokenization and the shard output."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from streamds_spark.pipeline import pack_tokenized, prepare_corpus
import pytest


def _mk_docs(spark, path, n=30):
    rows = []
    for i in range(n):
        # mutually DISSIMILAR docs (distinct vocabulary per doc) so only the
        # planted duplicates trip the near-dup threshold
        text = " ".join(f"word{i}x{j}" for j in range(30))
        rows.append((i, "src0", "en", text))
    # exact duplicate of doc 0 and a near-duplicate of doc 1 -> dedup fodder
    rows.append((100, "src0", "en", rows[0][3]))
    rows.append((101, "src0", "en", rows[1][3] + " word1xtiny"))
    # junk that the hygiene gate must drop (too short)
    rows.append((102, "src0", "en", "short"))
    df = spark.createDataFrame(rows, "doc_id long, source string, lang string, text string")
    df = df.withColumn("n_chars", F.length("text").cast("bigint"))
    df.write.mode("overwrite").parquet(path)
    return df


@pytest.mark.slow
def test_prepare_end_to_end(spark, tmp_path):
    src = str(tmp_path / "raw")
    bench = str(tmp_path / "bench")
    out = str(tmp_path / "out")
    _mk_docs(spark, src)
    # benchmark containing doc 5's text -> decontamination must remove it
    spark.read.parquet(src).filter(F.col("doc_id") == 5).select(
        "doc_id", "text"
    ).write.mode("overwrite").parquet(bench)

    manifest = prepare_corpus(
        spark, src, out, benchmark=bench, merges=30, block_tokens=64, n_shards=4
    )
    # stage accounting: monotone nonincreasing, junk + dups + contaminated gone
    assert manifest["input_docs"] == 33
    assert manifest["gated_docs"] == 32  # 'short' dropped
    assert manifest["deduped_docs"] < manifest["gated_docs"]  # dup collapsed
    assert manifest["clean_docs"] == manifest["deduped_docs"] - 1  # doc 5 out
    assert manifest["packed_docs"] == manifest["clean_docs"]
    assert manifest["total_tokens"] > 0 and manifest["n_packs"] >= 1
    # doc 5 really is gone; doc 100 (exact dup) gone; doc 0 survives
    shards = spark.read.parquet(f"{out}/shards")
    ids = {r["doc_id"] for r in shards.select("doc_id").collect()}
    assert 5 not in ids and 100 not in ids and 0 in ids
    # every doc exactly once
    assert shards.count() == shards.select("doc_id").distinct().count()
    # manifest file matches the return value
    with open(f"{out}/manifest.json") as f:
        assert json.load(f) == manifest
    # tokenizer artifact exists and is loadable
    with open(f"{out}/tokenizer.json") as f:
        model = json.load(f)
    assert model["algo"] == "bpe" and model["merges"]


@pytest.mark.slow
def test_resume_skips_completed_stages(spark, tmp_path):
    """resume=True reads existing stage outputs instead of recomputing:
    upstream stage files keep their mtimes, a deleted downstream stage is
    rebuilt, and the manifest is unchanged."""
    import os

    src = str(tmp_path / "raw")
    out = str(tmp_path / "out")
    _mk_docs(spark, src, n=12)
    m1 = prepare_corpus(spark, src, out, merges=20, block_tokens=64, n_shards=2)

    def _mtimes(stage):
        d = f"{out}/{stage}"
        return {f: os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)}

    gated_before = _mtimes("01_gated.parquet")
    # kill the dedup stage output; resume must rebuild IT but not the gate
    import shutil

    shutil.rmtree(f"{out}/02_deduped.parquet")
    m2 = prepare_corpus(
        spark, src, out, merges=20, block_tokens=64, n_shards=2, resume=True
    )
    assert m2 == m1
    assert _mtimes("01_gated.parquet") == gated_before  # untouched
    # torn stage (no _SUCCESS) is recomputed, not trusted
    os.remove(f"{out}/02_deduped.parquet/_SUCCESS")
    before = _mtimes("01_gated.parquet")
    m3 = prepare_corpus(
        spark, src, out, merges=20, block_tokens=64, n_shards=2, resume=True
    )
    assert m3 == m1
    assert _mtimes("01_gated.parquet") == before
    assert os.path.exists(f"{out}/02_deduped.parquet/_SUCCESS")


def test_pack_budget_invariant(spark):
    """Start-offset packing: a pack may overshoot the budget by at most one
    document; packs within a shard are contiguous starting at 0."""
    rows = [(i, [f"t{j}" for j in range(5 + (i * 7) % 23)]) for i in range(200)]
    tok = spark.createDataFrame(rows, "doc_id long, pieces array<string>")
    packed = pack_tokenized(tok, block_tokens=50, n_shards=4)
    stats = (
        packed.groupBy("shard", "pack_id")
        .agg(F.sum("n_tokens").alias("pt"), F.max("n_tokens").alias("mx"))
        .collect()
    )
    for r in stats:
        assert r["pt"] < 50 + r["mx"] + 1
    for shard_rows in [
        sorted(r["pack_id"] for r in stats if r["shard"] == s) for s in range(4)
    ]:
        if shard_rows:
            assert shard_rows[0] == 0
            assert shard_rows == list(range(len(shard_rows)))
    # all docs packed exactly once
    assert packed.count() == 200


@pytest.mark.slow
def test_cli_prepare_verb(spark, tmp_path, capsys):
    src = str(tmp_path / "raw")
    out = str(tmp_path / "out")
    _mk_docs(spark, src, n=12)
    from streamds_spark.cli import main

    assert main(["prepare", src, out, "--merges", "20", "--block-tokens", "64",
                 "--shards", "2"]) == 0
    outtext = capsys.readouterr().out
    assert "manifest:" in outtext
    m = json.loads(outtext.split("manifest:")[1].strip())
    assert m["packed_docs"] > 0
    # nesting guard: dest inside src refused
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["prepare", src, f"{src}/nested"])


@pytest.mark.slow
def test_kill_mid_stage_resume_recomputes_only_torn_stage(spark, tmp_path, monkeypatch):
    """Kill the pipeline INSIDE stage 02 (writer dies mid-write, torn parquet
    on disk, no _SUCCESS): the resume=True rerun must read stage 01 instead
    of recomputing it, recompute exactly the torn stage, and finish with a
    byte-identical manifest to an uninterrupted run."""
    import os
    import shutil

    import pytest

    from streamds_spark.operators import dedup_pipeline as dp
    from streamds_spark.queries.llmdata import corpus as corpus_mod

    src = str(tmp_path / "raw")
    out = str(tmp_path / "out")
    out_ref = str(tmp_path / "ref")
    _mk_docs(spark, src, n=12)
    kw = dict(merges=20, block_tokens=64, n_shards=2)
    m_ref = prepare_corpus(spark, src, out_ref, **kw)  # the uninterrupted run

    real_dedup = dp.dedup_corpus

    def killed_dedup(df, **kwargs):
        # the writer died mid-write: a torn partial output lands, no _SUCCESS
        dest = f"{out}/02_deduped.parquet"
        os.makedirs(dest, exist_ok=True)
        with open(os.path.join(dest, "part-00000-torn.parquet"), "wb") as f:
            f.write(b"torn bytes, not parquet")
        raise RuntimeError("killed mid-stage")

    monkeypatch.setattr(dp, "dedup_corpus", killed_dedup)
    with pytest.raises(RuntimeError, match="killed mid-stage"):
        prepare_corpus(spark, src, out, **kw)
    assert os.path.exists(f"{out}/01_gated.parquet/_SUCCESS")  # stage 01 done
    assert not os.path.exists(f"{out}/02_deduped.parquet/_SUCCESS")  # 02 torn
    assert not os.path.exists(f"{out}/manifest.json")

    # rerun with resume: stage 01 must be READ (its compute fn never called,
    # its files untouched), the torn stage recomputed
    monkeypatch.setattr(dp, "dedup_corpus", real_dedup)
    gate_calls: list[int] = []
    real_gate = corpus_mod.pipeline_gate

    def counting_gate(df):
        gate_calls.append(1)
        return real_gate(df)

    monkeypatch.setattr(corpus_mod, "pipeline_gate", counting_gate)
    gated_dir = f"{out}/01_gated.parquet"
    mtimes_before = {
        f: os.path.getmtime(os.path.join(gated_dir, f)) for f in os.listdir(gated_dir)
    }
    m2 = prepare_corpus(spark, src, out, resume=True, **kw)
    assert gate_calls == [], "stage 01 was recomputed on resume"
    assert {
        f: os.path.getmtime(os.path.join(gated_dir, f)) for f in os.listdir(gated_dir)
    } == mtimes_before
    assert os.path.exists(f"{out}/02_deduped.parquet/_SUCCESS")
    assert m2 == m_ref
    with open(f"{out}/manifest.json", "rb") as f_out, open(
        f"{out_ref}/manifest.json", "rb"
    ) as f_ref:
        assert f_out.read() == f_ref.read()  # byte-identical final manifest
    shutil.rmtree(out_ref)
