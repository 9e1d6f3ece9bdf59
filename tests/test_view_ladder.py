"""min_ladder/max_ladder view aggregates (streaming/viewstore.py, VERDICT
r10 item 6): min/max answers that stay takedown-subtractable until a key's
top-J ladder is exhausted — stream==batch exactness, exact subtraction
through the recorded runner-ups, atomic refusal (nothing written) on
exhaustion, cascade disposition, replay/compaction invariance."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from streamds_spark.streaming.viewstore import (
    ViewSpec,
    cascade_delete_to_views,
    compact_view,
    delete_from_view,
    rebuild_required,
    rebuild_view,
    register_view,
    run_view_stream,
    spec_from_dict,
    spec_to_dict,
    subtractable,
    view_report,
    write_view_batch,
)

SF = "/root/testdata/sf0.001"


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k string, v bigint")


def _rows(df):
    return sorted(tuple(r) for r in df.select(*sorted(df.columns)).collect())


def _want(spark, rows):
    return _rows(
        _mk(spark, rows)
        .groupBy("k")
        .agg(
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )


SPEC = ViewSpec(
    keys=("k",),
    aggs={"lo": ("min_ladder", "v"), "hi": ("max_ladder", "v"), "n": ("count", None)},
)


def test_ladder_stream_equals_batch(spark, tmp_path):
    """End-to-end over the real documents table: a streamed ladder view
    folds to exactly the batch groupBy min/max — including keys whose
    per-trigger distinct count exceeds ladder_j (truncation + bounds)."""
    import time

    import pyarrow.parquet as pq

    src_dir = str(tmp_path / "src")
    work_dir = str(tmp_path / "work")
    tbl = pq.read_table(os.path.join(SF, "documents.parquet")).sort_by("doc_id")
    os.makedirs(src_dir)
    now = time.time()
    for i in range(3):
        part = tbl.slice(i * tbl.num_rows // 3, (i + 1) * tbl.num_rows // 3 - i * tbl.num_rows // 3)
        p = os.path.join(src_dir, f"{i:03d}.parquet")
        pq.write_table(part, p)
        os.utime(p, (now - 100 + i, now - 100 + i))
    spec = ViewSpec(
        keys=("lang",),
        aggs={
            "first_doc": ("min_ladder", "doc_id"),
            "max_chars": ("max_ladder", "n_chars"),
            "n": ("count", None),
        },
        ladder_j=2,  # far below per-lang distinct counts: truncation is real
    )
    q = run_view_stream(spark, src_dir, work_dir, spec)
    q.awaitTermination(timeout=300)
    assert not q.isActive
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    want = _rows(
        docs.groupBy("lang").agg(
            F.min("doc_id").alias("first_doc"),
            F.max("n_chars").alias("max_chars"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    assert _rows(view_report(spark, work_dir, spec)) == want


@pytest.mark.slow
def test_ladder_takedown_subtracts_exactly(spark, tmp_path):
    """Deleting the recorded extreme promotes the runner-up from the
    ladder — the report equals the batch recount over the remaining rows
    with NO rebuild, before and after a replay rewrite and compaction."""
    work_dir = str(tmp_path / "work")
    store = os.path.join(work_dir, "view_store")
    b0, b1 = [("a", 1), ("a", 2), ("b", 5)], [("a", 3), ("a", 10), ("c", 7)]
    write_view_batch(_mk(spark, b0), 0, store, SPEC)
    write_view_batch(_mk(spark, b1), 1, store, SPEC)
    assert _rows(view_report(spark, work_dir, SPEC)) == _want(spark, b0 + b1)
    # delete a's min AND max, and ALL of b's rows
    delete_from_view(spark, work_dir, SPEC, _mk(spark, [("a", 1), ("a", 10), ("b", 5)]))
    remaining = [("a", 2), ("a", 3), ("c", 7)]
    assert _rows(view_report(spark, work_dir, SPEC)) == _want(spark, remaining)
    # replayed batch rewrites identical partials: nothing resurrects
    write_view_batch(_mk(spark, b0), 0, store, SPEC)
    assert _rows(view_report(spark, work_dir, SPEC)) == _want(spark, remaining)
    # compaction is row-preserving: ladder rows and bounds survive the fold
    assert compact_view(spark, work_dir, upto_batch=1) == 2
    assert _rows(view_report(spark, work_dir, SPEC)) == _want(spark, remaining)
    # a second takedown after compaction still subtracts exactly
    delete_from_view(spark, work_dir, SPEC, _mk(spark, [("a", 2)]))
    assert _rows(view_report(spark, work_dir, SPEC)) == _want(
        spark, [("a", 3), ("c", 7)]
    )


@pytest.mark.slow
def test_ladder_duplicate_value_counts(spark, tmp_path):
    """Counts, not presence: deleting ONE of two rows sharing the minimum
    value must keep the min (the other row still holds it)."""
    work_dir = str(tmp_path / "work")
    store = os.path.join(work_dir, "view_store")
    write_view_batch(_mk(spark, [("a", 1), ("a", 1), ("a", 4)]), 0, store, SPEC)
    delete_from_view(spark, work_dir, SPEC, _mk(spark, [("a", 1)]))
    assert _rows(view_report(spark, work_dir, SPEC)) == _want(
        spark, [("a", 1), ("a", 4)]
    )


@pytest.mark.slow
def test_ladder_exhaustion_refused_atomically(spark, tmp_path):
    """A takedown that eats past a key's recorded runner-ups refuses
    BEFORE writing anything (store unchanged, no delta dir), names
    rebuild_view; the rebuild re-arms the ladder for later takedowns."""
    spec = ViewSpec(
        keys=("k",), aggs={"lo": ("min_ladder", "v")}, ladder_j=2
    )
    work_dir = str(tmp_path / "work")
    store = os.path.join(work_dir, "view_store")
    b0 = [("a", 1), ("a", 2), ("a", 3), ("a", 4)]
    write_view_batch(_mk(spark, b0), 0, store, spec)  # ladder [1,2], bnd 2
    with pytest.raises(ValueError, match="ladder exhausted.*rebuild_view"):
        delete_from_view(spark, work_dir, spec, _mk(spark, [("a", 1), ("a", 2)]))
    assert not glob.glob(os.path.join(store, "delta-*"))  # nothing written
    assert _rows(view_report(spark, work_dir, spec)) == [("a", 1)]
    # the documented fallback: rebuild from the remaining source
    remaining = [("a", 3), ("a", 4)]
    assert rebuild_view(spark, work_dir, spec, _mk(spark, remaining)) == 0
    assert _rows(view_report(spark, work_dir, spec)) == [("a", 3)]
    # the rebuilt ladder carries fresh runner-ups: subtraction works again
    delete_from_view(spark, work_dir, spec, _mk(spark, [("a", 3)]))
    assert _rows(view_report(spark, work_dir, spec)) == [("a", 4)]


@pytest.mark.slow
def test_ladder_exhaustion_compounds_across_deltas(spark, tmp_path):
    """The pre-check simulates against PRIOR deltas too: two takedowns that
    are individually fine but jointly exhaust the ladder — the second one
    refuses."""
    spec = ViewSpec(keys=("k",), aggs={"lo": ("min_ladder", "v")}, ladder_j=2)
    work_dir = str(tmp_path / "work")
    store = os.path.join(work_dir, "view_store")
    write_view_batch(
        _mk(spark, [("a", 1), ("a", 2), ("a", 3), ("a", 4)]), 0, store, spec
    )
    delete_from_view(spark, work_dir, spec, _mk(spark, [("a", 1)]))
    assert _rows(view_report(spark, work_dir, spec)) == [("a", 2)]
    with pytest.raises(ValueError, match="ladder exhausted"):
        delete_from_view(spark, work_dir, spec, _mk(spark, [("a", 2)]))
    assert _rows(view_report(spark, work_dir, spec)) == [("a", 2)]


@pytest.mark.slow
def test_ladder_full_coverage_never_exhausts(spark, tmp_path):
    """Keys whose distinct count stayed within ladder_j have NULL bounds —
    full coverage: even deleting EVERY recorded value is exact (the key
    vanishes or its column goes all-NULL, exactly batch semantics)."""
    work_dir = str(tmp_path / "work")
    store = os.path.join(work_dir, "view_store")
    b0 = [("a", 1), ("a", 2), ("b", 5)]
    write_view_batch(_mk(spark, b0), 0, store, SPEC)  # J=4 >= 2 distinct
    delete_from_view(spark, work_dir, SPEC, _mk(spark, [("a", 1), ("a", 2)]))
    # key a lost ALL rows: it vanishes like a batch aggregate over b only
    assert _rows(view_report(spark, work_dir, SPEC)) == _want(spark, [("b", 5)])


@pytest.mark.slow
def test_ladder_null_values_and_null_keys(spark, tmp_path):
    """All-NULL columns report NULL min/max (not exhaustion); a NULL key
    is a real group end to end (the eqNullSafe join discipline)."""
    work_dir = str(tmp_path / "work")
    store = os.path.join(work_dir, "view_store")
    rows = [("a", None), ("a", None), (None, 3), (None, 9)]
    write_view_batch(_mk(spark, rows), 0, store, SPEC)
    got = {r["k"]: (r["lo"], r["hi"], r["n"]) for r in view_report(
        spark, work_dir, SPEC
    ).collect()}
    assert got == {"a": (None, None, 2), None: (3, 9, 2)}
    # takedown inside the NULL-key group: exact, no exhaustion (full cover)
    delete_from_view(spark, work_dir, SPEC, _mk(spark, [(None, 3)]))
    got = {r["k"]: (r["lo"], r["hi"], r["n"]) for r in view_report(
        spark, work_dir, SPEC
    ).collect()}
    assert got == {"a": (None, None, 2), None: (9, 9, 1)}


@pytest.mark.slow
def test_ladder_token_rerun_is_idempotent(spark, tmp_path):
    """A same-token re-run rewrites the SAME delta dir (no
    double-subtraction), and the pre-check excludes the dir being
    replaced so the retry is judged like the original."""
    work_dir = str(tmp_path / "work")
    store = os.path.join(work_dir, "view_store")
    write_view_batch(_mk(spark, [("a", 1), ("a", 2), ("a", 3)]), 0, store, SPEC)
    for _ in range(2):
        delete_from_view(
            spark, work_dir, SPEC, _mk(spark, [("a", 1)]), idempotency_token="t1"
        )
    assert len(glob.glob(os.path.join(store, "delta-*"))) == 1
    assert _rows(view_report(spark, work_dir, SPEC)) == _want(
        spark, [("a", 2), ("a", 3)]
    )


@pytest.mark.slow
def test_ladder_cascade_dispositions(spark, tmp_path):
    """Registered ladder views ride the delete_docs cascade: a
    subtractable takedown lands a delta; an exhausting one converts the
    atomic refusal into the durable rebuild-required flag."""
    work_dir = str(tmp_path / "pipe")
    spec = ViewSpec(keys=("k",), aggs={"lo": ("min_ladder", "v")}, ladder_j=2)
    assert subtractable(spec)
    vdir = register_view(work_dir, "lo_by_k", spec)
    store = os.path.join(vdir, "view_store")
    write_view_batch(
        _mk(spark, [("a", 1), ("a", 2), ("a", 3), ("a", 4)]), 0, store, spec
    )
    out = cascade_delete_to_views(
        spark, work_dir, _mk(spark, [("a", 1)]), idempotency_token="td1"
    )
    assert out["lo_by_k"].startswith("delta:")
    assert rebuild_required(vdir) is None
    out = cascade_delete_to_views(
        spark, work_dir, _mk(spark, [("a", 2)]), idempotency_token="td2"
    )
    assert out["lo_by_k"] == "rebuild_required"
    flag = rebuild_required(vdir)
    assert flag and "ladder exhausted" in flag["reason"]
    # the view still folds its committed (pre-refusal) state exactly
    assert _rows(view_report(spark, vdir, spec)) == [("a", 2)]


def test_ladder_spec_validation_and_roundtrip(spark):
    with pytest.raises(ValueError, match="ladder_j"):
        ViewSpec(keys=("k",), aggs={"lo": ("min_ladder", "v")}, ladder_j=0)
    with pytest.raises(ValueError, match="collision"):
        ViewSpec(
            keys=("k",),
            aggs={"x": ("min_ladder", "v"), "x__lad": ("sum", "v")},
        )
    spec = ViewSpec(keys=("k",), aggs={"lo": ("min_ladder", "v")}, ladder_j=7)
    assert spec_from_dict(spec_to_dict(spec)) == spec


@pytest.mark.slow
def test_ladder_composes_with_other_kinds(spark, tmp_path):
    """One spec mixing ladder, avg, and pNN kinds: every derived column
    folds correctly through a shared takedown."""
    spec = ViewSpec(
        keys=("k",),
        aggs={
            "lo": ("min_ladder", "v"),
            "m": ("avg", "v"),
            "p50": ("p50", "v"),
        },
    )
    work_dir = str(tmp_path / "work")
    store = os.path.join(work_dir, "view_store")
    write_view_batch(
        _mk(spark, [("a", 1), ("a", 2), ("a", 3), ("a", 4)]), 0, store, spec
    )
    delete_from_view(spark, work_dir, spec, _mk(spark, [("a", 1)]))
    r = view_report(spark, work_dir, spec).collect()
    assert len(r) == 1
    assert r[0]["lo"] == 2 and r[0]["m"] == 3.0 and r[0]["p50"] is not None


@pytest.mark.slow
def test_ladder_delete_heals_interrupted_rebuild_first(spark, tmp_path):
    """delete_from_view is a writing caller: it completes a crashed
    rebuild's install BEFORE simulating exhaustion, so the pre-check
    judges the store state the next reader will actually fold — a delta
    validated against stale pre-rebuild dirs could pass a check the
    rebuilt (tighter-coverage) ladder fails."""
    import shutil as _sh

    spec = ViewSpec(keys=("k",), aggs={"lo": ("min_ladder", "v")}, ladder_j=2)
    work_dir = str(tmp_path / "work")
    store = os.path.join(work_dir, "view_store")
    write_view_batch(
        _mk(spark, [("a", 1), ("a", 2), ("a", 3), ("a", 4)]), 0, store, spec
    )
    # a prior exhausting takedown forced this rebuild (rows 1 and 2 gone)
    assert rebuild_view(spark, work_dir, spec, _mk(spark, [("a", 3), ("a", 4)])) == 0
    seg = os.path.join(store, "segment=0")
    # simulate the crash window: committed rebuild present, segment aside'd
    _sh.copytree(seg, seg + ".rebuild")
    os.rename(seg, seg + ".old-deadbeef")
    assert not os.path.isdir(seg)
    # the takedown heals first, then subtracts against the REBUILT ladder
    delete_from_view(spark, work_dir, spec, _mk(spark, [("a", 3)]))
    assert os.path.exists(os.path.join(seg, "_SUCCESS"))
    assert _rows(view_report(spark, work_dir, spec)) == [("a", 4)]


def test_ladder_token_validated_before_store_read(spark, tmp_path):
    """A malformed idempotency token raises instantly — before the legacy
    scan or the exhaustion simulation touch the store."""
    work_dir = str(tmp_path / "work")
    with pytest.raises(ValueError, match="idempotency_token"):
        delete_from_view(
            spark, work_dir, SPEC, _mk(spark, [("a", 1)]),
            idempotency_token="bad/token",
        )


def test_ladder_dunder_names_refused(spark):
    """The ladder/pNN plans bind '__'-prefixed working columns — keys or
    outputs in that namespace would be clobbered mid-plan and are refused
    at spec time. Plain specs stay migration-safe: a legacy persisted view
    keyed '__shard' must keep loading (a blanket refusal would brick the
    whole work dir's takedown path via spec_from_dict)."""
    with pytest.raises(ValueError, match="collide"):
        ViewSpec(keys=("__rn",), aggs={"lo": ("min_ladder", "v")})
    with pytest.raises(ValueError, match="collide"):
        ViewSpec(keys=("k",), aggs={"__cand": ("max_ladder", "v")})
    with pytest.raises(ValueError, match="collide"):
        ViewSpec(keys=("__v",), aggs={"p": ("p50", "v")})
    spec = ViewSpec(keys=("__shard",), aggs={"s": ("sum", "v")})  # legacy OK
    assert spec_from_dict(spec_to_dict(spec)) == spec
