"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is executed to completion (count() materializes the whole plan; the
driver-side result is never collected). Timing is min-of-3 wall-clock per
query after session warm-up — the first pass pays one-time JIT/codegen
compilation that a long-lived session amortizes away (the cold first-pass
total is reported in extras). Run order is fixed for comparability across
rounds.

Extras protocol (round 8, per VERDICT r7): extras are min-of-3 like the
headline (the r7 single-shot numbers carried load spikes the headline's min
smoothed away), and NEW extras are APPENDED at the END of the run sequence —
never inserted mid-sequence. Harness position changes the number (bench.py's
long session accumulates JVM/GC state; BASELINE.md round-6/7 notes), so an
insertion manufactures phantom drift in every extra behind it: r7 inserted
the HDR tracker before cluster_quality_metrics and manufactured a +153%
outlier that an idle-box recheck settled at the r6 value. Extras-to-extras
comparisons are only valid at the same position.

Idle-box protocol (round 5, per VERDICT r4): two rounds of one-directional
drift on the shuffle-heavy queries traced to background load on a shared box,
not plan changes. Before the session/warm-up burst (so the harness's own load
is never mistaken for background load), the harness polls /proc/loadavg and
waits (up to IDLE_MAX_WAIT_S) for the 1-minute load to drop under
IDLE_LOAD_GATE; the observed pre-existing load and any wait spent are
recorded in extras so a number taken on a busy box is visibly flagged rather
than silently noisy. Guest loadavg cannot see HOST-level contention in a VM;
cross-run disagreement at recorded-low load is that signature (BASELINE.md
round-5 notes).

Retry-on-load protocol (round 9, per VERDICT r8): the idle gate now ALSO runs
after warm-up (closing the load-arrives-during-warm-up hole that made
BENCH_r08's official headline a load1=5.05 sample), and if a headline pass
still starts over the gate, the harness waits out a fresh budget and re-runs
the whole min-of-3 pass (max 2 retries). Every pass is recorded in
extras.headline_passes with its start load; the official headline is the pass
with the LOWEST load at timing start, and busy_box_budget_exhausted flags a
run whose official pass never got a clean start.

Lowest-total protocol (round 10, per VERDICT r9): the r9 gate (4.0) admitted a
load1=3.32 sample as the single official pass — the second straight round the
official series carried an environment artifact a quiet-box recheck disowned
(10.163 s official vs 6.11-6.8 s quiet). Two changes: (1) the harness ALWAYS
runs at least two headline passes and the OFFICIAL pass is the one with the
lowest TOTAL — guest load1 cannot see host-level contention in a VM, but the
totals can, and min-over-passes is exactly the min-of-3 logic one level up;
(2) the retry threshold for earning a THIRD pass drops to RETRY_LOAD_GATE=1.5
(a genuinely quiet box on this 32-cpu host idles well under 1), applied when
both completed passes started above it. busy_box_budget_exhausted now means
"no pass ever started under 1.5". Extras are each stamped with their own
load1 at measurement start (extras.extras_load1) so extras-to-extras
round comparisons carry their own evidence instead of inheriting the
headline's.

Extras-retry protocol (round 11, per VERDICT r10): the r10 stamps made
loaded extras VISIBLE but still not comparable — the concurrency extra's own
burst inflated the stamps (and possibly the numbers) of everything measured
behind it (r10 driver run: bloom_decontaminate stamped at load 4.88). Now,
after the full extras sequence completes in its frozen order, any extra whose
stamp exceeded EXTRA_RETRY_GATE (2.5) is re-measured ONCE at the tail after
waiting out an idle budget at that gate; the LOWER min-of-3 is kept per key
(the same steady-state argument as the headline's lowest-total passes), the
stamp is replaced by the retry's, and extras.extras_retried records both
stamps and both values so the substitution is auditable. The original
positional sequence is untouched — retries happen strictly after it — so
position-based round-over-round reads stay valid for clean extras.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from streamds_spark.registry import load_all
from streamds_spark.session import get_spark

HEADLINE = [
    # reference-parity core
    "flagship_filter_group_count",
    "grep_count",
    "wordcount",
    "group_count_users",
    # analytic surface
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "window_rank_orders",
    "agg_stats_lineitem",
    # LLM-data ops
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash",
    "ann_bruteforce_topk",
    "text_quality_score",
]


IDLE_LOAD_GATE = 4.0  # 1-min load below this ≈ quiet on a 32-cpu box
RETRY_LOAD_GATE = 1.5  # a pass starting above this earns a third attempt
MIN_PASSES = 2  # always at least two headline passes; official = lowest total
MAX_PASSES = 3
IDLE_MAX_WAIT_S = 120.0
INTER_PASS_WAIT_S = 240.0  # covers the harness's own load1 decay to 1.5
EXTRA_RETRY_GATE = 2.5  # an extra stamped above this gets one tail re-measure
EXTRA_RETRY_WAIT_S = 240.0  # idle budget before each tail re-measure
# SHARED wait ceiling across ALL tail retries: a genuinely busy box could
# otherwise park the harness for n_extras x 240 s of waiting. Once spent,
# remaining retries still run (min-keep makes a loaded retry harmless —
# it just can't improve the number) with their honest loaded stamps.
EXTRA_RETRY_TOTAL_WAIT_S = 900.0


def _load1() -> float:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except (OSError, ValueError, IndexError):
        return -1.0  # unknown platform — skip the gate, report -1


def _wait_for_idle(
    budget_s: float = IDLE_MAX_WAIT_S, gate: float = IDLE_LOAD_GATE
) -> "tuple[float, float]":
    """Block until the box looks idle (or the wait budget runs out).
    Returns (load1 at timing start, seconds spent waiting)."""
    waited = 0.0
    load = _load1()
    while load >= gate and waited < budget_s:
        time.sleep(5.0)
        waited += 5.0
        load = _load1()
    return load, waited


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    specs = load_all()
    # Gate on an idle box BEFORE the warm-up burst: polling after warm-up
    # would measure the harness's own just-generated load (1-min loadavg
    # decays slowly), misattributing self-load to background activity — the
    # exact confusion the gate exists to resolve. What we record here is the
    # pre-existing background load the timings are exposed to.
    load_at_start, idle_wait_s = _wait_for_idle()
    spark = get_spark("bench")
    # Warm up the JVM, codegen, and the parquet read path (footer parsing,
    # filesystem) so the first timed query doesn't absorb session startup.
    spark.range(1).count()
    from streamds_spark.catalog import load_table

    # Read every table's parquet bytes once: the OS page cache is cold for the
    # first process touching the data after boot, and that one-time IO belongs
    # to the environment, not to whichever headline query runs first.
    import glob as _glob

    for path in _glob.glob(os.path.join(sf_dir, "*.parquet")):
        with open(path, "rb") as f:
            while f.read(1 << 24):
                pass
    load_table(spark, sf_dir, "region").count()
    load_table(spark, sf_dir, "orders").limit(10).count()
    # two non-headline registry queries warm codegen + AQE machinery
    specs["distinct_values"].fn(spark, sf_dir).count()
    specs["topk_parts"].fn(spark, sf_dir).count()

    # Post-warm-up idle gate (round 9, per VERDICT r8): the pre-warm-up gate
    # alone left a hole — load arriving DURING the multi-minute warm-up
    # contaminated the single timed pass un-retried (BENCH_r08's official
    # 8.071 s was taken at load1 5.05 and misread as a +39% regression that
    # quiet-box reruns settled at ~6.5 s). Waiting here also lets our OWN
    # warm-up load decay (load1 halves in ~42 s of sleep), so a clean start
    # here genuinely means a clean box, not just a gap in our bursts.
    load_at_timing, post_warmup_wait_s = _wait_for_idle()

    def _headline_pass() -> "tuple[dict[str, float], float]":
        """One full min-of-3 headline pass; returns (timings, cold_total).

        Each query runs three times and the MIN is reported: the first pass
        still pays per-plan JIT/codegen compilation (measured 2x total
        inflation on a cold JVM), which a long-lived cluster session never
        re-pays — min-of-3 is the steady-state per-query cost the 100 TB
        posture cares about and smooths per-query scheduler/GC variance on a
        shared box. The cold first-pass total is recorded in extras."""
        t: dict[str, float] = {}
        cold = 0.0
        for name in HEADLINE:
            spec = specs[name]
            runs = []
            for _ in range(3):
                t0 = time.time()
                spec.fn(spark, sf_dir).count()
                runs.append(time.time() - t0)
            cold += runs[0]
            t[name] = round(min(runs), 3)
        return t, cold

    # Lowest-total passes (round 10): ALWAYS at least MIN_PASSES full min-of-3
    # headline passes; the OFFICIAL headline is the pass with the lowest
    # TOTAL. Guest load1 cannot see host-level contention in a VM (the r8 and
    # r9 official headlines were both environment samples that passed the
    # load gate), but a contended pass's total is visibly inflated — taking
    # the min over passes is the same steady-state argument as min-of-3 one
    # level up. A THIRD pass runs only when both completed passes started
    # above RETRY_LOAD_GATE (the box never looked quiet), after waiting out a
    # fresh idle budget at the tighter gate.
    headline_passes = []
    retry_wait_s = 0.0
    pass_load = load_at_timing
    for attempt in range(MAX_PASSES):
        t_pass, cold_pass = _headline_pass()
        headline_passes.append(
            {
                "load1_at_start": pass_load,
                "total": round(sum(t_pass.values()), 3),
                "queries": t_pass,
                "cold_total": round(cold_pass, 3),
            }
        )
        done_min = len(headline_passes) >= MIN_PASSES
        # load1 of -1.0 means "unknown platform, gate skipped" — treat as
        # quiet so the third pass never triggers on missing telemetry.
        any_quiet = any(
            p["load1_at_start"] < RETRY_LOAD_GATE for p in headline_passes
        )
        if attempt + 1 >= MAX_PASSES or (done_min and any_quiet):
            break
        # Between passes, ALWAYS wait out the harness's own just-generated
        # load at the tight gate before stamping the next pass: a raw
        # _load1() here reads the previous pass's 32-core burst, not
        # background contention — it would stamp pass 2 "loaded" on a quiet
        # box, force a pointless third pass, and raise false
        # busy_box_budget_exhausted flags. The wait also hands the next pass
        # a genuinely quiet start whenever the box allows one. Budget sized
        # to the decay physics: a pass can drive load1 to ~32, and reaching
        # 1.5 needs log2(32/1.5) ~ 4.4 halvings at ~42 s each (~185 s) — the
        # default 120 s budget would time out on a QUIET box and stamp the
        # harness's own residue as contention.
        pass_load, w = _wait_for_idle(
            budget_s=INTER_PASS_WAIT_S, gate=RETRY_LOAD_GATE
        )
        retry_wait_s += w

    budget_exhausted = not any(
        p["load1_at_start"] < RETRY_LOAD_GATE for p in headline_passes
    )
    official = min(headline_passes, key=lambda p: p["total"])
    timings = official["queries"]
    # Scaling-contract evidence (round 12, per VERDICT r11 item 3): the
    # EFFECTIVE core count the session actually runs with, straight from the
    # scheduler — proof the bench honors $SPARK_GRAFT_CPUS rather than a
    # hard-coded master (the r11 driver raised a false suspect_cpus_ignored
    # because no sf0.1 headline query is big enough for cores to move it).
    cpus_effective = spark.sparkContext.defaultParallelism
    # cold total ALWAYS comes from the first pass: a retry pass runs on a
    # JIT-warm JVM, so its first runs no longer measure the documented
    # cold per-plan codegen cost — taking it from the official (possibly
    # retried) pass would silently shift the cold-vs-steady series
    cold_total = headline_passes[0]["cold_total"]
    load_at_timing = official["load1_at_start"]
    total = official["total"]

    # Output-ordering hardening (round 12, per VERDICT r11 items 6/9): the
    # r10 bench's ONE JSON line printed only after the multi-minute extras
    # sequence, so a truncated/killed run left NOTHING parseable and the
    # r11 driver's round-over-round table came up empty. Print the headline
    # contract line IMMEDIATELY after the official pass is chosen; the FULL
    # line (same headline numbers + the extras) still prints LAST, so a
    # parser taking either the first or the last JSON line reads identical
    # headline values and a run cut off mid-extras still yields the
    # headline. Queries/value/sf are identical in both lines by
    # construction — the early line is a prefix snapshot, not a second
    # measurement.
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "cpus": cpus_effective,
                "extras_follow": True,
            }
        ),
        flush=True,
    )

    # Per-extra load stamps (round 10, per VERDICT r9): every extra records
    # load1 at its own measurement start so extras-to-extras round
    # comparisons carry their own environment evidence — the r9 extras were
    # all loaded-box samples invisible behind the headline's single stamp.
    # Reading discipline: extras run back-to-back, so every stamp carries
    # the harness's OWN decaying load from the preceding extras — the
    # stamps are comparable ROUND-OVER-ROUND at the same position (same
    # self-load history); an OUTLIER stamp vs last round's same position is
    # the external-load signal, the absolute value is not.
    extras_load1: dict[str, float] = {}
    # measured extras, in run order (insertion order IS the frozen sequence);
    # and the measure registry the tail retry pass re-invokes
    extras_vals: dict[str, float] = {}
    extra_measures: "list[tuple[str, object]]" = []

    def _run_extra(name: str, measure) -> None:
        """Stamp load1, run one measure (returns {key: seconds}), register
        it for a possible tail retry (extras-retry protocol, round 11)."""
        extras_load1[name] = _load1()
        extras_vals.update(measure())
        extra_measures.append((name, measure))

    def _min3_measure(name: str, action):
        def measure() -> "dict[str, float]":
            runs = []
            for _ in range(3):
                t0 = time.time()
                action()
                runs.append(time.time() - t0)
            return {name: round(min(runs), 3)}

        return measure

    def _min3(name: str, action) -> None:
        """Min-of-3 wall for an extra — same steady-state protocol as the
        headline; three consecutive runs keep every extra's harness position
        stable relative to its neighbors. Stamps load1 at start."""
        _run_extra(name, _min3_measure(name, action))

    # Scaling watch (NOT in the headline total, so round-over-round totals stay
    # comparable): the LSH candidate join on a 10×-unioned documents table.
    # Every doc gains 10 exact clones → dense buckets; tracks the join's
    # scaling constant and exercises the mega-bucket star cap.
    from pyspark.sql import functions as F

    from streamds_spark.operators.dedup_pipeline import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_ids = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    scaled = docs
    for i in range(1, 10):
        scaled = scaled.unionByName(
            docs.select((F.col("doc_id") + i * n_ids).alias("doc_id"), "text")
        )
    _min3("dedup_lsh_pairs_docs10x", lambda: lsh_candidate_pairs(minhash_signatures(scaled)).count())

    # Incremental-dedup scaling watch: probe a NEW batch (the base documents
    # table) against a PERSISTED 10× corpus bucket store. Store build is the
    # amortized-once cost (reported separately); the probe is the steady-state
    # ingest cost — broadcast new-batch buckets, shuffle-free store scan.
    import shutil
    import tempfile

    from streamds_spark.operators.dedup_incremental import (
        incremental_candidates,
        write_bucket_store,
    )

    def _measure_incremental() -> "dict[str, float]":
        build_runs, probe_runs = [], []
        for _ in range(3):
            store_dir = tempfile.mkdtemp(prefix="dedup_store_")
            try:
                t0 = time.time()
                write_bucket_store(scaled, store_dir)
                build_runs.append(time.time() - t0)
                t0 = time.time()
                incremental_candidates(docs, spark, store_dir).count()
                probe_runs.append(time.time() - t0)
            finally:
                shutil.rmtree(store_dir, ignore_errors=True)
        return {
            "dedup_incremental_docs10x": round(min(probe_runs), 3),
            "dedup_incremental_store_build_docs10x": round(min(build_runs), 3),
        }

    _run_extra("dedup_incremental_docs10x", _measure_incremental)

    # Substring-dedup scaling watch (outside the headline total): the hashed-
    # shingle path on the 10× corpus — the dup-mark groupBy and mark-back join
    # exchange 8-byte xxhash64 keys instead of raw 8-token strings. Forced
    # through an aggregate so the span-merge + rebuild actually run.
    from streamds_spark.operators.substring_dedup import substring_dedup

    _min3(
        "substring_dedup_hashed_docs10x",
        lambda: substring_dedup(scaled, 8, hash_shingles=True)
        .agg(F.sum("n_tokens_removed"), F.sum("n_spans"))
        .collect()
    )

    # Bloom decontamination (outside the headline total): benchmark = first
    # 5% of docs' shingles, corpus = the rest; two-phase bloom-prune + exact
    # verify. Tracks the map-only probe's cost against corpus growth.
    from streamds_spark.functions.text import shingles_expr, tokens
    from streamds_spark.operators.bloom import bloom_decontaminate

    sh = docs.select("doc_id", tokens(F.col("text")).alias("toks")).select(
        "doc_id", F.explode(shingles_expr("toks", 3)).alias("shingle")
    )
    cut = int(n_ids * 0.05)
    bench_sh = sh.filter(F.col("doc_id") < cut).select("shingle").distinct()
    corpus_sh = sh.filter(F.col("doc_id") >= cut)
    _min3("bloom_decontaminate", lambda: bloom_decontaminate(corpus_sh, bench_sh).count())

    # Corpus-health trackers (also outside the headline total): the KL agg
    # forces the full tokenize+aggregate pipeline; the redaction scan is
    # forced through an aggregate because count() alone would let Spark skip
    # the regexp projection entirely.
    _min3("source_unigram_kl", lambda: specs["source_unigram_kl"].fn(spark, sf_dir).count())
    _min3(
        "pii_redaction_forced",
        lambda: specs["pii_redaction"]
        .fn(spark, sf_dir)
        .agg(F.max("redacted_fp"), F.sum("n_emails"))
        .collect()
    )

    # Gopher rule-set pass (round-4 addition, outside the headline total so
    # round-over-round totals stay comparable): a single map-only projection
    # (array_sort + adjacent-equal folds, zero exchanges) — the cost is
    # interpreted higher-order-function evaluation per doc, parallelized by
    # input splits, not a shuffle.
    _min3(
        "gopher_quality_flags_forced",
        lambda: specs["gopher_quality_flags"]
        .fn(spark, sf_dir)
        .agg(F.sum(F.col("gopher_keep").cast("int")), F.sum("n_words"))
        .collect()
    )

    # Round-5 operator trackers (outside the headline total): the KN
    # perplexity train+score pipeline, the CDC chunk-sharing profile, and the
    # gear-hash chunker (its mapInPandas throughput vs the built-ins variant
    # above it is the per-round watch).
    from streamds_spark.operators.cdc import cdc_chunks_gear

    _min3("kn_perplexity_filter", lambda: specs["kn_perplexity_filter"].fn(spark, sf_dir).count())
    _min3("cdc_chunk_sharing", lambda: specs["cdc_chunk_sharing"].fn(spark, sf_dir).count())

    # Round-6 operator trackers: the 5-gram KN filter (the production-order
    # CCNet dial, generic order-n construction) and SemDeDup.
    _min3("kn5_perplexity_filter", lambda: specs["kn5_perplexity_filter"].fn(spark, sf_dir).count())
    _min3("semantic_dedup_keep", lambda: specs["semantic_dedup_keep"].fn(spark, sf_dir).count())
    _min3(
        "cdc_chunks_gear",
        # spread=True (round 11): the gear chunker is mapInPandas — on a
        # single-split scan ONE Python worker chunked the whole corpus;
        # spreading gives it a worker per core. Chunking is doc-local, so
        # the count is identical under any partitioning.
        lambda: cdc_chunks_gear(
            load_table(spark, sf_dir, "documents", spread=True)
        ).count()
    )

    # Late-round-6 trackers: the register-table HLL distinct (map-only hash
    # pass + 256-group agg + the exact-count audit side), the clustering-
    # quality report (exploded-vector centroid pass + k-sized tail), and the
    # vocab-sizing coverage curve (distributed exact rank over term counts).
    _min3("hll_distinct_parts", lambda: specs["hll_distinct_parts"].fn(spark, sf_dir).count())
    _min3(
        "cluster_quality_metrics",
        lambda: specs["cluster_quality_metrics"].fn(spark, sf_dir).count()
    )
    _min3("token_coverage_curve", lambda: specs["token_coverage_curve"].fn(spark, sf_dir).count())

    # Round-7 trackers, APPENDED here per the extras ordering policy (the HDR
    # tracker's r7 insertion before cluster_quality_metrics is what the
    # policy exists to prevent): the grouped log-linear quantile sketch
    # (registers + per-group extraction — the mergeable-quantile path's
    # steady-state cost), then the skew-rule-applied join (decision overhead
    # — dim count + one count-partials shuffle — INCLUDED, then the salted
    # join it picks on the hot source keys).
    _min3(
        "hdr_value_quantiles_by_type",
        lambda: specs["hdr_value_quantiles_by_type"].fn(spark, sf_dir).count()
    )
    _min3(
        "skew_aware_join_sources",
        lambda: specs["skew_aware_join_sources"].fn(spark, sf_dir).count()
    )

    # Round-6 multi-tenant tracker (outside the headline total): three
    # headline queries run SIMULTANEOUSLY from three threads under FAIR
    # scheduler pools on the one session. Wall clock vs the serial sum of
    # their individual min-of-3 times gauges how well concurrent tenants
    # overlap (1.0× = perfect overlap-free sharing is impossible; anything
    # well under the serial sum means the scheduler interleaves stages).
    import threading

    from streamds_spark.session import scheduler_pool

    conc_queries = ["q1_pricing_summary", "q5_local_supplier_volume", "dedup_exact"]

    def _run_pooled(nm: str) -> None:
        with scheduler_pool(spark, f"bench-{nm}"):
            specs[nm].fn(spark, sf_dir).count()

    def _measure_concurrent() -> "dict[str, float]":
        t0 = time.time()
        conc_threads = [
            threading.Thread(target=_run_pooled, args=(nm,))
            for nm in conc_queries
        ]
        for th in conc_threads:
            th.start()
        for th in conc_threads:
            th.join()
        return {"concurrent_3way_wall": round(time.time() - t0, 3)}

    _run_extra("concurrent_3way_wall", _measure_concurrent)
    # derived from the official headline timings — not a measurement, so it
    # sits outside the retry registry
    extras_vals["concurrent_3way_serial_sum"] = round(
        sum(timings[nm] for nm in conc_queries), 3
    )

    # Round-8 trackers, appended at the END per the extras ordering policy:
    # the signed-mirror quantile sketch (same register shapes as the
    # unsigned tracker above) and the mergeable bottom-k sample's
    # fold==whole audit (per-source samples + two TakeOrdereds + a k-row
    # outer join — the sampling-state maintenance cost).
    _min3(
        "hdr_signed_delta_quantiles",
        lambda: specs["hdr_signed_delta_quantiles"].fn(spark, sf_dir).count()
    )
    _min3(
        "bottomk_merge_audit_sources",
        lambda: specs["bottomk_merge_audit_sources"].fn(spark, sf_dir).count()
    )

    # Round-9 trackers, appended at the END per the extras ordering policy:
    # the mergeability audits of the two new streaming stores (ES-key
    # weighted sample fold==whole; Misra-Gries fold containment + bound).
    _min3(
        "weighted_sample_merge_audit_sources",
        lambda: specs["weighted_sample_merge_audit_sources"].fn(spark, sf_dir).count()
    )
    _min3(
        "mg_fold_containment_docs",
        lambda: specs["mg_fold_containment_docs"].fn(spark, sf_dir).count()
    )

    # Round-9 continuation trackers (appended after the above, same policy):
    # the compiled single-scan constraint suite (quality-gate steady cost)
    # and the AMS F2 audit (one-scan counters + fold + the exact twin).
    _min3(
        "constraint_suite_orders",
        lambda: specs["constraint_suite_orders"].fn(spark, sf_dir).count()
    )
    _min3("ams_f2_users_audit", lambda: specs["ams_f2_users_audit"].fn(spark, sf_dir).count())

    # Round-12 scaling-watch extra, appended at the END per the extras
    # ordering policy (per VERDICT r11 item 3): every sf0.1 extra above is a
    # 0.3-3 s warm run dominated by fixed per-query overhead, so the 8-cpu
    # companion bench shows core ratios ≈ 1 and the scaling contract is
    # unobservable. This one is the full Gopher rule set over the 10× corpus
    # on a SPREAD scan — pure doc-local interpreted-HOF compute, zero
    # shuffles, embarrassingly parallel — sized so the 8-vs-32-core ratio is
    # a genuine parallelism measurement (the per-doc work is identical at
    # any core count; only the task spread changes).
    from streamds_spark.queries.llmdata.webfilter import gopher_flags_df

    docs_spread = load_table(spark, sf_dir, "documents", spread=True).select(
        "doc_id", "text"
    )
    scaled_spread = docs_spread
    for i in range(1, 10):
        scaled_spread = scaled_spread.unionByName(
            docs_spread.select(
                (F.col("doc_id") + i * n_ids).alias("doc_id"), "text"
            )
        )
    _min3(
        "gopher_quality_flags_docs10x",
        lambda: gopher_flags_df(scaled_spread)
        .agg(F.sum(F.col("gopher_keep").cast("int")), F.sum("n_words"))
        .collect(),
    )

    # Extras-retry pass (round 11): the frozen sequence is complete — now
    # give every LOADED extra (stamp > EXTRA_RETRY_GATE) one clean tail
    # re-measure. Wait out the idle budget at the tight gate first (the
    # previous extra's burst is the usual contaminant — including the
    # 3-way concurrency extra, whose own 3-thread burst inflates every
    # stamp behind it), keep the LOWER value per key, adopt the retry's
    # stamp, and record both sides so the substitution is auditable.
    extras_retried: "dict[str, dict]" = {}
    retry_wait_left = EXTRA_RETRY_TOTAL_WAIT_S
    for name, measure in extra_measures:
        stamp = extras_load1.get(name, -1.0)
        if stamp <= EXTRA_RETRY_GATE:
            continue
        retry_load, w = _wait_for_idle(
            budget_s=min(EXTRA_RETRY_WAIT_S, retry_wait_left),
            gate=EXTRA_RETRY_GATE,
        )
        retry_wait_left = max(0.0, retry_wait_left - w)
        new_vals = measure()
        kept: "dict[str, dict[str, float]]" = {}
        retry_won_all = True
        for key, retry_v in new_vals.items():
            orig_v = extras_vals[key]
            extras_vals[key] = min(orig_v, retry_v)
            retry_won_all = retry_won_all and retry_v <= orig_v
            kept[key] = {"original": orig_v, "retry": retry_v}
        extras_retried[name] = {
            "load1_original": stamp,
            "load1_retry": retry_load,
            "values": kept,
        }
        # the published stamp must describe the conditions of the KEPT
        # number: adopt the retry's stamp only when the retry's values won
        # everywhere — a retry that lost (kept = the loaded original) must
        # not relabel that loaded measurement as near-idle
        if retry_won_all:
            extras_load1[name] = retry_load

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "cpus": cpus_effective,
                "extras": {
                    **extras_vals,
                    "headline_first_pass_total": round(cold_total, 3),
                    "load1_pre_warmup": load_at_start,
                    "load1_at_timing_start": load_at_timing,
                    "idle_wait_s": idle_wait_s,
                    "post_warmup_idle_wait_s": post_warmup_wait_s,
                    "headline_retry_wait_s": retry_wait_s,
                    "headline_passes": headline_passes,
                    "busy_box_budget_exhausted": budget_exhausted,
                    "extras_load1": extras_load1,
                    "extras_retried": extras_retried,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
