"""Two-pass exact heavy hitters: Misra-Gries candidate generation per
partition, then an exact recount of the (tiny) candidate set.

Why two passes beat one groupBy at 100 TB: a plain `groupBy(term).count()`
shuffles EVERY distinct term — for web-scale text that is a shuffle the size
of the vocabulary (billions of keys) to find a few hundred hot ones. Here
pass 1 runs a bounded-memory Misra-Gries summary inside each partition
(mapInPandas, Arrow-batched, O(k) state, no shuffle) and emits ≤k candidate
terms per partition. Pass 2 recounts ONLY rows matching the broadcast
candidate set — the shuffle carries a few hundred keys.

Correctness is exact, not approximate: MG with capacity k guarantees any item
whose partition-local frequency exceeds n_p/(k+1) survives that partition's
summary, and any item with GLOBAL count > n/(k+1) must exceed that ratio in
at least one partition (pigeonhole over Σcount_p = n_global, Σn_p = n), so
the union of partition candidates is a superset of the true heavy hitters.
The exact recount then removes false positives. Output therefore equals the
oracle's naive `HAVING count(*)*(k+1) > n` — verified by the registry query.

Misra & Gries 1982; merge-superset argument as in Agarwal et al.,
"Mergeable Summaries" (PODS'12).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _misra_gries_partition(cap: int):
    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            # Vectorized batch pre-aggregation, then one dict merge per batch.
            for term, cnt in pdf["term"].value_counts().items():
                counters[term] = counters.get(term, 0) + int(cnt)
                if len(counters) > cap:
                    # MG decrement step, batched: drop the overflow by
                    # subtracting the (cap+1)-th largest count from all.
                    vals = sorted(counters.values(), reverse=True)
                    dec = vals[cap]
                    counters = {
                        t: c - dec for t, c in counters.items() if c > dec
                    }
        yield pd.DataFrame({"term": list(counters.keys())})

    return summarize


def heavy_hitters(
    terms: DataFrame, k: int, term_col: str = "term"
) -> DataFrame:
    """Exact terms with count·(k+1) > n over a one-column DataFrame of term
    occurrences. Returns (term, cnt)."""
    t = terms.select(F.col(term_col).alias("term"))
    candidates = (
        t.mapInPandas(_misra_gries_partition(k), "term string").distinct()
    )
    counted = (
        t.join(F.broadcast(candidates), "term", "left_semi")
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )
    total = t.agg(F.count("*").alias("n_total"))
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * (k + 1) > F.col("n_total"))
        .select("term", "cnt")
    )


# ---------------------------------------------------------------------------
# Mergeable Misra-Gries summaries (round 9): the per-trigger STORE form
# ---------------------------------------------------------------------------

MG_STORE_CAP = 512  # per-batch summary capacity (<= cap+1 rows per trigger)


def mg_summary(terms: DataFrame, cap: int = MG_STORE_CAP) -> DataFrame:
    """One DETERMINISTIC Misra-Gries summary of a bounded term batch:
    exact within-batch counts, then the single batched MG decrement — drop
    the (cap+1)-th largest count d from every counter, keep the positive
    remainder (<= cap rows; Misra & Gries 1982 with full pre-aggregation).

    Output schema (term string, cnt bigint, d bigint):
      * data rows     (term, cnt - d, 0)
      * sentinel row  (NULL, n_batch, d)  — the batch's total occurrences
        and its decrement, which make the STORE self-describing: any union
        of summaries still knows its exact error budget (sum of sentinel
        d's) and population (sum of sentinel cnt's), and survives the
        generic segment fold untouched.

    Guarantees (Agarwal et al., "Mergeable Summaries", PODS'12): every
    estimate UNDERCOUNTS by at most d <= n_batch/(cap+1); summing summaries
    adds the d's, so after any fold  est(t) <= true(t) <= est(t) + sum(d),
    and every term with true(t) > sum(d) is present. Determinism (count
    then trim, no row-order dependence) is what makes a replayed trigger
    rewrite a byte-identical summary and the whole store oracle-checkable.

    Driver cost: one (cap+1)-row TakeOrdered to learn d — constant at any
    batch size. The batch's distinct-term shuffle is bounded by the
    TRIGGER, not the corpus (the one-shot `heavy_hitters` operator remains
    the zero-vocab-shuffle path for whole-corpus batch jobs)."""
    spark = terms.sparkSession
    counts = (
        terms.select(F.col(terms.columns[0]).alias("term"))
        # NULL terms are not countable items, and a (NULL, cnt) data row
        # would be misread downstream as a SENTINEL (mg_fold dispatches on
        # term IS NULL), double-counting n_total and dropping the estimate
        .filter(F.col("term").isNotNull())
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    ).localCheckpoint(eager=True)  # feeds TakeOrdered + total + filter once
    top = counts.orderBy(F.desc("cnt"), "term").take(cap + 1)
    d = int(top[cap]["cnt"]) if len(top) == cap + 1 else 0
    n_batch = counts.agg(F.sum("cnt")).first()[0] or 0
    data = counts.filter(F.col("cnt") > d).select(
        "term",
        (F.col("cnt") - F.lit(d)).cast("bigint").alias("cnt"),
        F.lit(0).cast("bigint").alias("d"),
    )
    sentinel = spark.createDataFrame(
        [(None, int(n_batch), d)], "term string, cnt bigint, d bigint"
    )
    return data.unionByName(sentinel)


def mg_fold(summaries: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Fold a union of mg_summary outputs (any number of batches, folded or
    not — sentinel rows survive segment folds). Returns
    (estimates DataFrame[term, est], stats DataFrame[n_total, error_bound])
    where for every term  est <= true <= est + error_bound."""
    data = summaries.filter(F.col("term").isNotNull())
    est = data.groupBy("term").agg(F.sum("cnt").cast("bigint").alias("est"))
    stats = summaries.filter(F.col("term").isNull()).agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("n_total"),
        F.coalesce(F.sum("d"), F.lit(0)).cast("bigint").alias("error_bound"),
    )
    return est, stats
