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
