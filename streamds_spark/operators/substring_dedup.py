"""Exact substring deduplication (Lee et al. 2022, "Deduplicating Training
Data Makes Language Models Better") at L-token granularity.

Every duplicated substring of ≥L tokens contains a duplicated L-token
shingle, so: mark every shingle whose exact text occurs more than once in the
corpus (any doc, including within-doc repeats), merge each document's marked
positions into maximal spans, and strip those spans. Two variants:

  keep_one=False (default): the aggressive variant — ALL occurrences of a
  duplicated shingle are stripped (deterministic, order-free).

  keep_one=True: Lee et al.'s practical recipe — ONE canonical occurrence of
  each duplicated shingle survives, chosen by the deterministic global
  tie-break min(doc_id, pos), so the duplicated text still exists exactly
  once in the cleaned corpus. Canonicity is per-shingle: a canonical
  occurrence can still be stripped if an OVERLAPPING different shingle marks
  its positions (the same approximation Lee et al. accept — exactness is at
  shingle granularity, not span granularity).

Scale shape — three bounded shuffles, no suffix array, no global ordering:
  1. posexplode tokens → L-shingle at each position (arrays stay in codegen);
  2. duplicated shingles via groupBy(shingle) HAVING count>1 — at 100 TB hash
     the shingle first (xxhash64) so the exchange moves 8 bytes, not 8 tokens
     (the registry query keeps raw strings for cross-engine oracle equality);
  3. join marks back to positions (shuffle on shingle), then per-doc interval
     merge: a window PARTITIONED by doc_id (running max of span ends →
     group-start flags → cumulative group ids) — per-doc state only.
Cleaned text is rebuilt with a two-argument filter lambda over the token
array against the doc's merged spans — no UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from streamds_spark.functions.text import shingles_expr, tokens


def substring_dedup(
    docs: DataFrame,
    l_tokens: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_shingles: bool = False,
    keep_one: bool = False,
) -> DataFrame:
    """(doc_id, n_spans, n_tokens_removed, n_tokens, cleaned_text): strip
    every maximal span covered by corpus-duplicated L-token shingles.

    hash_shingles=True is the 100 TB path: the dup-mark groupBy and the
    mark-back join key on xxhash64(shingle) — the corpus-wide exchanges move
    8-byte longs instead of raw L-token strings (~10× smaller at L=8). The
    hash is computed map-side BEFORE the first exchange, so the string never
    leaves its scan task. A 64-bit collision marks one extra shingle as
    duplicated (P ≈ n²/2⁶⁴ — at 10¹² shingles expect ~27 spurious marks
    corpus-wide, each stripping one L-token span); the raw-string default
    stays for exact cross-engine oracle equality.

    keep_one=True preserves the min(doc_id, pos) occurrence of each
    duplicated shingle (module docstring): a row_number window PARTITIONED
    by shingle (ordered doc_id, pos) on the dup-occurrence relation, keeping
    rn > 1 — ONE shuffle on the shingle key the mark-back join already
    pays, no extra join (plan census: 8 exchanges, same as the aggressive
    variant). Groups are occurrence lists of one duplicated shingle, so the
    per-group sort is tiny; a boilerplate shingle duplicated 10⁶ times
    co-locates on one reducer either way (the join form shares that skew)."""
    toked = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("toks")
    )
    pos = toked.select(
        "doc_id",
        F.posexplode(shingles_expr("toks", l_tokens)).alias("pos", "shingle"),
    )
    if hash_shingles:
        pos = pos.select("doc_id", "pos", F.xxhash64("shingle").alias("shingle"))
        # Round 11 (guide §3.3/§5): the position relation feeds BOTH the
        # dup-mark groupBy and the mark-back join; their exchanges differ
        # (one aggregates first), so exchange reuse cannot dedupe them and
        # the scan→tokenize→posexplode subtree ran twice. A lazy
        # localCheckpoint pins one execution — measured on the 10×-corpus
        # watch: 5.32 s → 3.59 s interleaved within-session. Hashed rows
        # are 24 bytes each, so the materialization is ~corpus-token-count
        # × 24 B at any scale — cheap next to a second tokenize pass. The
        # raw-string branch stays plain: its checkpoint payload would be
        # the L-token shingle text (~8× corpus bytes at L=8).
        pos = pos.localCheckpoint(eager=False)
    dup = (
        pos.groupBy("shingle")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .select("shingle")
    )
    occ = pos.join(dup, "shingle")
    if keep_one:
        w_canon = Window.partitionBy("shingle").orderBy("doc_id", "pos")
        marked = (
            occ.withColumn("rn", F.row_number().over(w_canon))
            .filter(F.col("rn") > 1)
            .select("doc_id", "pos")
        )
    else:
        marked = occ.select("doc_id", "pos")

    # merge [pos, pos+L) intervals per doc: running max end over positions
    # seen so far; a position starting past it opens a new span group
    w_order = Window.partitionBy("doc_id").orderBy("pos")
    prev_max_end = F.max(F.col("pos") + l_tokens).over(
        w_order.rowsBetween(Window.unboundedPreceding, -1)
    )
    grouped = marked.withColumn(
        "new_span",
        F.when(prev_max_end.isNull() | (F.col("pos") > prev_max_end), 1).otherwise(0),
    ).withColumn(
        "grp",
        F.sum("new_span").over(w_order.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = grouped.groupBy("doc_id", "grp").agg(
        F.min("pos").alias("start"), (F.max("pos") + l_tokens).alias("end")
    )
    doc_spans = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.col("end") - F.col("start")).alias("n_tokens_removed"),
        F.sort_array(F.collect_list(F.struct("start", "end"))).alias("spans"),
    )

    joined = toked.join(doc_spans, "doc_id", "left")
    # keep token i unless some span covers it (filter's 0-based index lambda)
    kept = F.filter(
        F.col("toks"),
        lambda t, i: ~F.exists(
            F.coalesce(F.col("spans"), F.array()),
            lambda s: (i >= s["start"]) & (i < s["end"]),
        ),
    )
    return joined.select(
        "doc_id",
        F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
        F.coalesce("n_tokens_removed", F.lit(0)).cast("bigint").alias("n_tokens_removed"),
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.array_join(kept, " ").alias("cleaned_text"),
    )
