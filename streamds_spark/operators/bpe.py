"""Distributed BPE (byte-pair encoding) merge training — the tokenizer-
construction step of an LLM data pipeline (Sennrich et al. 2016 §3.2).

The classic trick makes this tractable at corpus scale: iterate over the
DISTINCT-WORD table weighted by word frequency, never over the corpus. One
pass builds (word, count, symbol-list); each merge round is then

    explode adjacent symbol pairs weighted by count
      -> partial-agg sum per pair (one shuffle of the vocab, not the corpus)
      -> global argmax (deterministic tie-break: count desc, pair asc)
      -> rewrite symbol lists with a left-to-right greedy fold (codegen
         `aggregate` lambda — no Python in the loop)

Driver state per round is ONE row (the winning pair). The vocab DataFrame is
localCheckpoint'ed every few rounds to truncate the growing lineage — the
standard iterative-algorithm discipline (same as operators/kmeans.py,
operators/pagerank.py).

Scale posture: vocab size is sublinear in corpus size (Heaps' law), and every
step is a hash shuffle of the vocab keyed by pair — no driver collect of
anything but the argmax row, no quadratic joins. A 100 TB corpus with a 100M
word vocab runs each round as a normal ~GB-scale aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streamds_spark.functions.text import tokens

_CHECKPOINT_EVERY = 4


def word_symbol_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt, syms) — distinct words with corpus frequency, split into
    single-character symbol lists. The end-of-word marker '</w>' is appended
    as its own symbol so merges can distinguish suffixes from interiors."""
    words = docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
    vocab = words.groupBy("word").agg(F.count("*").alias("cnt"))
    syms = F.expr(
        "concat(transform(sequence(1, length(word)), i -> substring(word, i, 1)),"
        " array('</w>'))"
    )
    return vocab.select("word", "cnt", syms.alias("syms"))


def pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-symbol pair frequencies weighted by word count. Pairs are kept
    as a 2-element struct (a, b) — no string joining, so symbols containing
    any delimiter stay unambiguous."""
    pairs = F.expr(
        "transform(sequence(1, size(syms) - 1),"
        " i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))"
    )
    return (
        vocab.filter(F.size("syms") >= 2)
        .select(F.col("cnt"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("pair_cnt"))
    )


def _sql_quote(s: str) -> str:
    return s.replace("\\", "\\\\").replace("'", "\\'")


def apply_merge(vocab: DataFrame, a: str, b: str) -> DataFrame:
    """Rewrite every symbol list replacing adjacent (a, b) with a+b, greedy
    left-to-right (matches the reference algorithm's non-overlapping re.sub).
    Pure codegen fold — no UDF."""
    qa, qb, qm = _sql_quote(a), _sql_quote(b), _sql_quote(a + b)
    fold = F.expr(
        "aggregate(syms, CAST(array() AS array<string>), (acc, s) -> "
        f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{qa}' AND s = '{qb}' "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array('{qm}')) "
        "ELSE concat(acc, array(s)) END)"
    )
    return vocab.select("word", "cnt", fold.alias("syms"))


def apply_bpe(
    docs: DataFrame,
    merges: "list[tuple[str, str]] | list[list[str]]",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pieces): segment documents with an ALREADY-TRAINED ordered
    merge list — the inference half of the BPE story (train_bpe is the
    learning half; the CLI's `tokenize` verb dispatches here for BPE
    models). Unseen words segment fine: BPE applies merges to a fresh
    character symbolization, no training vocab needed.

    Scale shape mirrors training: the merge folds run over the DISTINCT-WORD
    table (Heaps-law-sized), localCheckpoint'ed every few merges to bound
    lineage; the corpus pass is one posexplode + a word-keyed join + per-doc
    regroup (sort by position, flatten) — no Python anywhere."""
    vocab = word_symbol_table(docs, text_col).localCheckpoint()
    for i, m in enumerate(merges):
        a, b = m[0], m[1]
        vocab = apply_merge(vocab, a, b)
        if (i + 1) % _CHECKPOINT_EVERY == 0:
            vocab = vocab.localCheckpoint()
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "word"),
    )
    regroup = F.flatten(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "syms"))),
            lambda s: s["syms"],
        )
    )
    grouped = (
        tok.join(vocab.select("word", "syms"), "word")
        .groupBy("doc_id")
        .agg(regroup.alias("pieces"))
    )
    # empty/whitespace-only docs have no token rows and would vanish in the
    # join+groupBy — keep them with pieces=[] (parity with the unigram
    # tokenizer, which emits every input doc)
    base = docs.select(F.col(id_col).alias("doc_id"))
    return base.join(grouped, "doc_id", "left").select(
        "doc_id",
        F.coalesce("pieces", F.array().cast("array<string>")).alias("pieces"),
    )


def train_bpe(docs: DataFrame, n_merges: int, text_col: str = "text"):
    """Learn `n_merges` BPE merges. Returns (merges, vocab): the ordered merge
    list [(a, b, pair_count), ...] and the final symbolized vocab DataFrame.
    Stops early when no pair repeats (all symbol lists fully merged)."""
    vocab = word_symbol_table(docs, text_col).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for i in range(n_merges):
        top = (
            pair_counts(vocab)
            .orderBy(F.desc("pair_cnt"), F.asc("a"), F.asc("b"))
            .take(1)
        )
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], top[0]["pair_cnt"]
        merges.append((a, b, cnt))
        vocab = apply_merge(vocab, a, b)
        if (i + 1) % _CHECKPOINT_EVERY == 0:
            vocab = vocab.localCheckpoint()
    return merges, vocab
