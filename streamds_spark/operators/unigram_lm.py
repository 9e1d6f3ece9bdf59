"""Unigram-LM subword tokenizer (SentencePiece-style) trained by distributed
EM — the second tokenizer-training family next to operators/bpe.py (BPE merges
greedily bottom-up; the unigram LM starts from an over-complete piece
inventory and PRUNES, which is what SentencePiece ships by default).

Algorithm (Kudo 2018, "Subword Regularization", arXiv:1804.10959 — public
algorithm, re-derived; simplified hard-EM variant):
  1. seed an over-complete vocab: all chars + frequent substrings up to
     MAX_PIECE_LEN, scored by freq * len;
  2. E-step: Viterbi-segment every distinct WORD under current piece
     log-probs (hard assignment instead of full forward-backward — the
     textbook simplification);
  3. M-step: piece probabilities from segmentation counts weighted by word
     frequency; prune the lowest-probability pieces (never single chars, so
     every string stays segmentable); repeat.

Scale shape — the part that matters at 100 TB:
  * the corpus collapses to a WORD-FREQUENCY table first (one shuffle,
    vocabulary-sized output). EM iterations run over distinct words times
    their counts, never over the corpus again.
  * the piece table (vocab_size rows of (piece, logp)) broadcasts to every
    task; the Viterbi E-step is an Arrow-batched pandas UDF over the word
    table (tens of thousands of rows), and the count aggregation is an
    explode + groupBy(piece) with map-side combine onto a vocab-sized key
    space.
  * driver state is ONLY the piece table — same class as k-means centroids.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from streamds_spark.functions.text import tokens

MAX_PIECE_LEN = 4
UNK_PENALTY = -20.0  # per-char fallback score for uncovered characters


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, c) frequency table — the only corpus-sized pass."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("c"))
    )


def seed_vocab(wc: DataFrame, max_seed: int = 2000) -> DataFrame:
    """Over-complete initial inventory: every substring of length 1..MAX_PIECE_LEN
    of every word, scored by sum(word_freq) * len(piece); the top max_seed by
    score plus ALL single characters (chars are never pruned — they guarantee
    any word segments)."""
    subs = wc.select(
        "c",
        F.explode(
            F.expr(
                f"""
                flatten(transform(sequence(1, length(word)),
                    i -> transform(sequence(1, least({MAX_PIECE_LEN}, length(word) - i + 1)),
                         l -> substring(word, i, l))))
                """
            )
        ).alias("piece"),
    )
    scored = subs.groupBy("piece").agg(
        (F.sum("c") * F.length(F.first("piece"))).alias("score"),
        F.sum("c").alias("freq"),
    )
    chars = scored.filter(F.length("piece") == 1)
    multi = (
        scored.filter(F.length("piece") > 1)
        .orderBy(F.col("score").desc(), "piece")
        .limit(max_seed)
    )
    return chars.unionByName(multi).select("piece", "freq")


def _viterbi(word: str, logp: dict, max_len: int) -> list:
    """Best segmentation of `word` under piece log-probs (ties broken toward
    longer leading pieces via strictly-greater comparison on a backward DP)."""
    n = len(word)
    best = [-math.inf] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for l in range(1, min(max_len, i) + 1):
            piece = word[i - l : i]
            score = logp.get(piece)
            if score is None:
                if l == 1:
                    score = UNK_PENALTY
                else:
                    continue
            cand = best[i - l] + score
            if cand > best[i]:
                best[i] = cand
                back[i] = l
    out = []
    i = n
    while i > 0:
        l = back[i]
        out.append(word[i - l : i])
        i -= l
    out.reverse()
    return out


def segment_words(wc: DataFrame, piece_logp: dict) -> DataFrame:
    """E-step: (word, c, pieces[]) via broadcast piece table + Arrow-batched
    Viterbi."""
    spark = wc.sparkSession
    bc = spark.sparkContext.broadcast(dict(piece_logp))

    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ArrayType(StringType()))
    def viterbi_udf(words):
        lp = bc.value
        return words.map(lambda w: _viterbi(w, lp, MAX_PIECE_LEN))

    return wc.select("word", "c", viterbi_udf(F.col("word")).alias("pieces"))


def em_piece_counts(wc: DataFrame, piece_logp: dict) -> DataFrame:
    """Segmentation counts per piece, weighted by word frequency: the
    sufficient statistics for the M-step. Vocab-sized groupBy output."""
    seg = segment_words(wc, piece_logp)
    return (
        seg.select("c", F.explode("pieces").alias("piece"))
        .groupBy("piece")
        .agg(F.sum("c").alias("n"))
    )


def train_unigram_lm(
    docs: DataFrame,
    vocab_size: int = 400,
    iters: int = 3,
    max_seed: int = 2000,
    prune_frac: float = 0.75,
    text_col: str = "text",
) -> "tuple[dict, list]":
    """Run seeded hard-EM; returns (piece -> logp, per-iteration total loss).

    Each iteration: segment, count, re-estimate probs, then shrink the
    multi-char inventory by prune_frac (never below the vocab_size floor,
    and chars always survive so every string stays segmentable). After the
    last iteration the multi-char pieces are truncated so the TOTAL
    inventory (chars + multis) is at most max(vocab_size, n_chars) — the
    returned dict honors the requested vocab_size whenever the character
    set alone doesn't exceed it. Loss = -sum(word_freq * best_path_logp),
    non-increasing under hard EM re-estimation on a fixed inventory
    (pruning can raise it — tracked per iteration)."""
    # cache the word table: every EM iteration re-reads it, and it is the
    # vocabulary-sized reduction of the corpus (NOT collected to the driver —
    # at 100 TB the distinct-word table can be 10^8 rows)
    wc = word_counts(docs, text_col).cache()
    seed = seed_vocab(wc, max_seed=max_seed).collect()
    total = sum(r.freq for r in seed) or 1
    logp = {r.piece: math.log(r.freq / total) for r in seed}

    losses = []
    for _ in range(iters):
        counts = em_piece_counts(wc, logp).collect()
        # loss under the CURRENT model, from the sufficient statistics alone:
        # hard-EM total log-likelihood = sum over pieces n_p * logp(p)
        # (pieces emitted by the UNK fallback are absent from logp)
        losses.append(
            -sum(r.n * logp.get(r.piece, UNK_PENALTY) for r in counts)
        )
        n_total = sum(r.n for r in counts) or 1
        new_logp = {r.piece: math.log(r.n / n_total) for r in counts}
        # chars must stay segmentable even if unused this round
        for p, old in logp.items():
            if len(p) == 1 and p not in new_logp:
                new_logp[p] = min(old, math.log(0.5 / n_total))
        # renormalize so the injected char mass keeps a proper distribution
        log_mass = math.log(sum(math.exp(v) for v in new_logp.values()))
        logp = {p: v - log_mass for p, v in new_logp.items()}

        multi = sorted(
            ((p, s) for p, s in logp.items() if len(p) > 1),
            key=lambda t: (-t[1], t[0]),
        )
        keep = max(vocab_size, int(len(multi) * prune_frac))
        logp = {p: s for p, s in logp.items() if len(p) == 1} | dict(multi[:keep])

    # final truncation to the requested size: chars are mandatory, multis
    # fill the remaining budget in probability order; renormalize so the
    # returned model is a proper distribution even when mass was dropped
    chars = {p: s for p, s in logp.items() if len(p) == 1}
    budget = max(vocab_size - len(chars), 0)
    multi = sorted(
        ((p, s) for p, s in logp.items() if len(p) > 1), key=lambda t: (-t[1], t[0])
    )
    logp = chars | dict(multi[:budget])
    log_mass = math.log(sum(math.exp(v) for v in logp.values()))
    logp = {p: v - log_mass for p, v in logp.items()}
    return logp, losses


def tokenize_with_vocab(
    df: DataFrame, piece_logp: dict, text_col: str = "text"
) -> DataFrame:
    """Tokenize full documents with a trained inventory: whitespace pre-split
    (the SentencePiece word boundary), Viterbi per word, pieces flattened."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(dict(piece_logp))

    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ArrayType(StringType()))
    def tok_udf(texts):
        import re

        lp = bc.value
        # ASCII \s+ to match the training-side tokens() (Java regex \s is
        # ASCII-only; Python's is unicode-aware without re.ASCII) — train
        # and apply must agree on word boundaries
        ws = re.compile(r"\s+", re.ASCII)

        def go(t):
            out = []
            for w in ws.split(t or ""):
                if w:
                    out.extend(_viterbi(w, lp, MAX_PIECE_LEN))
            return out

        return texts.map(go)

    return df.withColumn("pieces", tok_udf(F.col(text_col)))
