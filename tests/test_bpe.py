"""BPE trainer: the distributed merge loop must reproduce the classic
single-machine algorithm (Sennrich et al. 2016, learn_bpe) merge-for-merge."""

from __future__ import annotations

import collections

from streamds_spark.operators.bpe import (
    apply_merge,
    pair_counts,
    train_bpe,
    word_symbol_table,
)


def _reference_bpe(word_counts: dict[str, int], n_merges: int):
    """Pure-Python BPE with the same determinism rules: greedy left-to-right
    merge application, argmax tie-broken by (count desc, pair asc)."""
    vocab = {w: list(w) + ["</w>"] for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pairs: collections.Counter = collections.Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += word_counts[w]
        repeated = {p: c for p, c in pairs.items()}
        if not repeated:
            break
        best = min(repeated.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        merges.append((a, b, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new newest",
]


def test_train_bpe_matches_reference(spark):
    docs = spark.createDataFrame([(t,) for t in CORPUS], ["text"])
    wc: collections.Counter = collections.Counter(
        w for t in CORPUS for w in t.split()
    )
    ref_merges, ref_vocab = _reference_bpe(dict(wc), n_merges=8)
    merges, vocab_df = train_bpe(docs, n_merges=8)
    assert [(a, b) for a, b, _ in merges] == [(a, b) for a, b, _ in ref_merges]
    assert [c for _, _, c in merges] == [c for _, _, c in ref_merges]
    got = {r["word"]: r["syms"] for r in vocab_df.collect()}
    assert got == {w: s for w, s in ref_vocab.items()}


def test_greedy_overlap_semantics(spark):
    # merging ('a','a') on 'aaaa' must give [aa, aa]; on 'aaa' -> [aa, a]
    docs = spark.createDataFrame([("aaaa aaa",)], ["text"])
    vocab = word_symbol_table(docs)
    merged = apply_merge(vocab, "a", "a")
    got = {r["word"]: r["syms"] for r in merged.collect()}
    assert got["aaaa"] == ["aa", "aa", "</w>"]
    assert got["aaa"] == ["aa", "a", "</w>"]


def test_pair_counts_weighted_by_word_frequency(spark):
    docs = spark.createDataFrame([("ab ab ab cd",)], ["text"])
    rows = {
        (r["a"], r["b"]): r["pair_cnt"]
        for r in pair_counts(word_symbol_table(docs)).collect()
    }
    assert rows[("a", "b")] == 3
    assert rows[("b", "</w>")] == 3
    assert rows[("c", "d")] == 1


def test_quote_safe_symbols(spark):
    # words containing quotes must survive the codegen fold's escaping
    docs = spark.createDataFrame([("d'x d'x",)], ["text"])
    merges, vocab_df = train_bpe(docs, n_merges=1)
    assert merges[0][:2] == ("'", "x") or merges[0][:2] == ("d", "'")
    vocab_df.collect()  # must not raise a parse error


def test_apply_bpe_matches_reference_on_unseen_text(spark):
    """apply_bpe segments NEW documents (including unseen words) with a
    trained merge list exactly as the reference per-word greedy fold does,
    and per-doc piece order follows token order."""
    from streamds_spark.operators.bpe import apply_bpe

    train = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"])
    merges, _ = train_bpe(train, n_merges=8)

    apply_texts = {10: "low lower lowest", 11: "newest wide new", 12: "zz"}
    apply_df = spark.createDataFrame(list(apply_texts.items()), ["doc_id", "text"])
    got = {
        r["doc_id"]: list(r["pieces"])
        for r in apply_bpe(apply_df, [(a, b) for a, b, _ in merges]).collect()
    }

    def ref_segment(word):
        syms = list(word) + ["</w>"]
        for a, b, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    want = {
        d: [p for w in t.split() for p in ref_segment(w)]
        for d, t in apply_texts.items()
    }
    assert got == want
    # losslessness: pieces rejoin to the original text modulo whitespace
    for d, t in apply_texts.items():
        assert "".join(got[d]).replace("</w>", "") == t.replace(" ", "")
