"""BPE trainer (operators/bpe.py): exact equality against a pure-Python
reference implementation of the Sennrich et al. algorithm (greedy
leftmost-first merge, freq-desc/lex tie-break), plus fold edge cases.
The round-1 pair-count SQL parity lives in test_driver_contract.py."""

from __future__ import annotations

from collections import Counter

from ocr_spark.operators.bpe import EOW, bpe_train, word_vocab


def _ref_bpe(word_freqs: dict[str, int], n_merges: int):
    """Reference trainer: dict-of-tuples vocab, full recount per round."""
    vocab = {tuple(w) + (EOW,): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (l, r), fr = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((l, r, fr))
        new_vocab = {}
        for syms, f in vocab.items():
            out = []
            for s in syms:  # greedy leftmost-first scan
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_bpe_matches_reference_trainer(spark):
    corpus = [
        (0, "low low low low low"),
        (1, "lower lower newest newest"),
        (2, "newest newest newest newest"),
        (3, "widest widest widest"),
        (4, "low lower newest widest"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    wf: Counter = Counter()
    for _, text in corpus:
        wf.update(text.split())
    expect = _ref_bpe(dict(wf), 12)
    got, _ = bpe_train(docs, n_merges=12)
    assert got == expect
    # sanity on the classic example: 'newest' dominates → 'est</w>' family
    merged_syms = {l + r for l, r, _ in got}
    assert any("est" in m for m in merged_syms)


def test_bpe_greedy_fold_semantics(spark):
    # run of identical symbols: 'aaaa' merges (a,a) leftmost-first →
    # (aa)(aa), NOT (a)(aa)(a).  Round 2 ties (aa,aa) with (aa,</w>) at
    # freq 3 and the lex tie-break picks ('aa','</w>') ('<' < 'a').
    docs = spark.createDataFrame(
        [(0, "aaaa aaaa aaaa")], "doc_id long, text string"
    )
    merges, vocab = bpe_train(docs, n_merges=2)
    assert [(l, r) for l, r, _ in merges] == [("a", "a"), ("aa", "</w>")]
    row = vocab.collect()[0]
    assert row["syms"] == ["aa", "aa" + EOW]


def test_bpe_exhausts_when_fully_merged(spark):
    # a single 2-char word exhausts after 2 merges (incl. the EOW join)
    docs = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
    merges, vocab = bpe_train(docs, n_merges=10)
    assert len(merges) == 2
    assert vocab.collect()[0]["syms"] == ["ab" + EOW]


def test_word_vocab_counts_multiplicity(spark):
    docs = spark.createDataFrame(
        [(0, "x y x"), (1, "x z")], "doc_id long, text string"
    )
    got = {r["word"]: r["freq"] for r in word_vocab(docs).collect()}
    assert got == {"x": 3, "y": 1, "z": 1}


def _ref_encode(word, merges):
    syms = list(word) + [EOW]
    for l, r in merges:
        out = []
        for s in syms:
            if out and out[-1] == l and s == r:
                out[-1] = l + r
            else:
                out.append(s)
        syms = out
    return syms


def test_bpe_encode_matches_reference(spark):
    corpus = [
        (0, "low low low lower lowest"),
        (1, "newest newest widest low"),
        (2, "unseen wordy"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    from ocr_spark.operators.bpe import bpe_encode, bpe_train

    merges, _ = bpe_train(docs, n_merges=8)
    rules = [(l, r) for l, r, _ in merges]
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_encode(docs, rules).collect()
    }
    expect = {}
    for d, text in corpus:
        words = text.split()
        expect[d] = (
            len(words),
            sum(len(_ref_encode(w, rules)) for w in words),
        )
    assert got == expect
    # merged vocab compresses: fewer BPE tokens than raw chars+EOW
    for d, text in corpus[:2]:
        raw = sum(len(w) + 1 for w in text.split())
        assert got[d][1] < raw
