"""Distributed BPE training (operators/tokenizer.py) vs an exact
pure-python replica of the Sennrich algorithm — merge lists and token
sequences must match exactly, and training must be invariant to input
partitioning (integer pair counts + lexicographic tie-breaks)."""

from collections import Counter

import pytest

from ideafast_etl_spark.operators.tokenizer import (
    bpe_merge_table,
    bpe_tokenize,
    bpe_train,
)


def _pre_tok(t):
    """Twin of tokenizer._split_words: control chars are separators."""
    cleaned = "".join(
        " " if (ord(c) < 0x20 or ord(c) == 0x7F) else c for c in t.lower()
    )
    return [w for w in cleaned.split() if w]


def _twin_train(texts, n_merges, min_freq=2):
    wf = Counter(w for t in texts for w in _pre_tok(t))
    vocab = {w: list(w) + ["</w>"] for w in wf}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, f in wf.items():
            syms = vocab[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        cands = [
            (c, a + "\x1f" + b, (a, b))
            for (a, b), c in pc.items()
            if c >= min_freq
        ]
        if not cands:
            break
        cands.sort(key=lambda t: (-t[0], t[1]))
        c, _key, (a, b) = cands[0]
        merges.append((a, b, c))
        merged = a + b
        for w in vocab:
            syms = vocab[w]
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
        wf = wf  # frequencies unchanged
    return merges, vocab


def _twin_tokenize(texts_by_id, vocab):
    out = {}
    for i, t in texts_by_id.items():
        toks = []
        words = _pre_tok(t)
        for w in words:
            toks.extend(vocab.get(w, list(w) + ["</w>"]))
        out[i] = (len(words), toks)
    return out


TEXTS = [
    "low low low low low lower lower newest newest newest",
    "newest newest newest widest widest widest the lowest",
    "hugging faces hug hugs hugging hugged the widest low",
    "a ab abc abcd ab ab a a the the the lowest newest",
]


@pytest.fixture(scope="module")
def corpus(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    return df


def test_bpe_merges_match_twin_exactly(spark, corpus):
    merges, _vocab = bpe_train(corpus, n_merges=15)
    want, _ = _twin_train(TEXTS, n_merges=15)
    assert merges == want


def test_bpe_deterministic_under_repartition(spark, corpus):
    a, _ = bpe_train(corpus, n_merges=8)
    b, _ = bpe_train(corpus.repartition(7), n_merges=8)
    assert a == b


def test_bpe_tokenize_matches_twin(spark, corpus):
    merges, vocab_df = bpe_train(corpus, n_merges=12)
    _twin_merges, twin_vocab = _twin_train(TEXTS, n_merges=12)
    got = {
        r["doc_id"]: (r["n_words"], list(r["tokens"]))
        for r in bpe_tokenize(corpus, vocab_df).collect()
    }
    want = _twin_tokenize({i: t for i, t in enumerate(TEXTS)}, twin_vocab)
    assert got == want
    # n_tokens column consistent with the token array
    for r in bpe_tokenize(corpus, vocab_df).collect():
        assert r["n_tokens"] == len(r["tokens"])


def test_bpe_oov_falls_back_to_characters(spark, corpus):
    _merges, vocab_df = bpe_train(corpus, n_merges=5)
    new = spark.createDataFrame(
        [(99, "zzyq low")], "doc_id long, text string"
    )
    row = bpe_tokenize(new, vocab_df).collect()[0]
    toks = list(row["tokens"])
    assert toks[:5] == ["z", "z", "y", "q", "</w>"]  # OOV → chars + EOW


def test_merge_table_shape(spark, corpus):
    merges, _ = bpe_train(corpus, n_merges=6)
    t = bpe_merge_table(spark, merges)
    rows = t.orderBy("rank").collect()
    assert [r["rank"] for r in rows] == list(range(len(merges)))
    assert all(r["merged"] == r["left"] + r["right"] for r in rows)


def test_control_chars_cannot_corrupt_pair_keys(spark):
    """Round-5 ADVICE fix: 0x1F is the internal pair-key delimiter; a word
    containing it (or any C0 control char) must be split apart during
    pre-tokenization so no learned merge ever carries an ambiguous key —
    and training must still match the twin exactly on such a corpus."""
    texts = [
        "ab\x1fab ab\x1fab ab\x1fab",  # 0x1F inside "words"
        "ab ab low\x00low low\x7flow lower lower",
        "ab ab lower lower",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges, vocab = bpe_train(df, n_merges=8)
    want, _ = _twin_train(texts, n_merges=8)
    assert merges == want
    for a, b, _f in merges:
        assert "\x1f" not in a and "\x1f" not in b
    # learned vocabulary contains only control-free words
    for r in vocab.collect():
        assert "\x1f" not in r["word"]
