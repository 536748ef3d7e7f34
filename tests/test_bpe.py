"""Distributed BPE trainer vs a from-first-principles Python
reference (greedy-left merge application, count-desc/lexicographic
argmax) on identical corpora."""

from __future__ import annotations

from collections import Counter

import pytest


def _ref_bpe(words: Counter, n_merges: int, min_count: int):
    """Single-machine reference: vocab of symbol tuples."""
    vocab = {w: tuple(w) for w in words}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += words[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (x, y), c = best
        if c < min_count:
            break
        merges.append((x, y, c))
        new_vocab = {}
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[w] = tuple(out)
        vocab = new_vocab
    return merges, vocab


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)


def test_bpe_matches_reference_on_corpus(spark, corpus):
    from tabata_spark.operators.bpe import bpe_train

    texts = [r["text"] for r in corpus.collect()]
    words = Counter(w for t in texts for w in t.split(" ") if w)
    ref_merges, ref_vocab = _ref_bpe(words, n_merges=12, min_count=2)

    merges, vocab = bpe_train(corpus, n_merges=12, min_count=2)
    assert merges == ref_merges
    got = {
        r["word"]: tuple(r["s"][1:-1].split("]["))
        for r in vocab.collect()
    }
    assert got == ref_vocab


def test_bpe_greedy_left_semantics(spark):
    # [a,a,a] -> [aa,a]; [a,a,a,a] -> [aa,aa] — the string-replace
    # formulation must match the fold semantics exactly
    from tabata_spark.operators.bpe import bpe_segment

    df = spark.createDataFrame([("aaa",), ("aaaa",), ("baaab",)], "word string")
    out = {
        r["word"]: list(r["segments"])
        for r in bpe_segment(df, [("a", "a", 99)]).collect()
    }
    assert out["aaa"] == ["aa", "a"]
    assert out["aaaa"] == ["aa", "aa"]
    assert out["baaab"] == ["b", "aa", "a", "b"]


def test_bpe_segment_applies_merges_in_order(spark):
    from tabata_spark.operators.bpe import bpe_segment

    df = spark.createDataFrame([("abab",), ("abc",)], "word string")
    merges = [("a", "b", 9), ("ab", "ab", 5)]
    out = {
        r["word"]: list(r["segments"]) for r in bpe_segment(df, merges).collect()
    }
    assert out["abab"] == ["abab"]
    assert out["abc"] == ["ab", "c"]
