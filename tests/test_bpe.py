"""BPE tokenizer training (q136 / operators/corpus.py): the
distributed pair-count statistic, the vocabulary-bounded driver
trainer, and the Arrow-batched encode UDF, each checked against a
from-scratch reference implementation."""

import random

import pytest

from queens_spark.operators.corpus import (
    bpe_encode,
    bpe_pair_counts,
    bpe_word,
    learn_bpe,
)


def _ref_learn(corpus_texts, n_merges, min_count=2):
    """Reference BPE trainer straight from the algorithm definition."""
    vocab = {}
    for t in corpus_texts:
        for w in t.split():
            if len(w) >= 2:
                vocab[tuple(w)] = vocab.get(tuple(w), 0) + 1
    merges = []
    for _ in range(n_merges):
        counts = {}
        for syms, c in vocab.items():
            for pair in zip(syms, syms[1:]):
                counts[pair] = counts.get(pair, 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        (a, b), _ = best
        nv = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + c
        vocab = nv
        merges.append((a, b))
    return merges


CORPUS = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "that hat is the hat that matters",
    "scatter the chatter",
    "the the the thee",
]


@pytest.mark.slow
def test_first_merge_equals_top_pair_count(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"]
    )
    top = bpe_pair_counts(df, "text", top=1).collect()[0]
    merges = learn_bpe(df, "text", n_merges=1)
    assert merges == [(top["left_sym"], top["right_sym"])]


def test_learn_bpe_matches_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"]
    )
    assert learn_bpe(df, "text", n_merges=12) == _ref_learn(CORPUS, 12)


def test_learn_bpe_random_corpus(spark):
    rng = random.Random(136)
    texts = [
        " ".join(
            "".join(rng.choice("abcd") for _ in range(rng.randrange(1, 7)))
            for _ in range(rng.randrange(0, 15))
        )
        for _ in range(30)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    assert learn_bpe(df, "text", n_merges=20) == _ref_learn(texts, 20)


def test_encode_matches_per_word_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"]
    )
    merges = learn_bpe(df, "text", n_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(df, "text", merges).collect()
    }
    for i, t in enumerate(CORPUS):
        expect = [s for w in t.split() for s in bpe_word(w, ranks)]
        assert got[i] == expect, (i, got[i], expect)
        # segmentation is a partition of each word's characters
        assert "".join(got[i]) == t.replace(" ", "")


def test_encode_roundtrips_unknown_words(spark):
    df = spark.createDataFrame([(0, CORPUS[0])], ["doc_id", "text"])
    merges = learn_bpe(df, "text", n_merges=5)
    out = bpe_encode(
        spark.createDataFrame([(1, "zzz unseen-word")], ["doc_id", "text"]),
        "text",
        merges,
    ).collect()[0]["bpe_tokens"]
    assert "".join(out) == "zzzunseen-word"


def test_vocab_guard(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"]
    )
    with pytest.raises(ValueError, match="max_vocab"):
        learn_bpe(df, "text", n_merges=1, max_vocab=2)
