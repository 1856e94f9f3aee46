"""Training-run packing: sequence assembly, shards, deterministic
order (operators/packing.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from queens_spark.operators.packing import (
    assign_shards,
    pack_sequences,
    sequence_stats,
    shard_stats,
    stream_offsets,
    training_order,
)

DOCS = [
    # (doc_id, stratum, text) — token counts 3, 4, 2, 5, 1
    (1, "en", "a b c"),
    (2, "en", "d e f g"),
    (3, "en", "h i"),
    (4, "de", "p q r s t"),
    (5, "de", "u"),
    (6, "en", ""),  # empty doc: occupies no tokens
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "lang", "text"])


def _py_tokens(text):
    return [t for t in text.split() if t]


def test_stream_offsets_match_naive_cumsum(spark, docs):
    base = docs.select(
        "doc_id",
        "lang",
        F.size(F.filter(F.split("text", r"\s+"), lambda x: x != ""))
        .cast("bigint")
        .alias("n_tokens"),
    )
    got = {
        r["doc_id"]: r["start"]
        for r in stream_offsets(base, "n_tokens", "lang", "doc_id").collect()
    }
    # naive python
    exp = {}
    for lang in ("en", "de"):
        cum = 0
        for did, lg, text in sorted(DOCS):
            if lg != lang:
                continue
            exp[did] = cum
            cum += len(_py_tokens(text))
    assert got == exp


def test_pack_sequences_conserves_tokens_and_boundaries(spark, docs):
    packed = pack_sequences(docs, "text", "doc_id", 5, "lang").collect()
    by_key = {(r["lang"], r["seq_id"]): r for r in packed}
    # en stream: a b c d e f g h i  (9 tokens) -> seqs [a..e], [f..i]
    assert by_key[("en", 0)]["toks"] == ["a", "b", "c", "d", "e"]
    assert by_key[("en", 1)]["toks"] == ["f", "g", "h", "i"]
    # de stream: p q r s t u -> [p..t], [u]
    assert by_key[("de", 0)]["toks"] == ["p", "q", "r", "s", "t"]
    assert by_key[("de", 1)]["toks"] == ["u"]
    # every sequence but the stratum-final is exactly full
    for lang in ("en", "de"):
        seqs = sorted(
            (r for r in packed if r["lang"] == lang), key=lambda r: r["seq_id"]
        )
        for r in seqs[:-1]:
            assert len(r["toks"]) == 5
    # doc_spans reconstruct each document exactly
    rebuilt: dict[int, dict[int, list[str]]] = {}
    for r in packed:
        for span in r["doc_spans"]:
            piece = r["toks"][span["pos"] : span["pos"] + span["len"]]
            rebuilt.setdefault(span["id"], {})[
                (r["lang"], r["seq_id"])
            ] = piece
    docs_by_id = {d[0]: _py_tokens(d[2]) for d in DOCS}
    for did, pieces in rebuilt.items():
        flat = [t for _, piece in sorted(pieces.items()) for t in piece]
        assert flat == docs_by_id[did], did
    # the empty doc appears in no span
    assert 6 not in rebuilt


def test_sequence_stats_match_assembly(spark, docs):
    stats = {
        (r["lang"], r["seq_id"]): r
        for r in sequence_stats(docs, "text", "doc_id", 5, "lang").collect()
    }
    assert stats[("en", 0)]["n_docs"] == 2  # doc1 whole + doc2 partial
    assert stats[("en", 0)]["n_starts"] == 2
    assert stats[("en", 0)]["seq_tokens"] == 5
    assert stats[("en", 1)]["n_docs"] == 2  # doc2 tail + doc3
    assert stats[("en", 1)]["n_starts"] == 1
    assert stats[("en", 1)]["seq_tokens"] == 4
    assert stats[("de", 1)]["n_docs"] == 1 and stats[("de", 1)]["seq_tokens"] == 1


def test_shards_balanced(spark, docs):
    stats = sequence_stats(docs, "text", "doc_id", 2, "lang")
    sharded = assign_shards(stats, 3)
    per = shard_stats(sharded, "lang").collect()
    counts = {r["shard"]: r["n_seqs"] for r in per}
    assert max(counts.values()) - min(counts.values()) <= 2  # <=1 per stratum
    total = sequence_stats(docs, "text", "doc_id", 2, "lang").count()
    assert sum(counts.values()) == total


def test_training_order_deterministic_and_seed_sensitive(spark, docs):
    a = [
        r["doc_id"]
        for r in training_order(docs, "doc_id", "epoch-0")
        .orderBy("order_hash", "doc_id")
        .collect()
    ]
    b = [
        r["doc_id"]
        for r in training_order(docs, "doc_id", "epoch-0")
        .orderBy("order_hash", "doc_id")
        .collect()
    ]
    c = [
        r["doc_id"]
        for r in training_order(docs, "doc_id", "epoch-1")
        .orderBy("order_hash", "doc_id")
        .collect()
    ]
    assert a == b
    assert set(a) == set(c)  # same rows either way
    h0 = {r["doc_id"]: r["order_hash"] for r in training_order(docs, "doc_id", "epoch-0").collect()}
    h1 = {r["doc_id"]: r["order_hash"] for r in training_order(docs, "doc_id", "epoch-1").collect()}
    assert h0 != h1  # a new seed is a fresh permutation key

    # portable: matches a python re-implementation of the poly hash
    def py_hash(s: str, p: int = 1_000_000_007) -> int:
        h = 0
        for ch in s:
            h = (h * 31 + ord(ch)) % p
        return h

    got = {
        r["doc_id"]: r["order_hash"]
        for r in training_order(docs, "doc_id", "epoch-0").collect()
    }
    for did, h in got.items():
        assert h == py_hash(f"epoch-0:{did}")


# ---------------------------------------------- property: pack laws

from hypothesis import HealthCheck, given, settings, strategies as st

docs_st = st.lists(
    st.tuples(
        st.sampled_from(["en", "de"]),
        st.integers(min_value=0, max_value=23),  # token count (0 = empty)
    ),
    min_size=0,
    max_size=14,
)


@pytest.mark.slow
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(doc_spec=docs_st, seq_len=st.integers(min_value=1, max_value=9))
def test_pack_laws_hold_on_random_corpora(spark, doc_spec, seq_len):
    """For ANY corpus and seq_len: (1) concatenating each stratum's
    sequences in seq_id order reproduces the stratum's doc stream in
    id order exactly (conservation + ordering), (2) every sequence
    except the stratum-final is exactly full, (3) doc_spans tile each
    sequence with no gap or overlap."""
    rows = [
        (i, lang, " ".join(f"d{i}w{j}" for j in range(n)))
        for i, (lang, n) in enumerate(doc_spec)
    ]
    if not rows:
        return
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    packed = pack_sequences(docs, "text", "doc_id", seq_len, "lang").collect()
    by_stratum: dict[str, list] = {}
    for r in packed:
        by_stratum.setdefault(r["lang"], []).append(r)
    streams: dict[str, list[str]] = {}
    for i, (lang, n) in enumerate(doc_spec):
        streams.setdefault(lang, []).extend(
            f"d{i}w{j}" for j in range(n)
        )
    for lang, expect in streams.items():
        got_rows = sorted(
            by_stratum.get(lang, []), key=lambda r: r["seq_id"]
        )
        flat = [t for r in got_rows for t in r["toks"]]
        assert flat == expect, (lang, seq_len)
        for r in got_rows[:-1]:
            assert len(r["toks"]) == seq_len
        for r in got_rows:
            spans = sorted((s["pos"], s["len"]) for s in r["doc_spans"])
            cursor = 0
            for pos, ln in spans:
                assert pos == cursor and ln > 0
                cursor += ln
            assert cursor == len(r["toks"])


def test_pack_with_bpe_tokenizer_composition(spark):
    """The export path a real pipeline runs: train a BPE tokenizer on
    the corpus, encode, and pack the ENCODED token stream — the
    pack's conservation law must hold for the custom tokenization
    exactly as for whitespace tokens."""
    from queens_spark.operators.corpus import bpe_encode, learn_bpe

    rows = [
        (i, "en", "lower lowest newer newest low new " * (1 + i % 3))
        for i in range(6)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    merges = learn_bpe(docs, "text", n_merges=8, min_count=1)
    enc = bpe_encode(docs, "text", merges)
    packed = pack_sequences(
        enc, "text", "doc_id", 32, "lang", tokens_col=F.col("bpe_tokens")
    ).collect()
    got = [t for r in sorted(packed, key=lambda r: r["seq_id"]) for t in r["toks"]]
    expect = [
        t
        for r in sorted(enc.collect(), key=lambda r: r["doc_id"])
        for t in r["bpe_tokens"]
    ]
    assert got == expect  # BPE stream conserved through the pack
    for r in sorted(packed, key=lambda r: r["seq_id"])[:-1]:
        assert len(r["toks"]) == 32
