"""Unit tests for the Gopher-style repetition/quality screens (q62).

The driver corpus is single-line and punctuation-free, so its catalog
run only exercises the n-gram metrics; these synthetic docs cover the
line-based rules and the edge cases.
"""

import pytest
from pyspark.sql import Row

from queens_spark.operators.text import (
    dup_line_char_frac,
    dup_line_frac,
    dup_ngram_frac,
    frac_lines_end_punct,
    max_multiplicity,
    symbol_word_ratio,
    top_ngram_frac,
    word_ngrams,
)
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        Row(doc_id=0, text=""),
        Row(doc_id=1, text="Buy now!\nBuy now!\nBuy now!\nUnique closing line."),
        Row(doc_id=2, text="a b a b a b a b"),          # one bigram dominates
        Row(doc_id=3, text="x y z w"),                  # all n-grams unique
        Row(doc_id=4, text="wait... what... ## ##"),    # symbols
    ]
    return spark.createDataFrame(rows)


def metric(frame, doc_id, col):
    return frame.where(F.col("doc_id") == doc_id).select(col.alias("m")).collect()[0]["m"]


def test_empty_doc_all_zero(frame):
    for col in (dup_line_frac("text"), dup_line_char_frac("text"),
                frac_lines_end_punct("text"), top_ngram_frac("text", 2),
                dup_ngram_frac("text", 3), symbol_word_ratio("text")):
        assert metric(frame, 0, col) == 0.0


def test_dup_line_frac_counts_repeats(frame):
    # 4 lines, 2 distinct -> 2/4 repeats
    assert metric(frame, 1, dup_line_frac("text")) == pytest.approx(0.5)


def test_dup_line_char_frac_weights_by_length(frame):
    # "Buy now!" (8 chars) x3 + "Unique closing line." (20): dup chars = 16/44
    assert metric(frame, 1, dup_line_char_frac("text")) == pytest.approx(16 / 44)


def test_frac_lines_end_punct(frame):
    assert metric(frame, 1, frac_lines_end_punct("text")) == pytest.approx(1.0)
    assert metric(frame, 2, frac_lines_end_punct("text")) == 0.0


def test_top_bigram_frac_dominant(frame):
    # bigrams: [a b, b a, a b, b a, a b, b a, a b] -> max 4 of 7
    assert metric(frame, 2, top_ngram_frac("text", 2)) == pytest.approx(4 / 7)
    assert metric(frame, 3, top_ngram_frac("text", 2)) == pytest.approx(1 / 3)


def test_dup_trigram_frac(frame):
    # trigrams of doc 2: 6 total, 2 distinct -> 4/6 repeats
    assert metric(frame, 2, dup_ngram_frac("text", 3)) == pytest.approx(4 / 6)
    assert metric(frame, 3, dup_ngram_frac("text", 3)) == 0.0


def test_symbol_word_ratio(frame):
    # doc 4: 4 '#' chars + 2 '...' runs over 4 tokens
    assert metric(frame, 4, symbol_word_ratio("text")) == pytest.approx(6 / 4)


def test_word_ngrams_keep_duplicates(frame):
    got = frame.where(F.col("doc_id") == 2).select(
        word_ngrams("text", 2).alias("ng")).collect()[0]["ng"]
    assert got == ["a b", "b a", "a b", "b a", "a b", "b a", "a b"]


def test_max_multiplicity_on_literals(spark):
    df = spark.range(1).select(
        max_multiplicity(F.array(F.lit("q"), F.lit("p"), F.lit("q"), F.lit("q"))).alias("m"),
        max_multiplicity(F.array().cast("array<string>")).alias("empty"),
    )
    row = df.collect()[0]
    assert row["m"] == 3 and row["empty"] == 0


def test_filter_cascade_all_verdicts(spark):
    from queens_spark.operators.text import filter_funnel, filter_verdict
    from pyspark.sql import functions as F

    fluent = ("the cat sat on the mat and the dog ran to the park "
              "with a ball and a stick for fun today")
    docs = [
        (0, "tiny doc"),                                    # too_short
        (1, "le chat est sur le tapis et le chien est la "
            "et le chat est une bete et le chien aussi"),   # language
        (2, "the line is a line\n" * 20 + "the end is near "
            "and the cat is on the mat with a dog"),        # repetition
        (3, "the " + "# " * 30 + "cat sat on the mat and "
            "the dog ran to the park today is fine"),       # symbols
        (4, "the the the the the the the the the the the "
            "the the the the the"),                         # low_quality
        (5, fluent),                                        # keep
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["v"]
        for r in df.select(
            "doc_id", filter_verdict("text").alias("v")
        ).collect()
    }
    assert got == {
        0: "too_short", 1: "language", 2: "repetition",
        3: "symbols", 4: "low_quality", 5: "keep",
    }, got

    funnel = {r["verdict"]: r for r in
              filter_funnel(df, "text", "doc_id").collect()}
    assert len(funnel) == 6
    assert all(r["n_docs"] == 1 for r in funnel.values())
    # exact integer shares: 6 docs -> 1666 bp each
    assert all(r["doc_share_bp"] == 1666 for r in funnel.values())


def test_compression_ratios(spark):
    import zlib

    from queens_spark.operators.text import compression_ratios

    docs = [
        (0, "spam " * 200),                      # hyper-repetitive
        (1, "the quick brown fox jumps over the lazy dog and then "
            "wanders off toward a distant meadow full of flowers"),
        (2, ""),                                  # empty
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc"]: r for r in
           compression_ratios(df, "text", "doc_id").collect()}
    for d, t in docs:
        raw = t.encode()
        if raw:
            comp = len(zlib.compress(raw, 6))
            assert got[d]["n_bytes"] == len(raw)
            assert got[d]["n_compressed"] == comp
            assert got[d]["ratio_bp"] == comp * 10000 // len(raw)
    assert got[2]["ratio_bp"] == 10000  # empty: incompressible convention
    # the repetitive doc compresses far below natural prose
    assert got[0]["ratio_bp"] < got[1]["ratio_bp"] / 3
