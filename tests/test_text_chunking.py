"""Edge cases for the chunking / redaction operators (q55/q56)."""

import pytest
from pyspark.sql import Row, functions as F

from queens_spark.operators.text import mask_pii, normalize_text, token_chunks


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        Row(doc_id=0, text=""),                      # empty -> no chunks
        Row(doc_id=1, text="one two three"),          # shorter than chunk
        Row(doc_id=2, text=" ".join(f"t{i}" for i in range(10))),
        Row(doc_id=3, text="mail me at a.b@example.org or see https://x.test/page?e=c@d.io now"),
    ]
    return spark.createDataFrame(rows)


def chunks_of(frame, doc_id, chunk, stride):
    row = (
        frame.where(F.col("doc_id") == doc_id)
        .select(token_chunks("text", chunk, stride).alias("c"))
        .collect()[0]
    )
    return row["c"]


def test_empty_doc_has_no_chunks(frame):
    assert chunks_of(frame, 0, 4, 2) == []


def test_short_doc_is_one_chunk(frame):
    assert chunks_of(frame, 1, 4, 2) == ["one two three"]


def test_overlap_and_tail(frame):
    # 10 tokens, chunk 4, stride 3 -> ceil(6/3)+1 = 3 chunks
    got = chunks_of(frame, 2, 4, 3)
    assert got == ["t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9"]


def test_stride_larger_than_chunk_gaps(frame):
    # stride 6 > chunk 4: chunks skip tokens (sampling mode)
    got = chunks_of(frame, 2, 4, 6)
    assert got == ["t0 t1 t2 t3", "t6 t7 t8 t9"]


def test_bad_stride_raises():
    with pytest.raises(ValueError, match="stride"):
        token_chunks("text", 4, 0)


def test_mask_pii_and_normalize(frame):
    out = (
        frame.where(F.col("doc_id") == 3)
        .select(normalize_text(mask_pii("text")).alias("t"))
        .collect()[0]["t"]
    )
    assert "<EMAIL>" in out and "<URL>" in out
    assert "example.org" not in out
    # the email inside the URL query string was masked BEFORE the URL
    # pass, so it never leaks
    assert "c@d.io" not in out
