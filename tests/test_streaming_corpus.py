"""Streaming corpus builder: exactly-once ledger screen + index
append under redelivery (idempotency tokens), and the live
foreachBatch composition over a file stream."""

import json
import os

import pytest
from pyspark.sql import Row, functions as F

from queens_spark.store.dedup_ledger import (
    ingest_deduped,
    ledger_fingerprints,
)
from queens_spark.store.text_index import (
    append_text_index,
    build_text_index,
    load_text_index,
)

LONGA = ("alpha beta gamma delta epsilon zeta eta theta iota "
         "kappa lambda mu nu xi omicron pi rho sigma tau")


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def test_token_replay_ledger(spark, tmp_path):
    """A redelivered token skips the screen and returns the SAME
    accepted set — a crash between ledger flip and index append can
    no longer lose the batch's docs."""
    ldir = str(tmp_path / "ledger")
    b = _docs(spark, [(0, "aa bb"), (1, "aa  bb"), (2, "cc")])
    fresh1, s1 = ingest_deduped(b, "text", "doc_id", ldir, token="b0")
    assert s1["accepted"] == 2
    # redelivery: same token, same batch
    fresh2, s2 = ingest_deduped(b, "text", "doc_id", ldir, token="b0")
    assert s2 == {"batch": 3, "accepted": 2, "replayed": True}
    assert ({r["doc_id"] for r in fresh2.collect()}
            == {r["doc_id"] for r in fresh1.collect()} == {0, 2})
    # the ledger did NOT grow a second segment
    assert ledger_fingerprints(spark, ldir).count() == 2
    # a DIFFERENT token screens normally (all dups now)
    _, s3 = ingest_deduped(b, "text", "doc_id", ldir, token="b1")
    assert s3["accepted"] == 0


def test_token_replay_index_appends(spark, tmp_path):
    """A redelivered token is a no-op on both index appends."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tdir = str(tmp_path / "t")
    build_text_index(docs.where(F.col("doc_id") < 400),
                     "text", "doc_id", "d", tdir)
    b2 = docs.where(F.col("doc_id") >= 400)
    append_text_index(b2, "d", tdir, token="x")
    idx = append_text_index(b2, "d", tdir, token="x")  # redelivered
    assert len(idx.entry["segments"]) == 2
    assert idx.describe()["n_docs"] == docs.count()

    from queens_spark.store.vector_index import (
        append_vector_index,
        build_vector_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    vdir = str(tmp_path / "v")
    build_vector_index(emb.where(F.col("vec_id") < 400),
                       "embedding", "vec_id", "e", vdir)
    nb = emb.where(F.col("vec_id") >= 400)
    append_vector_index(nb, "e", vdir, token="x")
    vidx = append_vector_index(nb, "e", vdir, token="x")
    assert vidx.pq_codes().count() == emb.count()


def test_stream_ingest_corpus_end_to_end(spark, tmp_path):
    """Live composition over a file stream: two availableNow runs;
    batch 2 contains re-crawled dups of batch 1 — the served index
    ends up with exactly the distinct corpus, and a THIRD run with no
    new files changes nothing."""
    from queens_spark.streaming.corpus import stream_ingest_corpus

    src = str(tmp_path / "in")
    os.makedirs(src)
    ldir = str(tmp_path / "ledger")
    idir = str(tmp_path / "tidx")
    ckpt = str(tmp_path / "ckpt")

    # seed index on the first corpus slice (the stream appends to it)
    seed = _docs(spark, [(0, LONGA + " zero"), (1, LONGA + " one")])
    build_text_index(seed, "text", "doc_id", "corpus", idir)
    ingest_deduped(seed, "text", "doc_id", ldir)  # seed the ledger too

    schema = "doc_id bigint, text string"

    def run():
        stream = (spark.readStream.schema(schema)
                  .json(src))
        q = stream_ingest_corpus(
            stream, "text", "doc_id", ldir, idir, "corpus", ckpt)
        q.awaitTermination(120)

    def write_file(name, rows):
        with open(os.path.join(src, name), "w") as fh:
            for i, t in rows:
                fh.write(json.dumps({"doc_id": i, "text": t}) + "\n")

    write_file("b1.json", [(10, LONGA + " ten"),
                           (11, LONGA + " zero"),    # dup of doc 0
                           (12, LONGA + " twelve")])
    run()
    idx = load_text_index(spark, idir, "corpus")
    assert idx.describe()["n_docs"] == 4  # 0, 1, 10, 12

    write_file("b2.json", [(20, LONGA + " ten"),     # dup of doc 10
                           (21, LONGA + " twentyone")])
    run()
    idx = load_text_index(spark, idir, "corpus")
    assert idx.describe()["n_docs"] == 5
    hit = idx.bm25_topk(["twentyone"], k=3).collect()
    assert [r["doc"] for r in hit] == [21]
    # nothing new: a third run is a no-op
    run()
    assert load_text_index(spark, idir, "corpus").describe()["n_docs"] == 5
    # and every batch screened against the FULL history
    _, s = ingest_deduped(_docs(spark, [(99, LONGA + " twentyone")]),
                          "text", "doc_id", ldir)
    assert s["accepted"] == 0


def test_compaction_clears_token_map(spark, tmp_path):
    """Ledger compaction merges away the per-batch segments the token
    map points at — the map clears with it, and a post-compaction
    replay re-screens safely (re-accepting nothing)."""
    from queens_spark.store.dedup_ledger import compact_ledger

    ldir = str(tmp_path / "ledger")
    b1 = _docs(spark, [(0, "aa"), (1, "bb")])
    b2 = _docs(spark, [(2, "cc")])
    ingest_deduped(b1, "text", "doc_id", ldir, token="t1")
    ingest_deduped(b2, "text", "doc_id", ldir, token="t2")
    assert compact_ledger(spark, ldir) == 2
    # replayed token after compaction: no dangling path read, just a
    # normal screen that re-accepts nothing
    fresh, s = ingest_deduped(b1, "text", "doc_id", ldir, token="t1")
    assert "replayed" not in s and s["accepted"] == 0
    assert fresh.count() == 0
    assert ledger_fingerprints(spark, ldir).count() == 3


def test_pending_tokens_and_gated_ledger_compaction(spark, tmp_path):
    """compact_ledger(require_applied=...) refuses while a token is
    recorded in the ledger but not applied to an index (ADVICE r9:
    compacting then would strand the batch — redelivery re-screens to
    accepted=0 and the batch is never indexed). Zero-accept tokens
    never reach an index and must not block."""
    from queens_spark.store.dedup_ledger import (
        compact_ledger,
        pending_tokens,
    )

    ldir = str(tmp_path / "ledger")
    b1 = _docs(spark, [(0, LONGA + " zero"), (1, LONGA + " one")])
    ingest_deduped(b1, "text", "doc_id", ldir, token="t1")
    b2 = _docs(spark, [(2, LONGA + " two")])
    ingest_deduped(b2, "text", "doc_id", ldir, token="t2")
    # an all-duplicate batch's token: recorded, zero-accept
    _, s = ingest_deduped(b1, "text", "doc_id", ldir, token="tz")
    assert s["accepted"] == 0

    # index applied only t1 -> t2 pending, tz excluded
    assert pending_tokens(spark, ldir, ["t1"]) == ["t2"]
    assert pending_tokens(spark, ldir, ["t1", "t2"]) == []
    with pytest.raises(ValueError, match="not caught up"):
        compact_ledger(spark, ldir, require_applied=[["t1"]])
    # caught up everywhere: compaction proceeds and clears the map
    assert compact_ledger(spark, ldir, require_applied=[["t1", "t2"]]) == 3
    assert pending_tokens(spark, ldir, []) == []


def test_index_compaction_clears_applied_tokens_tandem(spark, tmp_path):
    """The unbounded-manifest fix (ADVICE r9): index compaction can
    clear its applied-token list — ONLY after ledger compaction — and
    the compact→replay cycle is a no-op on BOTH indexes."""
    from queens_spark.store.dedup_ledger import compact_ledger
    from queens_spark.store.text_index import compact_text_index
    from queens_spark.store.vector_index import (
        append_vector_index,
        build_vector_index,
        compact_vector_index,
        load_vector_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    ldir = str(tmp_path / "ledger")
    tdir, vdir = str(tmp_path / "t"), str(tmp_path / "v")

    seed_docs = docs.where(F.col("doc_id") < 400)
    build_text_index(seed_docs, "text", "doc_id", "c", tdir)
    build_vector_index(emb.where(F.col("vec_id") < 400),
                       "embedding", "vec_id", "c", vdir)
    ingest_deduped(seed_docs, "text", "doc_id", ldir)

    batch = docs.where(F.col("doc_id") >= 400)
    fresh, s = ingest_deduped(batch, "text", "doc_id", ldir, token="b1")
    assert s["accepted"] > 0
    append_text_index(fresh, "c", tdir, token="b1")
    append_vector_index(
        emb.where(F.col("vec_id") >= 400), "c", vdir, token="b1"
    )
    before_bm = load_text_index(spark, tdir, "c").bm25_topk(
        ["the"], k=5).collect()

    # default compaction KEEPS the token list (standalone compaction
    # without ledger compaction must stay replay-safe)
    tix = compact_text_index(spark, tdir, "c")
    assert tix.entry.get("applied_tokens") == ["b1"]

    # the maintain() ordering: ledger first, then clear on the indexes
    compact_ledger(spark, ldir, require_applied=[["b1"], ["b1"]])
    tix = compact_text_index(spark, tdir, "c", clear_applied_tokens=True)
    vix = compact_vector_index(spark, vdir, "c", clear_applied_tokens=True)
    assert "applied_tokens" not in tix.entry
    assert "applied_tokens" not in vix.entry
    assert len(tix.entry["segments"]) == 1

    # replay of b1 after the sweep: re-screens to nothing, neither
    # index append fires, serving unchanged
    fresh2, s2 = ingest_deduped(batch, "text", "doc_id", ldir, token="b1")
    assert s2["accepted"] == 0 and "replayed" not in s2
    # (the streaming handler skips appends on accepted == 0)
    after_bm = load_text_index(spark, tdir, "c").bm25_topk(
        ["the"], k=5).collect()
    assert after_bm == before_bm
    assert load_vector_index(spark, vdir, "c").pq_codes().count() \
        == emb.count()


def test_empty_append_records_token(spark, tmp_path):
    """An empty batch's append adds no segment but still records the
    token — pending-token accounting stays exact (the append SAW the
    batch)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tdir = str(tmp_path / "t")
    build_text_index(docs.where(F.col("doc_id") < 50),
                     "text", "doc_id", "d", tdir)
    idx = append_text_index(
        docs.where(F.col("doc_id") < 0), "d", tdir, token="e1"
    )
    assert idx.entry.get("applied_tokens") == ["e1"]
    assert len(idx.entry["segments"]) == 1


def test_stream_quality_gate(spark, tmp_path):
    """quality_filter is the streaming ADMISSION GATE: rejected docs
    never reach the ledger or the index, the gate composes with
    dedup screening, and a restart stays exactly-once."""
    from queens_spark.operators.text import filter_verdict
    from queens_spark.streaming.corpus import stream_ingest_corpus

    src = str(tmp_path / "in")
    os.makedirs(src)
    ldir = str(tmp_path / "ledger")
    idir = str(tmp_path / "tidx")
    ckpt = str(tmp_path / "ckpt")

    # the cascade's language rule needs English marker words
    longb = ("the alpha is a beta and the gamma of delta to epsilon "
             "the zeta eta is theta and iota kappa")
    seed = _docs(spark, [(0, longb + " zero")])
    build_text_index(seed, "text", "doc_id", "corpus", idir)
    ingest_deduped(seed, "text", "doc_id", ldir)

    schema = "doc_id bigint, text string"
    gate = filter_verdict("text") == "keep"

    def run():
        stream = spark.readStream.schema(schema).json(src)
        q = stream_ingest_corpus(
            stream, "text", "doc_id", ldir, idir, "corpus", ckpt,
            quality_filter=gate,
        )
        q.awaitTermination(120)

    def write_file(name, rows):
        with open(os.path.join(src, name), "w") as fh:
            for i, t in rows:
                fh.write(json.dumps({"doc_id": i, "text": t}) + "\n")

    write_file("b1.json", [
        (10, longb + " ten"),          # keep
        (11, "too short"),             # rejected: too_short
        (12, longb + " zero"),         # keep-quality but ledger dup of 0
        (13, longb + " # # # # # # # # # # # # # # # #"),  # symbols
    ])
    run()
    idx = load_text_index(spark, idir, "corpus")
    assert idx.describe()["n_docs"] == 2  # 0 (seed) + 10
    # rejected docs never touched the ledger: their content is STILL
    # novel to it (a later legitimate submission is accepted)
    _, s = ingest_deduped(_docs(spark, [(99, "too short")]),
                          "text", "doc_id", ldir)
    assert s["accepted"] == 1
    # restart with no new files: no-op
    run()
    assert load_text_index(spark, idir, "corpus").describe()["n_docs"] == 2
