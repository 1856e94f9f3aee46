"""Index registry: auto-refresh of every registered index INSIDE
Engine.ingest (the reference's derived-state-inside-the-write posture,
queens/core/read_write.py:464-531) and the registry-driven streaming
corpus builder — including exactly-once resolution of a crash between
the ledger flip and the Nth index's flip."""

import contextlib
import io
import json
import os

import pytest
from pyspark.sql import Row, functions as F

from queens_spark.core.schema import CollectionSchema, ColumnSpec
from queens_spark.facade import Engine

DIM = 8


def docs_schemas():
    return {
        "docs": CollectionSchema(
            "docs",
            [
                ColumnSpec("ingest_id", "INTEGER", nullable=False),
                ColumnSpec("table_name", "TEXT", nullable=False),
                ColumnSpec("doc_id", "INTEGER", nullable=False),
                ColumnSpec("text", "TEXT", nullable=False),
                ColumnSpec("embedding", "ARRAY<FLOAT>"),
            ],
        )
    }


def _frame(spark, items):
    return spark.createDataFrame(
        [
            Row(
                doc_id=i,
                text=t,
                embedding=[float((i + j + 1) % 7 + 1) for j in range(DIM)],
            )
            for i, t in items
        ]
    )


def _engine_with_indexes(spark, tmp_path):
    eng = Engine(spark, str(tmp_path / "wh"), schemas=docs_schemas())
    seed = _frame(
        spark,
        [(i, f"seed document number {i} alpha beta gamma") for i in range(8)],
    )
    eng.build_text_index(seed, "text", "doc_id", "d")
    eng.build_vector_index(seed, "embedding", "doc_id", "v")
    # the seed slice enters the ledger so later ingests screen against it
    eng.ingest_deduped(seed, "text", "doc_id", ledger="docs")
    eng.register_index("docs", "text", "d")
    eng.register_index("docs", "vector", "v")
    return eng


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_register_validates_and_persists(spark, tmp_path):
    eng = _engine_with_indexes(spark, tmp_path)
    assert eng.registered_indexes("docs") == [
        {"kind": "text", "name": "d"},
        {"kind": "vector", "name": "v"},
    ]
    # idempotent re-register
    eng.register_index("docs", "text", "d")
    assert len(eng.registered_indexes("docs")) == 2
    # a typo fails at registration, not at every later ingest
    with pytest.raises(KeyError):
        eng.register_index("docs", "text", "nope")
    with pytest.raises(ValueError, match="kind"):
        eng.register_index("docs", "bogus", "d")
    # persists across sessions: a NEW engine over the same warehouse
    eng2 = Engine(spark, str(tmp_path / "wh"), schemas=docs_schemas())
    assert eng2.registered_indexes("docs") == eng.registered_indexes("docs")
    assert eng2.unregister_index("docs", "vector", "v") is True
    assert eng2.unregister_index("docs", "vector", "v") is False
    assert eng2.registered_indexes("docs") == [
        {"kind": "text", "name": "d"}
    ]


def test_ingest_refreshes_every_registered_index(spark, tmp_path):
    """One ingest verb: ledger screen + warehouse append + BOTH index
    appends. Survivors (and only survivors) become searchable on the
    lexical AND the vector side, with no full-corpus stage anywhere."""
    eng = _engine_with_indexes(spark, tmp_path)
    batch = _frame(
        spark,
        [
            (10, "fresh document about zephyr quixotic topics"),
            (11, "seed document number 3 alpha beta gamma"),  # ledger dup
            (12, "another fresh document about quixotic storms"),
        ],
    )
    iid = eng.ingest(
        batch, "docs", "b1",
        dedup_text_col="text", dedup_id_col="doc_id",
    )
    assert iid is not None
    tidx = eng.text_index("d")
    vidx = eng.vector_index("v")
    assert tidx.describe()["n_docs"] == 10  # 8 seed + 2 survivors
    assert vidx.pq_codes().count() == 10
    hits = [r["doc"] for r in tidx.bm25_topk(["quixotic"], k=5).collect()]
    assert set(hits) == {10, 12}
    # the vector side serves the new doc too (exact self-match top-1)
    emb10 = [float((10 + j + 1) % 7 + 1) for j in range(DIM)]
    top = vidx.adc_topk(emb10, k=1).collect()[0]
    assert top["doc_id"] in {3, 10}  # doc 3 shares the modular embedding
    # served plan is pure index reads: no tokenize stage, no corpus
    plan = plan_of(tidx.bm25_topk(["quixotic"], k=5))
    assert "Generate" not in plan
    # a plain ingest (no dedup screen) must NOT touch the indexes
    plain = _frame(spark, [(50, "untracked plain ingest row")])
    eng.ingest(plain, "docs", "plain1")
    assert eng.text_index("d").describe()["n_docs"] == 10
    assert eng.vector_index("v").pq_codes().count() == 10


@pytest.mark.slow
def test_crash_between_index_flips_resolves_exactly_once(
    spark, tmp_path, monkeypatch
):
    """The VERDICT #1 composition contract: a crash AFTER the ledger
    flip and the text index's flip but BEFORE the vector index's flip,
    then a retry with the same token, ends with every store having
    applied the batch exactly once."""
    import queens_spark.store.vector_index as vi

    eng = _engine_with_indexes(spark, tmp_path)
    batch = _frame(
        spark,
        [(20, "crashy document magenta"), (21, "crashy document teal")],
    )
    real = vi.append_vector_index

    def boom(*a, **k):
        raise RuntimeError("simulated crash before the vector flip")

    monkeypatch.setattr(vi, "append_vector_index", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        eng.ingest(
            batch, "docs", "b2",
            dedup_text_col="text", dedup_id_col="doc_id", token="t2",
        )
    # ledger + text index flipped; vector did not
    assert eng.text_index("d").describe()["n_docs"] == 10
    assert eng.vector_index("v").pq_codes().count() == 8
    monkeypatch.setattr(vi, "append_vector_index", real)

    # retry with the SAME token: ledger replays, text no-ops, vector
    # applies — exactly once everywhere
    iid = eng.ingest(
        batch, "docs", "b2",
        dedup_text_col="text", dedup_id_col="doc_id", token="t2",
    )
    assert iid is not None
    tidx = eng.text_index("d")
    vidx = eng.vector_index("v")
    assert tidx.describe()["n_docs"] == 10  # NOT 12: no double-index
    assert vidx.pq_codes().count() == 10
    assert vidx.pq_codes().where(F.col("doc_id") >= 20).count() == 2
    hits = [r["doc"] for r in tidx.bm25_topk(["crashy"], k=5).collect()]
    assert set(hits) == {20, 21}
    # hybrid retrieval over BOTH stored indexes sees the batch
    emb20 = [float((20 + j + 1) % 7 + 1) for j in range(DIM)]
    fused = eng.hybrid_search("d", "v", ["crashy"], emb20, k=4)
    assert {20, 21} <= {r["doc"] for r in fused.collect()}
    # and a THIRD delivery of the same token is a full no-op
    eng.ingest(
        batch, "docs", "b2",
        dedup_text_col="text", dedup_id_col="doc_id", token="t2",
    )
    assert eng.text_index("d").describe()["n_docs"] == 10
    assert eng.vector_index("v").pq_codes().count() == 10


@pytest.mark.slow
def test_cluster_map_registry_refresh_and_crash_retry(
    spark, tmp_path, monkeypatch
):
    """Round-12 composition: a registered kind-"cluster" map refreshes
    inside Engine.ingest like the indexes do, and a crash between the
    ledger flip and the map's flip resolves exactly once on token
    redelivery — with the appended map matching a from-scratch rebuild
    of the full corpus."""
    import queens_spark.store.cluster_map as cms

    eng = _engine_with_indexes(spark, tmp_path)
    seed = _frame(
        spark,
        [(i, f"seed document number {i} alpha beta gamma") for i in range(8)],
    )
    eng.build_cluster_map(seed, "text", "doc_id", "cm", n=1, threshold=0.5)
    with pytest.raises(FileNotFoundError):
        eng.register_index("docs", "cluster", "nope")
    eng.register_index("docs", "cluster", "cm")

    batch = _frame(
        spark,
        [
            (30, "seed document number 0 alpha beta delta"),  # near-dup of 0
            (31, "wholly novel content nothing shared"),
        ],
    )
    real = cms.append_cluster_map

    def boom(*a, **k):
        raise RuntimeError("simulated crash before the cluster flip")

    monkeypatch.setattr(cms, "append_cluster_map", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        eng.ingest(
            batch, "docs", "b3",
            dedup_text_col="text", dedup_id_col="doc_id", token="t3",
        )
    assert eng.cluster_map("cm").describe()["n_docs"] == 8  # not flipped
    monkeypatch.setattr(cms, "append_cluster_map", real)
    iid = eng.ingest(
        batch, "docs", "b3",
        dedup_text_col="text", dedup_id_col="doc_id", token="t3",
    )
    assert iid is not None
    cm = eng.cluster_map("cm")
    assert cm.describe()["n_docs"] == 10
    members = {r["doc_id"]: r["component_id"] for r in cm.members().collect()}
    assert members[30] == members[0]  # near-dup joined doc 0's cluster
    # third delivery of the token: full no-op
    eng.ingest(
        batch, "docs", "b3",
        dedup_text_col="text", dedup_id_col="doc_id", token="t3",
    )
    assert eng.cluster_map("cm").describe()["n_docs"] == 10
    # the appended map equals a from-scratch rebuild of the union
    rebuilt = cms.build_cluster_map(
        seed.union(batch.select("doc_id", "text", "embedding")).select(
            "doc_id", "text"
        ),
        "text", "doc_id", str(tmp_path / "rebuild"),
        n=1, threshold=0.5, max_df=cm.entry["max_df"],
    )
    assert sorted(
        (r["doc_id"], r["component_id"]) for r in cm.members().collect()
    ) == sorted(
        (r["doc_id"], r["component_id"]) for r in rebuilt.members().collect()
    )


@pytest.mark.slow
def test_retire_and_fragmentation_probe_with_all_kinds(spark, tmp_path):
    """Every registry verb must dispatch all five kinds: retirement
    decrements ECDF grids from the warehouse's doomed rows (here the
    retired doc was never warehouse-ingested, so the decrement is
    exactly 0 rows — never a mis-route into the vector-delete path),
    RETIRES from registered cluster maps (takedown-visible serving),
    and the fragmentation probe counts cluster-map delta segments."""
    eng = _engine_with_indexes(spark, tmp_path)
    seed = _frame(
        spark,
        [(i, f"seed document number {i} alpha beta gamma") for i in range(8)],
    )
    eng.build_cluster_map(seed, "text", "doc_id", "cm", n=1, threshold=0.5)
    eng.register_index("docs", "cluster", "cm")
    eng.build_ecdf_store(
        seed.withColumn("table_name", F.lit("seed")), "table_name",
        "size(filter(split(text, '\\\\s+'), x -> x != ''))", "lens",
    )
    eng.register_index("docs", "ecdf", "lens")
    batch = _frame(spark, [(60, "wholly new words for the probe test")])
    eng.ingest(
        batch.withColumn("table_name", F.lit("b6")), "docs", "b6",
        dedup_text_col="text", dedup_id_col="doc_id", token="t6",
    )
    assert eng._max_registered_segments("docs") >= 2
    report = eng.retire_documents("docs", ids=[3])
    assert "ecdf:lens (decremented 0 rows)" in report["indexes"]
    assert "text:d" in report["indexes"]
    assert "cluster:cm" in report["indexes"]
    # the cluster map retired the doc: members/canonical exclude it
    cm = eng.cluster_map("cm")
    live = {r["doc_id"] for r in cm.members().collect()}
    assert 3 not in live and 60 in live
    assert cm.describe()["retirements"] == 1
    # and fsck stays green on the retired map
    rep = eng.fsck()
    assert rep["error"] == 0, rep["findings"]


def test_engine_stream_ingest_corpus_registry_driven(spark, tmp_path):
    """Registry-driven streaming: micro-batches screen through the
    collection ledger and land in EVERY registered index; re-crawled
    dups never double-index; a no-new-files run changes nothing."""
    eng = _engine_with_indexes(spark, tmp_path)
    src = str(tmp_path / "in")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")
    schema = (
        "doc_id bigint, text string, embedding array<double>"
    )

    def write_file(name, items):
        with open(os.path.join(src, name), "w") as fh:
            for i, t in items:
                fh.write(json.dumps({
                    "doc_id": i, "text": t,
                    "embedding": [
                        float((i + j + 1) % 7 + 1) for j in range(DIM)
                    ],
                }) + "\n")

    def run():
        stream = spark.readStream.schema(schema).json(src)
        q = eng.stream_ingest_corpus(
            stream, "docs", "text", "doc_id", ckpt,
            query_name="qs_reg_stream",
        )
        q.awaitTermination(120)

    write_file("b1.json", [
        (30, "streamed document ochre"),
        (31, "seed document number 2 alpha beta gamma"),  # ledger dup
    ])
    run()
    assert eng.text_index("d").describe()["n_docs"] == 9
    assert eng.vector_index("v").pq_codes().count() == 9

    write_file("b2.json", [
        (40, "streamed document ochre"),  # dup of doc 30
        (41, "streamed document viridian"),
    ])
    run()
    assert eng.text_index("d").describe()["n_docs"] == 10
    assert eng.vector_index("v").pq_codes().count() == 10
    assert [r["doc"] for r in
            eng.text_index("d").bm25_topk(["viridian"], k=3).collect()] \
        == [41]
    run()  # no new files: a third run is a no-op
    assert eng.text_index("d").describe()["n_docs"] == 10

    # an unregistered collection refuses (nothing to keep fresh)
    with pytest.raises(ValueError, match="no indexes registered"):
        eng.stream_ingest_corpus(
            spark.readStream.schema(schema).json(src),
            "other", "text", "doc_id", str(tmp_path / "ckpt2"),
        )


@pytest.mark.slow
def test_stream_ingest_refreshes_cluster_and_ecdf(spark, tmp_path):
    """Streaming composition for the round-12 kinds: micro-batches
    keep the registered cluster map AND ECDF profile fresh through the
    same token-idempotent append chain, exactly once across stream
    restarts."""
    eng = _engine_with_indexes(spark, tmp_path)
    seed = _frame(
        spark,
        [(i, f"seed document number {i} alpha beta gamma") for i in range(8)],
    )
    eng.build_cluster_map(seed, "text", "doc_id", "cm", n=1, threshold=0.5)
    eng.register_index("docs", "cluster", "cm")
    eng.build_ecdf_store(
        seed.withColumn("grp", F.lit("all")),
        "grp",
        "size(filter(split(text, '\\\\s+'), x -> x != ''))",
        "lens", width=2, n_buckets=8,
    )
    eng.register_index("docs", "ecdf", "lens")
    src = str(tmp_path / "in")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")
    schema = ("doc_id bigint, text string, grp string, "
              "embedding array<double>")

    def write_file(name, items):
        with open(os.path.join(src, name), "w") as fh:
            for i, t in items:
                fh.write(json.dumps({
                    "doc_id": i, "text": t, "grp": "all",
                    "embedding": [
                        float((i + j + 1) % 7 + 1) for j in range(DIM)
                    ],
                }) + "\n")

    def run():
        stream = spark.readStream.schema(schema).json(src)
        q = eng.stream_ingest_corpus(
            stream, "docs", "text", "doc_id", ckpt,
            query_name="qs_cm_stream",
        )
        q.awaitTermination(120)

    write_file("b1.json", [
        (70, "seed document number 0 alpha beta mauve"),  # near-dups 0
        (71, "seed document number 2 alpha beta gamma"),  # ledger dup
    ])
    run()
    cm = eng.cluster_map("cm")
    assert cm.describe()["n_docs"] == 9  # the exact dup screened out
    members = {r["doc_id"]: r["component_id"]
               for r in cm.members().collect()}
    assert members[70] == members[0]
    assert sum(
        r["n"] for r in eng.ecdf_store("lens").hist().collect()
    ) == 9
    run()  # restart with no new files: everything exactly-once
    assert eng.cluster_map("cm").describe()["n_docs"] == 9
    assert sum(
        r["n"] for r in eng.ecdf_store("lens").hist().collect()
    ) == 9


def test_stream_ingest_corpus_vector_side(spark, tmp_path):
    """The non-Engine streaming builder's vector half: survivors land
    in BOTH indexes under the same token (hybrid freshness)."""
    from queens_spark.store.text_index import build_text_index, load_text_index
    from queens_spark.store.vector_index import (
        build_vector_index,
        load_vector_index,
    )
    from queens_spark.streaming.corpus import stream_ingest_corpus

    seed = _frame(spark, [(i, f"base doc {i} lorem ipsum") for i in range(6)])
    tdir, vdir = str(tmp_path / "t"), str(tmp_path / "v")
    ldir, src = str(tmp_path / "ledger"), str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    build_text_index(seed, "text", "doc_id", "c", tdir)
    build_vector_index(seed, "embedding", "doc_id", "c", vdir)
    from queens_spark.store.dedup_ledger import ingest_deduped

    ingest_deduped(seed, "text", "doc_id", ldir)

    with pytest.raises(ValueError, match="go together"):
        stream_ingest_corpus(
            spark.readStream.schema("doc_id bigint, text string").json(src),
            "text", "doc_id", ldir, tdir, "c", ckpt,
            vector_index_name="c",
        )

    with open(os.path.join(src, "b.json"), "w") as fh:
        for i in (60, 61):
            fh.write(json.dumps({
                "doc_id": i, "text": f"novel stream doc {i}",
                "embedding": [
                    float((i + j + 1) % 7 + 1) for j in range(DIM)
                ],
            }) + "\n")
    q = stream_ingest_corpus(
        spark.readStream.schema(
            "doc_id bigint, text string, embedding array<double>"
        ).json(src),
        "text", "doc_id", ldir, tdir, "c", ckpt,
        vector_index_dir=vdir, vector_index_name="c",
        query_name="qs_vec_stream",
    )
    q.awaitTermination(120)
    assert load_text_index(spark, tdir, "c").describe()["n_docs"] == 8
    assert load_vector_index(spark, vdir, "c").pq_codes().count() == 8


@pytest.mark.slow
def test_maintain_one_call_sweep(spark, tmp_path):
    """Engine.maintain: fragmented-everything ends single-segment,
    tombstone-free, token-free — searches bit-identical — and the
    pending-token gate refuses while the stream is not caught up."""
    eng = _engine_with_indexes(spark, tmp_path)
    for i, tok in ((100, "m1"), (200, "m2")):
        eng.ingest(
            _frame(spark, [(i, f"maint doc {i} umber"),
                           (i + 1, f"maint doc {i + 1} sienna")]),
            "docs", f"t{i}",
            dedup_text_col="text", dedup_id_col="doc_id", token=tok,
        )
    eng.delete_from_text_index("d", ids=[100])
    eng.delete_from_vector_index("v", ids=[100])
    tix, vix = eng.text_index("d"), eng.vector_index("v")
    assert len(tix.entry["segments"]) == 3
    assert tix.entry.get("applied_tokens") == ["m1", "m2"]
    assert tix.entry.get("deletes")

    # a ledger token not yet applied to the indexes: gate refuses
    eng.ingest_deduped(
        _frame(spark, [(300, "maint doc 300 pending")]),
        "text", "doc_id", ledger="docs", token="m3",
    )
    with pytest.raises(ValueError, match="not caught up"):
        eng.maintain("docs")
    # drain: apply m3 to both indexes, then the sweep goes through
    eng._refresh_registered_indexes(
        _frame(spark, [(300, "maint doc 300 pending")]), "docs", "m3"
    )
    tix, vix = eng.text_index("d"), eng.vector_index("v")
    before_bm = tix.bm25_topk(["sienna"], k=5).collect()
    emb = [float((201 + j + 1) % 7 + 1) for j in range(DIM)]
    before_adc = vix.adc_topk(emb, k=5).collect()
    report = eng.maintain("docs")
    assert report["ledger_segments_merged"] == 4  # seed + m1 + m2 + m3
    assert report["compacted"] == ["text:d", "vector:v"]

    tix, vix = eng.text_index("d"), eng.vector_index("v")
    assert len(tix.entry["segments"]) == 1
    assert not tix.entry.get("deletes")
    assert "applied_tokens" not in tix.entry
    assert "applied_tokens" not in vix.entry
    from queens_spark.store.vector_index import _paths

    assert len(_paths(vix.entry["pq_codes_path"])) == 1
    assert not vix.entry.get("deletes_path")
    # searches bit-identical through the sweep (doc 100 still deleted,
    # 300 still served)
    assert tix.bm25_topk(["sienna"], k=5).collect() == before_bm
    assert vix.adc_topk(emb, k=5).collect() == before_adc
    assert [r["doc"] for r in
            tix.bm25_topk(["pending"], k=3).collect()] == [300]
    assert tix.bm25_topk(["umber"], k=3).count() == 1  # only doc 101... 
    # (umber appears in both maint docs 100/101? no: umber only in 100)

    # a replayed token after the sweep re-screens to nothing anywhere
    assert eng.ingest(
        _frame(spark, [(100, "maint doc 100 umber"),
                       (101, "maint doc 101 sienna")]),
        "docs", "t100",
        dedup_text_col="text", dedup_id_col="doc_id", token="m1",
    ) is None
    assert len(eng.text_index("d").entry["segments"]) == 1


@pytest.mark.slow
def test_retire_documents_one_verb_takedown(spark, tmp_path, capsys):
    """Engine.retire_documents: the doc stops serving on BOTH indexes
    immediately, its fingerprint leaves the ledger (equivalent content
    may re-enter), and the next maintain sweep applies everything
    physically."""
    eng = _engine_with_indexes(spark, tmp_path)
    eng.ingest(
        _frame(spark, [(70, "takedown target crimson"),
                       (71, "surviving doc cobalt")]),
        "docs", "b7", dedup_text_col="text", dedup_id_col="doc_id",
    )
    assert [r["doc"] for r in
            eng.text_index("d").bm25_topk(["crimson"], k=3).collect()] \
        == [70]

    report = eng.retire_documents("docs", [70])
    assert report["indexes"] == ["text:d", "vector:v"]
    assert report["ledger_rows_retired"] == 1
    # gone from BM25, gone from ANN, immediately
    assert eng.text_index("d").bm25_topk(["crimson"], k=3).count() == 0
    emb70 = [float((70 + j + 1) % 7 + 1) for j in range(DIM)]
    assert not [
        r for r in eng.vector_index("v").adc_topk(emb70, k=20).collect()
        if r["doc_id"] == 70
    ]
    # re-crawl of the same content under the SAME id is accepted and
    # serves again (ledger + index coverage scoping compose)
    iid = eng.ingest(
        _frame(spark, [(70, "takedown target crimson")]),
        "docs", "b7b", dedup_text_col="text", dedup_id_col="doc_id",
    )
    assert iid is not None
    assert [r["doc"] for r in
            eng.text_index("d").bm25_topk(["crimson"], k=3).collect()] \
        == [70]

    # the sweep applies all tombstones physically
    eng.maintain("docs")
    tix = eng.text_index("d")
    assert len(tix.entry["segments"]) == 1 and not tix.entry.get("deletes")
    assert [r["doc"] for r in
            tix.bm25_topk(["crimson"], k=3).collect()] == [70]

    # CLI surface, with --block: the takedown STAYS down
    from queens_spark.cli import main

    rc = main(["--warehouse", str(tmp_path / "wh"), "retire", "docs",
               "--ids", "71", "--block"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ledger_rows_retired"] == 1
    assert out["blocked_fingerprints"] == 1
    assert eng.text_index("d").bm25_topk(["cobalt"], k=3).count() == 0
    # equivalent content is rejected forever (blocked, not re-accepted)
    assert eng.ingest(
        _frame(spark, [(80, "surviving doc cobalt")]),
        "docs", "b8", dedup_text_col="text", dedup_id_col="doc_id",
    ) is None
    assert eng.text_index("d").bm25_topk(["cobalt"], k=3).count() == 0


def test_retire_by_predicate_retention_flow(spark, tmp_path):
    """Predicate retirement: ids resolve ONCE against the registered
    text index's denormalized metadata, then every store retires the
    same set — the retention/expiry flow with no documents join."""
    eng = Engine(spark, str(tmp_path / "wh"), schemas=docs_schemas())
    seed = spark.createDataFrame([
        Row(doc_id=i,
            text=f"doc {i} payload topic{i % 3}",
            lang=("xx" if i % 3 == 0 else "en"),
            embedding=[float((i + j + 1) % 7 + 1) for j in range(DIM)])
        for i in range(9)
    ])
    eng.build_text_index(seed, "text", "doc_id", "d", meta_cols=["lang"])
    eng.build_vector_index(seed, "embedding", "doc_id", "v")
    eng.ingest_deduped(seed, "text", "doc_id", ledger="docs")
    eng.register_index("docs", "text", "d")
    eng.register_index("docs", "vector", "v")

    with pytest.raises(ValueError, match="exactly one"):
        eng.retire_documents("docs")
    report = eng.retire_documents("docs", predicate="lang = 'xx'")
    assert report["retired_count"] == 3  # docs 0, 3, 6
    assert report["ledger_rows_retired"] == 3
    # gone from BOTH stores
    assert eng.text_index("d").describe()["n_docs"] == 6
    assert eng.text_index("d").bm25_topk(["topic0"], k=5).count() == 0
    assert eng.vector_index("v").pq_codes().where(
        F.col("doc_id").isin([0, 3, 6])).count() == 0
    # a no-match predicate is a clean no-op
    assert eng.retire_documents(
        "docs", predicate="lang = 'zz'")["retired_count"] == 0


@pytest.mark.slow
def test_stream_auto_maintains_past_segment_cap(spark, tmp_path):
    """auto_maintain_segments: the stream sweeps ITSELF — after a
    batch pushes any registered index past the cap, maintain() runs
    inside foreachBatch (caught up by construction), so segment lists
    and token maps stay bounded without a scheduled job."""
    eng = _engine_with_indexes(spark, tmp_path)
    src = str(tmp_path / "in")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id bigint, text string, embedding array<double>"

    def write_file(name, items):
        with open(os.path.join(src, name), "w") as fh:
            for i, t in items:
                fh.write(json.dumps({
                    "doc_id": i, "text": t,
                    "embedding": [
                        float((i + j + 1) % 7 + 1) for j in range(DIM)
                    ],
                }) + "\n")

    def run():
        q = eng.stream_ingest_corpus(
            spark.readStream.schema(schema).json(src),
            "docs", "text", "doc_id", ckpt,
            query_name="qs_auto_maint", auto_maintain_segments=2,
        )
        q.awaitTermination(120)

    for n, i in (("a", 300), ("b", 301), ("c", 302)):
        write_file(f"{n}.json", [(i, f"auto maint doc {i} {n*3}")])
        run()
    tix = eng.text_index("d")
    # without the sweep this would be 1 seed + 3 appends = 4 segments
    assert len(tix.entry["segments"]) <= 2
    assert "applied_tokens" not in tix.entry or \
        len(tix.entry.get("applied_tokens") or []) <= 2
    assert tix.describe()["n_docs"] == 11
    assert [r["doc"] for r in
            tix.bm25_topk(["maint", "ccc"], k=3).collect()][:1] == [302]
    assert eng.vector_index("v").pq_codes().count() == 11


def test_search_page_one_verb_with_snippets(spark, tmp_path):
    """Engine.search_page: fused hybrid page + per-hit highlight
    windows, all stored-index reads; vector-only hits carry NULL
    windows."""
    eng = Engine(spark, str(tmp_path / "wh"), schemas=docs_schemas())
    seed = _frame(spark, [
        (i, f"corpus doc {i} filler words " + ("amaranth " * (i % 3)))
        for i in range(10)
    ])
    eng.build_text_index(seed, "text", "doc_id", "d", positions=True)
    eng.build_vector_index(seed, "embedding", "doc_id", "v")

    emb3 = [float((3 + j + 1) % 7 + 1) for j in range(DIM)]
    page = eng.search_page(
        "d", "v", ["amaranth"], emb3, k=6, pool=8, snippet_window=4,
    ).collect()
    assert len(page) >= 3
    by_doc = {r["doc"]: r for r in page}
    # lexical hits carry a window over the amaranth run
    lex = [r for r in page if r["rank_0"] is not None]
    assert lex and all(r["n_hits"] >= 1 for r in lex)
    assert all(r["window_start"] >= 5 for r in lex)  # after the filler
    # vector-only hits have no term to highlight
    vec_only = [r for r in page if r["rank_0"] is None]
    assert all(r["n_hits"] is None for r in vec_only)
    # fused order preserved after the snippet join
    scores = [r["rrf_e12"] for r in page]
    assert scores == sorted(scores, reverse=True)
    # no snippet request -> plain hybrid page
    plain = eng.search_page("d", "v", ["amaranth"], emb3, k=3).columns
    assert "window_start" not in plain


def test_ingest_preflights_revised_ids_before_any_side_effect(
    spark, tmp_path
):
    """A re-crawled id with EDITED text passes the ledger's content
    screen but would corrupt a registered cluster map — the round-12
    failure mode fired AFTER the ledger flip, stranding the
    composition. The check now runs BEFORE any side effect: the
    rejected batch leaves ledger, profile, warehouse, and every index
    untouched (the max_drift precedent)."""
    eng = _engine_with_indexes(spark, tmp_path)
    seed = _frame(
        spark,
        [(i, f"seed document number {i} alpha beta gamma") for i in range(8)],
    )
    eng.build_cluster_map(seed, "text", "doc_id", "cm", n=1, threshold=0.5)
    eng.register_index("docs", "cluster", "cm")
    revised = _frame(spark, [(3, "wholly revised text for doc three")])
    before_versions = eng.get_versions("docs").count()
    with pytest.raises(ValueError, match="before any side effect"):
        eng.ingest(
            revised, "docs", "rev1",
            dedup_text_col="text", dedup_id_col="doc_id", token="trev",
        )
    # zero side effects: warehouse version count, indexes, map, and the
    # ledger (the revised text still screens as FRESH → never recorded)
    assert eng.get_versions("docs").count() == before_versions
    assert eng.text_index("d").describe()["n_docs"] == 8
    assert eng.cluster_map("cm").describe()["segments"] == 1
    _, stats = eng.ingest_deduped(
        _frame(spark, [(99, "wholly revised text for doc three")]),
        "text", "doc_id", ledger="docs",
    )
    assert stats["accepted"] == 1  # the text never entered the ledger


@pytest.mark.slow
def test_ingest_token_redelivery_skips_preflight(spark, tmp_path):
    """A REDELIVERED token replays the whole chain idempotently: its
    ids are already live in the map, so the pre-flight must stand
    aside (the ledger remembers the token) instead of rejecting the
    legitimate retry."""
    eng = _engine_with_indexes(spark, tmp_path)
    seed = _frame(
        spark,
        [(i, f"seed document number {i} alpha beta gamma") for i in range(8)],
    )
    eng.build_cluster_map(seed, "text", "doc_id", "cm", n=1, threshold=0.5)
    eng.register_index("docs", "cluster", "cm")
    batch = _frame(spark, [(70, "redelivered content emerald")])
    eng.ingest(
        batch, "docs", "rb1",
        dedup_text_col="text", dedup_id_col="doc_id", token="tr1",
    )
    segs = eng.cluster_map("cm").describe()["segments"]
    # full redelivery with the same token: no clash error, no growth
    eng.ingest(
        batch, "docs", "rb1",
        dedup_text_col="text", dedup_id_col="doc_id", token="tr1",
    )
    assert eng.cluster_map("cm").describe()["segments"] == segs
    assert eng.text_index("d").describe()["n_docs"] == 9


@pytest.mark.slow
def test_revision_route_retire_then_reingest_converges(spark, tmp_path):
    """The documented revision route: retire the old ids, re-offer the
    revised batch under the SAME ids — the map then equals a rebuild
    on the revised corpus, and the lexical index serves the new
    content."""
    eng = _engine_with_indexes(spark, tmp_path)
    seed = _frame(
        spark,
        [(i, f"seed document number {i} alpha beta gamma") for i in range(8)],
    )
    eng.build_cluster_map(seed, "text", "doc_id", "cm", n=1, threshold=0.5)
    eng.register_index("docs", "cluster", "cm")
    eng.retire_documents("docs", ids=[3])
    revised = _frame(spark, [(3, "revised doc three cobalt narwhal")])
    iid = eng.ingest(
        revised, "docs", "rev3",
        dedup_text_col="text", dedup_id_col="doc_id", token="trv",
    )
    assert iid is not None
    cm = eng.cluster_map("cm")
    from queens_spark.store.cluster_map import build_cluster_map

    final = seed.where(F.col("doc_id") != 3).union(revised).select(
        "doc_id", "text"
    )
    rebuilt = build_cluster_map(
        final, "text", "doc_id", str(tmp_path / "rb"),
        n=1, threshold=0.5, max_df=int(cm.entry["max_df"]),
    )
    assert sorted(
        (r["doc_id"], r["component_id"]) for r in cm.members().collect()
    ) == sorted(
        (r["doc_id"], r["component_id"])
        for r in rebuilt.members().collect()
    )
    hits = [
        r["doc"]
        for r in eng.text_index("d").bm25_topk(["narwhal"], k=3).collect()
    ]
    assert hits == [3]


@pytest.mark.slow
def test_engine_status_freshness_audit(
    spark, tmp_path, capsys, monkeypatch
):
    """Engine.status — the operability triangle's third leg: pure
    manifest reads reporting per-store fragmentation and
    behind-the-ledger-head staleness; a crash mid-chain shows up as a
    stale store with the stranded token listed, and token redelivery
    heals it."""
    import queens_spark.store.ecdf_store as es
    from queens_spark.cli import main

    eng = _engine_with_indexes(spark, tmp_path)
    seed = _frame(
        spark,
        [(i, f"seed document number {i} alpha beta gamma") for i in range(8)],
    )
    eng.build_cluster_map(seed, "text", "doc_id", "cm", n=1, threshold=0.5)
    eng.register_index("docs", "cluster", "cm")
    batch = _frame(spark, [(80, "status probe content opaline")])
    eng.ingest(
        batch, "docs", "s1",
        dedup_text_col="text", dedup_id_col="doc_id", token="ts1",
    )
    rep = eng.status("docs")
    assert rep["ledger"]["tokens"] == 1
    assert rep["stale_stores"] == []  # every store applied ts1
    assert rep["rollups"] == []  # none registered
    by = {f"{r['kind']}:{r['name']}": r for r in rep["stores"]}
    assert by["cluster:cm"]["segments"] == 2
    assert by["cluster:cm"]["fragmented"] is True
    # maintain folds the fragmentation and clears token bookkeeping
    eng.maintain("docs")
    rep = eng.status("docs")
    assert rep["ledger"]["tokens"] == 0
    assert not any(r["fragmented"] for r in rep["stores"]
                   if r["kind"] == "cluster")

    # a crash BEFORE the last store's flip leaves it stale — status
    # names the store and the stranded token
    eng.build_ecdf_store(
        seed.withColumn("table_name", F.lit("s")), "table_name",
        "length(text)", "lens2",
    )
    eng.register_index("docs", "ecdf", "lens2")
    real = es.append_ecdf_store

    def boom(*a, **k):
        raise RuntimeError("simulated crash before the ecdf flip")

    monkeypatch.setattr(es, "append_ecdf_store", boom)
    b2 = _frame(spark, [(81, "second status probe vermilion")]).withColumn(
        "table_name", F.lit("s2")
    )
    with pytest.raises(RuntimeError, match="simulated crash"):
        eng.ingest(
            b2, "docs", "s2",
            dedup_text_col="text", dedup_id_col="doc_id", token="ts2",
        )
    monkeypatch.setattr(es, "append_ecdf_store", real)
    rep = eng.status("docs")
    # appends run in (kind, name) order: cluster applied BEFORE the
    # ecdf crash; text/vector never ran — all three show stale with
    # the stranded token named
    assert rep["stale_stores"] == ["ecdf:lens2", "text:d", "vector:v"]
    for r in rep["stores"]:
        assert r["pending_tokens"] == (
            [] if r["name"] == "cm" else ["ts2"]
        ), r
    monkeypatch.setenv("QUEENS_SPARK_WAREHOUSE", eng.warehouse.root)
    assert main(["status", "docs"]) == 1  # stale → nonzero exit
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["stale_stores"] == ["ecdf:lens2", "text:d", "vector:v"]
    # redelivery heals: the chain replays exactly-once, status clears
    eng.ingest(
        b2, "docs", "s2",
        dedup_text_col="text", dedup_id_col="doc_id", token="ts2",
    )
    assert eng.status("docs")["stale_stores"] == []
    assert main(["status", "docs"]) == 0


@pytest.mark.slow
def test_preflight_passes_unchanged_content_reoffers(spark, tmp_path):
    """The pre-flight is CONTENT-AWARE: a tokenless at-least-once
    producer re-offering UNCHANGED content with live ids still screens
    to accepted=0 and returns None (the documented no-op), and a token
    replay arriving AFTER maintain() compacted the ledger's token map
    still re-screens to a no-op — neither raises."""
    eng = _engine_with_indexes(spark, tmp_path)
    seed = _frame(
        spark,
        [(i, f"seed document number {i} alpha beta gamma") for i in range(8)],
    )
    eng.build_cluster_map(seed, "text", "doc_id", "cm", n=1, threshold=0.5)
    eng.register_index("docs", "cluster", "cm")
    batch = _frame(spark, [(90, "at least once content celadon")])
    eng.ingest(
        batch, "docs", "p1",
        dedup_text_col="text", dedup_id_col="doc_id", token="tp1",
    )
    # (a) tokenless re-offer, ids live, content unchanged → None
    assert eng.ingest(
        batch, "docs", "p1",
        dedup_text_col="text", dedup_id_col="doc_id",
    ) is None
    # (b) maintain compacts ledger + clears token maps; a late replay
    # of the ORIGINAL token must still be a quiet no-op
    eng.maintain("docs")
    segs = eng.cluster_map("cm").describe()["segments"]
    assert eng.ingest(
        batch, "docs", "p1",
        dedup_text_col="text", dedup_id_col="doc_id", token="tp1",
    ) is None
    assert eng.cluster_map("cm").describe()["segments"] == segs
    # a genuinely REVISED id still rejects before any side effect
    revised = _frame(spark, [(90, "revised celadon content entirely")])
    with pytest.raises(ValueError, match="CHANGED content"):
        eng.ingest(
            revised, "docs", "p2",
            dedup_text_col="text", dedup_id_col="doc_id",
        )
