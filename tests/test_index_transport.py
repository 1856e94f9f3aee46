"""Index transport: export a stored index as a relocatable bundle,
import it into another warehouse — searches bit-identical, no corpus
touch, no rebuild."""

import os

import pytest
from pyspark.sql import functions as F

from queens_spark.facade import Engine

DOCS = "/root/testdata/sf0.001/documents.parquet"
EMB = "/root/testdata/sf0.001/embeddings.parquet"


def test_text_index_export_import_roundtrip(spark, tmp_path):
    docs = spark.read.parquet(DOCS)
    src_eng = Engine(spark, str(tmp_path / "staging"))
    src_eng.build_text_index(
        docs.where(F.col("doc_id") < 300), "text", "doc_id", "d",
        positions=True,
    )
    # a multi-segment index with a tombstone travels as-is
    src_eng.append_text_index(docs.where(F.col("doc_id") >= 300), "d")
    src_eng.delete_from_text_index("d", ids=[42])
    before = src_eng.text_index("d").bm25_topk(
        ["dup", "spark"], k=10).collect()

    bundle = str(tmp_path / "bundle")
    src_eng.export_index("text", "d", bundle)
    assert os.path.exists(os.path.join(bundle, "bundle.json"))
    with pytest.raises(ValueError, match="already holds"):
        src_eng.export_index("text", "d", bundle)
    with pytest.raises(KeyError):
        src_eng.export_index("text", "nope", str(tmp_path / "b2"))

    prod_eng = Engine(spark, str(tmp_path / "prod"))
    assert prod_eng.import_index(bundle) == "d"
    idx = prod_eng.text_index("d")
    assert idx.bm25_topk(["dup", "spark"], k=10).collect() == before
    assert idx.describe()["tombstone_segments"] == 1
    # positional serving travels too
    assert idx.phrase_topk(["table", "hash"], k=3).count() >= 0
    # importing under a new name
    assert prod_eng.import_index(bundle, name="d2") == "d2"
    assert prod_eng.text_index("d2").bm25_topk(
        ["dup", "spark"], k=10).collect() == before
    # re-import over an existing name supersedes (version bump)
    assert prod_eng.import_index(bundle) == "d"
    assert prod_eng.text_index("d").entry["version"] == 2


def test_vector_index_export_import_roundtrip(spark, tmp_path):
    emb = spark.read.parquet(EMB)
    src_eng = Engine(spark, str(tmp_path / "staging"))
    cents = [r[0] for r in emb.where(F.col("vec_id") % 200 == 0)
             .select("vec_id").collect()]
    src_eng.build_vector_index(
        emb, "embedding", "vec_id", "e", centroid_ids=cents,
    )
    qvec = [float(x) for x in
            emb.where(F.col("vec_id") == 7).first()["embedding"]]
    before_adc = src_eng.vector_index("e").adc_topk(qvec, k=5).collect()
    before_ivf = src_eng.vector_index("e").ivfpq_topk(
        qvec, n_probe=2, k=5).collect()

    bundle = str(tmp_path / "bundle")
    src_eng.export_index("vector", "e", bundle)
    prod_eng = Engine(spark, str(tmp_path / "prod"))
    prod_eng.import_index(bundle)
    idx = prod_eng.vector_index("e")
    assert idx.adc_topk(qvec, k=5).collect() == before_adc
    assert idx.ivfpq_topk(qvec, n_probe=2, k=5).collect() == before_ivf
    # the imported index keeps living its lifecycle: append + compact
    from queens_spark.store.vector_index import compact_vector_index

    compacted = compact_vector_index(
        spark, os.path.join(str(tmp_path / "prod"), "system",
                            "vector_index"), "e",
    )
    assert compacted.adc_topk(qvec, k=5).collect() == before_adc


def test_cli_export_import(spark, tmp_path, capsys):
    import json

    from queens_spark.cli import main

    docs = spark.read.parquet(DOCS)
    staging = str(tmp_path / "staging")
    Engine(spark, staging).build_text_index(docs, "text", "doc_id", "d")
    bundle = str(tmp_path / "bundle")
    rc = main(["--warehouse", staging, "index-export", "text", "d",
               bundle])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["exported"] == "d"
    prod = str(tmp_path / "prod")
    rc = main(["--warehouse", prod, "index-import", bundle])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["imported"] == "d"
    assert Engine(spark, prod).text_index("d").bm25_topk(
        ["dup"], k=3).count() == 3


def test_capped_index_transport_preserves_contract(spark, tmp_path):
    """A df-capped index travels with its cap AND its pre-cap stats:
    the destination serves bit-identical scores and appends keep
    applying the stored ratio."""
    from queens_spark.store.text_index import append_text_index

    docs = spark.read.parquet(DOCS)
    src_eng = Engine(spark, str(tmp_path / "staging"))
    src_eng.build_text_index(
        docs.where(F.col("doc_id") < 300), "text", "doc_id", "c",
        max_df_ratio=0.5,
    )
    before = src_eng.text_index("c").bm25_topk(["dup"], k=5).collect()
    bundle = str(tmp_path / "bundle")
    src_eng.export_index("text", "c", bundle)

    prod = str(tmp_path / "prod")
    prod_eng = Engine(spark, prod)
    prod_eng.import_index(bundle)
    idx = prod_eng.text_index("c")
    assert idx.entry["max_df_ratio"] == 0.5
    assert idx.bm25_topk(["dup"], k=5).collect() == before
    # appends at the destination keep the cap
    idx2 = append_text_index(
        docs.where(F.col("doc_id") >= 300), "c",
        f"{prod}/system/text_index",
    )
    n = idx2.stats()[0]
    hot = idx2.token_stats(top=1).collect()[0]
    assert hot["df_docs"] <= 0.5 * n


def test_training_run_export_import_roundtrip(spark, tmp_path):
    """Round-12 #5: a release bundle (packed shards + attached report
    + checksums) ships between warehouses as one verb, and verify()
    holds on the imported side — the checksums describe the shipped
    bytes, not the source warehouse."""
    docs = spark.read.parquet(DOCS).where(F.col("doc_id") < 120)
    src_eng = Engine(spark, str(tmp_path / "staging"))
    rel = src_eng.export_release(
        docs, "text", "doc_id", "run1",
        source_col="source", seq_len=64, n_shards=2,
    )
    assert set(rel["report"]) >= {"funnel", "duplication", "vocabulary"}
    run_src = src_eng.training_run("run1")
    epoch_before = [
        r["seq_id"]
        for r in run_src.epoch("seed-7").select("seq_id").collect()
    ]

    bundle = str(tmp_path / "bundle")
    src_eng.export_run("run1", bundle)
    assert os.path.exists(os.path.join(bundle, "bundle.json"))
    with pytest.raises(ValueError, match="already holds"):
        src_eng.export_run("run1", bundle)

    prod_eng = Engine(spark, str(tmp_path / "prod"))
    assert prod_eng.import_run(bundle) == "run1"
    run = prod_eng.training_run("run1")
    # integrity: shard counters + checksums + report tables all green
    assert all(v == "ok" for v in run.verify().values())
    # the report traveled and reads back
    assert "report" in run.entry and run.entry["report"]
    # deterministic epoch order is engine-portable: same seed, same order
    assert [
        r["seq_id"] for r in run.epoch("seed-7").select("seq_id").collect()
    ] == epoch_before
    # import under a new name + supersede-on-reimport (version bump)
    assert prod_eng.import_run(bundle, name="run2") == "run2"
    assert all(
        v == "ok" for v in prod_eng.training_run("run2").verify().values()
    )
    assert prod_eng.import_run(bundle) == "run1"
    assert prod_eng.training_run("run1").entry["version"] == 2
    assert prod_eng.fsck()["healthy"]
