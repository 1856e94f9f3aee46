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


def test_sketch_and_ecdf_store_transport_roundtrip(spark, tmp_path):
    """Single-artifact stores ship with the same rebase treatment —
    serves bit-identical, appends keep working on the imported side."""
    src_eng = Engine(spark, str(tmp_path / "staging"))
    rows = spark.createDataFrame(
        [("a", v) for v in range(30)] + [("b", v) for v in range(10, 50)],
        "g string, v bigint",
    )
    src_eng.build_sketch_store(rows, "g", "v", "s", k=8)
    src_eng.build_ecdf_store(rows, "g", "v + 0", "e", width=5,
                             n_buckets=12)
    sk_before = sorted(map(tuple, src_eng.sketch_store("s")
                           .distinct_estimates().collect()))
    ec_before = sorted(map(tuple, src_eng.ecdf_store("e").cdf().collect()))

    b1, b2 = str(tmp_path / "b1"), str(tmp_path / "b2")
    src_eng.export_index("sketch", "s", b1)
    src_eng.export_index("ecdf", "e", b2)
    prod_eng = Engine(spark, str(tmp_path / "prod"))
    assert prod_eng.import_index(b1) == "s"
    assert prod_eng.import_index(b2) == "e"
    assert sorted(map(tuple, prod_eng.sketch_store("s")
                      .distinct_estimates().collect())) == sk_before
    assert sorted(map(tuple, prod_eng.ecdf_store("e")
                      .cdf().collect())) == ec_before
    # appends keep working on the imported side (destination versions)
    more = spark.createDataFrame([("a", 999)], "g string, v bigint")
    prod_eng.append_sketch_store(more, "s", token="t1")
    prod_eng.append_ecdf_store(more, "e", token="t1")
    assert prod_eng.fsck()["healthy"]


@pytest.mark.slow
def test_cluster_map_transport_appendable_roundtrip(spark, tmp_path):
    """The cluster map ships WITH its match artifacts, so the
    destination warehouse appends new batches without reclustering —
    and the appended result still equals a full rebuild of the union."""
    from queens_spark.store.cluster_map import build_cluster_map

    A = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (4, "p q r s"), (5, "p q r t")],
        ["doc_id", "text"],
    )
    B = spark.createDataFrame([(7, "a b c d p q r s")], ["doc_id", "text"])
    src_eng = Engine(spark, str(tmp_path / "staging"))
    src_eng.build_cluster_map(A, "text", "doc_id", "cm", n=1,
                              threshold=0.5, max_df=10)
    bundle = str(tmp_path / "bundle")
    src_eng.export_map("cm", bundle)
    with pytest.raises(ValueError, match="already holds"):
        src_eng.export_map("cm", bundle)

    prod_eng = Engine(spark, str(tmp_path / "prod"))
    assert prod_eng.import_map(bundle) == "cm"
    cm = prod_eng.append_cluster_map(B, "cm", token="t1")
    rebuilt = build_cluster_map(
        A.union(B), "text", "doc_id", str(tmp_path / "rebuild"),
        n=1, threshold=0.5, max_df=10,
    )
    for table in ("members", "canonical", "edges"):
        assert sorted(map(tuple, getattr(cm, table)().collect())) == \
            sorted(map(tuple, getattr(rebuilt, table)().collect())), table
    # tokens did not travel; re-import over an existing name supersedes
    assert cm.entry["applied_tokens"] == ["t1"]
    assert prod_eng.import_map(bundle) == "cm"
    assert prod_eng.cluster_map("cm").describe()["n_docs"] == 4
    assert prod_eng.fsck()["healthy"]


@pytest.mark.slow
def test_retired_cluster_map_transport(spark, tmp_path):
    """A map carrying retirement tombstones travels whole: the
    destination serves the retired view, keeps appending exactly, and
    its compaction applies the shipped tombstones physically."""
    from queens_spark.store.cluster_map import (
        build_cluster_map,
        compact_cluster_map,
    )

    A = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "a b c f"), (4, "p q r s")],
        ["doc_id", "text"],
    )
    src_eng = Engine(spark, str(tmp_path / "staging"))
    src_eng.build_cluster_map(A, "text", "doc_id", "cm", n=1,
                              threshold=0.5, max_df=10)
    src_eng.retire_from_cluster_map("cm", [2])
    bundle = str(tmp_path / "bundle")
    src_eng.export_map("cm", bundle)

    prod_eng = Engine(spark, str(tmp_path / "prod"))
    assert prod_eng.import_map(bundle) == "cm"
    cm = prod_eng.cluster_map("cm")
    assert cm.describe()["retirements"] == 1
    assert 2 not in {r["doc_id"] for r in cm.members().collect()}
    B = spark.createDataFrame([(9, "p q r u")], ["doc_id", "text"])
    cm = prod_eng.append_cluster_map(B, "cm", token="t1")
    rebuilt = build_cluster_map(
        A.where(F.col("doc_id") != 2).union(B), "text", "doc_id",
        str(tmp_path / "rebuild"), n=1, threshold=0.5, max_df=10,
    )
    for table in ("members", "canonical", "edges"):
        assert sorted(map(tuple, getattr(cm, table)().collect())) == \
            sorted(map(tuple, getattr(rebuilt, table)().collect())), table
    import os

    d = os.path.join(prod_eng._cluster_maps_dir(), "cm")
    assert compact_cluster_map(spark, d) == 3
    cm2 = prod_eng.cluster_map("cm")
    assert cm2.describe()["retirements"] == 0
    assert sorted(map(tuple, cm2.members().collect())) == \
        sorted(map(tuple, rebuilt.members().collect()))
    assert prod_eng.fsck()["healthy"]
