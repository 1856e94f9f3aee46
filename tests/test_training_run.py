"""Persisted training runs (store/training_run.py): build → manifest
→ verify → epoch order lifecycle."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from queens_spark.store.training_run import (
    build_training_run,
    load_training_run,
)

DOCS = [
    (i, "en" if i % 3 else "de", " ".join(f"w{i}t{j}" for j in range(3 + i % 7)))
    for i in range(40)
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "lang", "text"])


@pytest.fixture()
def runs_dir(tmp_path):
    return str(tmp_path / "runs")


def test_build_manifest_and_verify(spark, docs, runs_dir):
    run = build_training_run(
        docs, "text", "doc_id", "demo", runs_dir,
        seq_len=16, n_shards=4, stratum_col="lang",
    )
    e = run.entry
    assert e["seq_len"] == 16 and e["n_shards"] == 4
    total_tokens = sum(len(t.split()) for _, _, t in DOCS)
    assert e["n_tokens"] == total_tokens  # every token lands exactly once
    assert sum(s["n_seqs"] for s in e["shards"].values()) == e["n_seqs"]
    # round-robin balance: per stratum ±1 → overall spread ≤ n_strata
    counts = [s["n_seqs"] for s in e["shards"].values()]
    assert max(counts) - min(counts) <= 2
    assert set(run.verify().values()) == {"ok"}


def test_reader_and_sequence_shape(spark, docs, runs_dir):
    build_training_run(
        docs, "text", "doc_id", "demo", runs_dir,
        seq_len=16, n_shards=4, stratum_col="lang",
    )
    run = load_training_run(spark, os.path.join(runs_dir, "demo"))
    seqs = run.sequences().collect()
    by_stratum: dict[str, list] = {}
    for r in seqs:
        by_stratum.setdefault(r["lang"], []).append(r)
    for lang, rows in by_stratum.items():
        rows.sort(key=lambda r: r["seq_id"])
        for r in rows[:-1]:
            assert len(r["toks"]) == 16  # full except stratum-final
        # spans tile each sequence exactly
        for r in rows:
            covered = sorted((s["pos"], s["len"]) for s in r["doc_spans"])
            cursor = 0
            for pos, ln in covered:
                assert pos == cursor
                cursor += ln
            assert cursor == len(r["toks"])
    # shard pruning reads one shard only
    one = run.sequences(shard=2)
    assert {r["shard"] for r in one.collect()} <= {2}


def test_determinism_and_versioning(spark, docs, runs_dir):
    r1 = build_training_run(
        docs, "text", "doc_id", "demo", runs_dir,
        seq_len=16, n_shards=4, stratum_col="lang",
    )
    ck1 = {k: v["checksum"] for k, v in r1.entry["shards"].items()}
    r2 = build_training_run(
        docs, "text", "doc_id", "demo", runs_dir,
        seq_len=16, n_shards=4, stratum_col="lang",
    )
    ck2 = {k: v["checksum"] for k, v in r2.entry["shards"].items()}
    assert ck1 == ck2  # bit-identical rebuild
    assert r2.entry["version"] == r1.entry["version"] + 1
    # superseded version dir GC'd; reader serves the current one
    vdirs = [d for d in os.listdir(os.path.join(runs_dir, "demo")) if d.startswith("v")]
    assert vdirs == [r2.entry["dir"]]


def test_epoch_order_deterministic(spark, docs, runs_dir):
    run = build_training_run(
        docs, "text", "doc_id", "demo", runs_dir,
        seq_len=16, n_shards=4, stratum_col="lang",
    )
    a = [(r["lang"], r["seq_id"]) for r in run.epoch("s0").collect()]
    b = [(r["lang"], r["seq_id"]) for r in run.epoch("s0").collect()]
    c = [(r["lang"], r["seq_id"]) for r in run.epoch("s1").collect()]
    assert a == b
    assert sorted(a) == sorted(c)


def test_verify_detects_tamper(spark, docs, runs_dir):
    run = build_training_run(
        docs, "text", "doc_id", "demo", runs_dir,
        seq_len=16, n_shards=2, stratum_col="lang",
    )
    # simulate a corrupted/short download: drop one shard's files
    data_dir = os.path.join(runs_dir, "demo", run.entry["dir"], "data")
    import shutil

    shutil.rmtree(os.path.join(data_dir, "shard=1"))
    out = run.verify()
    assert out["0"] == "ok"
    assert out["1"].startswith("MISMATCH")


def test_engine_verb(spark, docs, tmp_path):
    from queens_spark.facade import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    eng.export_training_run(
        docs, "text", "doc_id", "r11", seq_len=16, n_shards=2,
        stratum_col="lang",
    )
    run = eng.training_run("r11")
    assert set(run.verify().values()) == {"ok"}
    assert run.entry["n_tokens"] == sum(len(t.split()) for _, _, t in DOCS)


def test_trun_cli(spark, docs, tmp_path, capsys):
    import json

    from queens_spark.cli import main

    root = str(tmp_path / "wh")
    corpus = str(tmp_path / "corpus.parquet")
    docs.write.parquet(corpus)
    rc = main(["--warehouse", root, "trun", "build", "r11",
               "--corpus", corpus, "--stratum-col", "lang",
               "--seq-len", "16", "--n-shards", "2"])
    assert rc == 0
    entry = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert entry["n_shards"] == 2 and entry["n_tokens"] > 0

    assert main(["--warehouse", root, "trun", "verify", "r11"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(out.values()) == {"ok"}

    assert main(["--warehouse", root, "trun", "describe", "r11"]) == 0
    desc = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert desc["current"]["seq_len"] == 16

    assert main(["--warehouse", root, "trun", "epoch", "r11",
                 "--seed", "s0", "--head", "3"]) == 0
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(rows) == 3 and "order_hash" in rows[0]


def test_crashed_build_retry_succeeds(spark, docs, runs_dir):
    """A build that dies after writing data but before the manifest
    flip leaves an orphan vdir the manifest never points at; the
    retry must clear it and succeed (the flip-last contract's other
    half)."""
    run = build_training_run(
        docs, "text", "doc_id", "demo", runs_dir,
        seq_len=16, n_shards=2, stratum_col="lang",
    )
    # simulate: orphan dir for the NEXT version, manifest not advanced
    nxt = os.path.join(
        runs_dir, "demo", f"v{run.entry['version'] + 1:06d}", "data"
    )
    os.makedirs(nxt)
    with open(os.path.join(nxt, "part-junk.parquet"), "w") as fh:
        fh.write("crashed")
    r2 = build_training_run(
        docs, "text", "doc_id", "demo", runs_dir,
        seq_len=16, n_shards=2, stratum_col="lang",
    )
    assert r2.entry["version"] == run.entry["version"] + 1
    assert set(r2.verify().values()) == {"ok"}


def test_export_release_bundles_run_and_report(spark, docs, tmp_path):
    from queens_spark.facade import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    out = eng.export_release(
        docs.withColumnRenamed("lang", "source"), "text", "doc_id",
        "drop-1", source_col="source", seq_len=16, n_shards=2,
    )
    assert out["run"]["n_tokens"] == sum(len(t.split()) for _, _, t in DOCS)
    assert set(out["report"]) == {
        "funnel", "duplication", "vocabulary", "composition"
    }
    comp = spark.read.parquet(out["report"]["composition"]).collect()
    assert {r["source"] for r in comp} == {"en", "de"}
    # the bundle lives inside the run's version dir: one download
    run = eng.training_run("drop-1")
    assert set(run.verify().values()) == {"ok"}
    for p in out["report"].values():
        assert p.startswith(os.path.join(run.run_dir, run.entry["dir"]))


def test_release_report_covered_by_verify(spark, docs, tmp_path):
    import shutil

    from queens_spark.facade import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    out = eng.export_release(
        docs.withColumnRenamed("lang", "source"), "text", "doc_id",
        "drop-2", source_col="source", seq_len=16, n_shards=2,
    )
    run = eng.training_run("drop-2")
    assert "report" in run.entry  # the second flip landed
    v = run.verify()
    assert set(v.values()) == {"ok"}
    assert "report:funnel" in v
    # a torn report table fails verification
    shutil.rmtree(out["report"]["funnel"])
    v2 = eng.training_run("drop-2").verify()
    assert v2["report:funnel"].startswith("MISMATCH")


def test_dedup_aware_release_packs_only_canonicals(spark, tmp_path):
    """export_release(cluster_map=...) ships one quality-best document
    per near-dup cluster, selected from the STORED map's keep-list
    (no reclustering in the release pass), and the attached report
    describes the canonical-only corpus it actually packs."""
    from queens_spark.facade import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"), (2, "a b c d e f"),   # exact copies
            (3, "a b c d e g"),                         # near-dup of 1
            (4, "p q r s t u"),                         # unique
        ],
        ["doc_id", "text"],
    )
    eng.build_cluster_map(docs, "text", "doc_id", "cm", n=1, threshold=0.5)
    rel = eng.export_release(
        docs, "text", "doc_id", "rel", seq_len=8, n_shards=2,
        cluster_map="cm",
    )
    run = eng.training_run("rel")
    packed_docs = {
        d
        for r in run.sequences().select("doc_spans").collect()
        for d in [s["id"] for s in r["doc_spans"]]
    }
    canon = {
        r["best_doc_id"]
        for r in eng.cluster_map("cm").canonical().collect()
    }
    assert packed_docs == canon
    assert len(packed_docs) == 2  # one per cluster: {1,2,3} and {4}
    # the report's dup table reflects the shipped (canonical) frame
    dup = spark.read.parquet(rel["report"]["duplication"]).collect()[0]
    assert dup["n_docs"] == 2 and dup["n_duplicates"] == 0
    assert all(v == "ok" for v in run.verify().values())


@pytest.mark.slow
def test_release_after_takedown_reelects_next_best(spark, tmp_path):
    """Takedowns compose with releases: retiring a cluster's stored
    canonical removes it from the map's members, so the next release
    re-elects the next-best SURVIVOR instead of silently dropping the
    whole cluster — and a df that merely OMITS the canonical (without
    any retirement) re-elects too (the ADVICE interaction)."""
    from queens_spark.facade import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"), (2, "a b c d e f"), (3, "a b c d e g"),
            (4, "p q r s t u"),
        ],
        ["doc_id", "text"],
    )
    eng.build_cluster_map(docs, "text", "doc_id", "cm", n=1, threshold=0.5)
    eng.register_index("docs", "cluster", "cm")
    canon0 = {
        r["component_id"]: r["best_doc_id"]
        for r in eng.cluster_map("cm").canonical().collect()
    }
    best_cluster = canon0[min(canon0)]  # the {1,2,3} cluster's best

    def packed(rel_name, frame):
        eng.export_release(
            frame, "text", "doc_id", rel_name, seq_len=8, n_shards=2,
            cluster_map="cm",
        )
        run = eng.training_run(rel_name)
        return {
            d
            for r in run.sequences().select("doc_spans").collect()
            for d in [s["id"] for s in r["doc_spans"]]
        }

    # a frame that omits the stored canonical (no retirement): the
    # release ships the next-best member, never zero
    omitted = packed(
        "rel_omit", docs.where(F.col("doc_id") != best_cluster)
    )
    assert best_cluster not in omitted
    assert len(omitted) == 2  # both clusters still represented

    # a real takedown: the map re-elects at retire time, and the
    # release keep-list follows
    eng.retire_documents("docs", ids=[int(best_cluster)])
    canon1 = {
        r["component_id"]: r["best_doc_id"]
        for r in eng.cluster_map("cm").canonical().collect()
    }
    assert best_cluster not in set(canon1.values())
    shipped = packed(
        "rel_takedown", docs.where(F.col("doc_id") != best_cluster)
    )
    assert shipped == set(canon1.values())
    assert len(shipped) == 2
