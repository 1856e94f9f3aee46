"""fsck — the read-only storage audit (store/fsck.py, Engine.fsck):
a healthy warehouse reports zero errors/warns; planted damage of each
class is found at the right severity; and fsck never mutates state."""

from __future__ import annotations

import pytest

import json
import os
import shutil

from tests.test_index_registry import _engine_with_indexes, _frame


def _snapshot(root):
    out = {}
    for dirpath, _dirnames, filenames in os.walk(root):
        for fn in filenames:
            p = os.path.join(dirpath, fn)
            out[p] = os.path.getsize(p)
    return out


def test_healthy_warehouse_is_clean(spark, tmp_path):
    eng = _engine_with_indexes(spark, tmp_path)
    report = eng.fsck()
    assert report["healthy"]
    assert report["error"] == 0
    errs = [f for f in report["findings"] if f["level"] == "warn"]
    assert errs == []


def test_fsck_is_read_only(spark, tmp_path):
    eng = _engine_with_indexes(spark, tmp_path)
    before = _snapshot(eng.warehouse.root)
    eng.fsck()
    assert _snapshot(eng.warehouse.root) == before


def test_missing_index_segment_is_an_error(spark, tmp_path):
    eng = _engine_with_indexes(spark, tmp_path)
    from queens_spark.store.text_index import _read_manifest

    entry = _read_manifest(eng._text_index_dir())["d"]
    victim = entry["segments"][0]["path"]
    shutil.rmtree(victim)
    report = eng.fsck()
    assert not report["healthy"]
    assert any(
        f["component"] == "text_index" and victim in f["message"]
        for f in report["findings"]
        if f["level"] == "error"
    )


def test_stale_ledger_token_is_an_error(spark, tmp_path):
    eng = _engine_with_indexes(spark, tmp_path)
    # ingest WITH a token so the ledger records it
    batch = _frame(spark, [(100, "a brand new document about deltas")])
    eng.ingest_deduped(batch, "text", "doc_id", ledger="docs",
                       token="tok-1")
    led = os.path.join(eng.warehouse.root, "system", "dedup_ledger",
                       "docs")
    mpath = os.path.join(led, "dedup_ledger.json")
    if not os.path.exists(mpath):
        mpath = next(
            os.path.join(led, f) for f in os.listdir(led)
            if f.endswith(".json")
        )
    man = json.load(open(mpath))
    assert man.get("tokens"), "fixture must have recorded the token"
    # point the token at a segment that does not exist (out-of-band
    # damage / bad restore)
    tok = next(iter(man["tokens"]))
    man["tokens"][tok] = os.path.join(led, "seg_does_not_exist")
    json.dump(man, open(mpath, "w"))
    report = eng.fsck()
    assert not report["healthy"]
    assert any(
        f["component"] == "dedup_ledger" and tok in f["message"]
        for f in report["findings"]
        if f["level"] == "error"
    )


def test_orphan_bytes_warn_not_error(spark, tmp_path):
    eng = _engine_with_indexes(spark, tmp_path)
    # a crashed append: bytes on disk, never flipped into a manifest
    led = os.path.join(eng.warehouse.root, "system", "dedup_ledger",
                       "docs")
    os.makedirs(os.path.join(led, "zz_orphan_seg"))
    vdir = os.path.join(eng._vector_index_dir(), "v", "v9999")
    os.makedirs(vdir)
    report = eng.fsck()
    assert report["healthy"]  # orphans never break serving
    warns = [f["message"] for f in report["findings"]
             if f["level"] == "warn"]
    assert any("zz_orphan_seg" in m for m in warns)
    assert any("v9999" in m for m in warns)


def test_unregistered_ghost_index_is_an_error(spark, tmp_path):
    eng = _engine_with_indexes(spark, tmp_path)
    from queens_spark.store.index_registry import _read, _write

    reg = _read(eng._registry_dir())
    reg["docs"].append({"kind": "vector", "name": "ghost"})
    _write(eng._registry_dir(), reg)
    report = eng.fsck()
    assert not report["healthy"]
    assert any(
        f["component"] == "index_registry" and "ghost" in f["message"]
        for f in report["findings"]
        if f["level"] == "error"
    )


def test_tombstone_coverage_overflow_is_an_error(spark, tmp_path):
    eng = _engine_with_indexes(spark, tmp_path)
    from queens_spark.store.text_index import (
        _manifest_path,
        _read_manifest,
    )

    # a real delete first, so the manifest has a tombstone entry
    eng.delete_from_text_index("d", [3])
    man = _read_manifest(eng._text_index_dir())
    man["d"]["deletes"][0]["covers"] = 99
    json.dump(man, open(_manifest_path(eng._text_index_dir()), "w"))
    report = eng.fsck()
    assert not report["healthy"]
    assert any(
        "covers 99" in f["message"]
        for f in report["findings"]
        if f["level"] == "error"
    )


def test_cluster_map_damage(spark, tmp_path):
    eng = _engine_with_indexes(spark, tmp_path)
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e")], ["doc_id", "text"]
    )
    eng.build_cluster_map(docs, "text", "doc_id", "cm", n=1, threshold=0.5)
    assert eng.fsck()["healthy"]
    cm_dir = os.path.join(eng._cluster_maps_dir(), "cm")
    # orphan dir (crashed append) → warn, still healthy
    os.makedirs(os.path.join(cm_dir, "seg_000099"))
    report = eng.fsck()
    assert report["healthy"]
    assert any(
        f["component"] == "cluster_map" and "seg_000099" in f["message"]
        for f in report["findings"] if f["level"] == "warn"
    )
    # dangling segment artifact → error
    shutil.rmtree(os.path.join(cm_dir, "seg_000001", "members"))
    report = eng.fsck()
    assert not report["healthy"]
    assert any(
        f["component"] == "cluster_map" and "members" in f["message"]
        for f in report["findings"] if f["level"] == "error"
    )


def test_rollup_damage(spark, tmp_path):
    eng = _engine_with_indexes(spark, tmp_path)
    eng.register_rollup("docs", "by_table", ["table_name"], ["doc_id"])
    batch = _frame(spark, [(200, "rollup fixture document")])
    eng.ingest(batch, "docs", "r1")
    assert eng.fsck()["healthy"]
    segs = os.path.join(eng._rollups_dir(), "docs", "by_table", "segments")
    seg = next(d for d in os.listdir(segs) if d.startswith("ingest_"))
    # crashed partial write (no _SUCCESS) → warn (lazy repair rebuilds)
    os.remove(os.path.join(segs, seg, "_SUCCESS"))
    report = eng.fsck()
    assert report["healthy"]
    assert any(
        f["component"] == "rollup" and "_SUCCESS" in f["message"]
        for f in report["findings"] if f["level"] == "warn"
    )
    # segment tree for an unregistered rollup → orphan warn
    os.makedirs(os.path.join(eng._rollups_dir(), "docs", "ghost"))
    report = eng.fsck()
    assert any(
        f["component"] == "rollup" and "ghost" in f["message"]
        for f in report["findings"] if f["level"] == "warn"
    )


def test_training_run_damage(spark, tmp_path):
    eng = _engine_with_indexes(spark, tmp_path)
    docs = spark.createDataFrame(
        [(i, f"tiny corpus doc {i} with several words") for i in range(6)],
        ["doc_id", "text"],
    )
    eng.export_training_run(docs, "text", "doc_id", "run1",
                            seq_len=8, n_shards=2)
    assert eng.fsck()["healthy"]
    run_dir = os.path.join(eng._training_runs_dir(), "run1")
    man = json.load(open(os.path.join(run_dir,
                                      "training_run_manifest.json")))
    vdir = os.path.join(run_dir, man["current"]["dir"])
    shard = sorted(man["current"]["shards"])[0]
    shutil.rmtree(os.path.join(vdir, "data", f"shard={shard}"))
    report = eng.fsck()
    assert not report["healthy"]
    assert any(
        f["component"] == "training_run" and f"shard {shard}" in f["message"]
        for f in report["findings"] if f["level"] == "error"
    )
    # counter regression → error
    man["next_version"] = 0
    json.dump(man, open(os.path.join(run_dir,
                                     "training_run_manifest.json"), "w"))
    report = eng.fsck()
    assert any(
        "next_version" in f["message"]
        for f in report["findings"] if f["level"] == "error"
    )


def test_corpus_profile_damage(spark, tmp_path):
    eng = _engine_with_indexes(spark, tmp_path)
    batch = _frame(spark, [(300, "profile fixture document words")])
    eng.ingest(batch, "docs", "p1",
               dedup_text_col="text", dedup_id_col="doc_id")
    assert eng.fsck()["healthy"]
    ppath = os.path.join(eng._profiles_dir(), "docs",
                         "corpus_profile.json")
    prof = json.load(open(ppath))
    # bucket outside the declared domain → error
    prof["hist"]["9999"] = 1
    json.dump(prof, open(ppath, "w"))
    report = eng.fsck()
    assert not report["healthy"]
    assert any(
        f["component"] == "corpus_profile" and "9999" in f["message"]
        for f in report["findings"] if f["level"] == "error"
    )
    # corrupt file → error (the gate would treat the corpus as empty)
    with open(ppath, "w") as fh:
        fh.write("{not json")
    report = eng.fsck()
    assert any(
        f["component"] == "corpus_profile" and "corrupt" in f["message"]
        for f in report["findings"] if f["level"] == "error"
    )


def test_registry_schema_drift_is_an_error(spark, tmp_path):
    """#6: a registered index whose ingest columns no longer exist in
    the collection schema fails at fsck time, not at the next ingest."""
    from queens_spark.core.schema import CollectionSchema, ColumnSpec
    from queens_spark.facade import Engine

    eng = _engine_with_indexes(spark, tmp_path)
    assert eng.fsck()["healthy"]
    drifted = Engine(
        spark, eng.warehouse.root,
        schemas={
            "docs": CollectionSchema(
                "docs",
                [
                    ColumnSpec("ingest_id", "INTEGER", nullable=False),
                    ColumnSpec("table_name", "TEXT", nullable=False),
                    ColumnSpec("doc_id", "INTEGER", nullable=False),
                    # "text" and "embedding" dropped by schema evolution
                ],
            )
        },
    )
    report = drifted.fsck()
    assert not report["healthy"]
    msgs = [f["message"] for f in report["findings"]
            if f["level"] == "error" and f["component"] == "index_registry"]
    assert any("text" in m for m in msgs)
    assert any("embedding" in m for m in msgs)


def test_cli_fsck_exit_codes(spark, tmp_path, capsys, monkeypatch):
    import shutil as _sh

    from queens_spark.cli import main
    from queens_spark.store.text_index import _read_manifest

    eng = _engine_with_indexes(spark, tmp_path)
    monkeypatch.setenv("QUEENS_SPARK_WAREHOUSE", eng.warehouse.root)
    assert main(["fsck", "--quiet"]) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out)["healthy"] is True
    # break it → exit 1 and the finding is printed without --quiet
    victim = _read_manifest(eng._text_index_dir())["d"]["segments"][0][
        "path"
    ]
    _sh.rmtree(victim)
    assert main(["fsck"]) == 1
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rep = json.loads(out)
    assert rep["healthy"] is False and rep["findings"]


@pytest.mark.slow
def test_cluster_map_retirement_damage(spark, tmp_path):
    """Retirement-segment audit: a missing tombstone artifact and an
    unreferenced tombstone list are both errors (coverage scoping
    cannot apply without the pair), and out-of-range coverage is
    caught before it hides later writes."""
    import json

    from queens_spark.store.cluster_map import (
        MANIFEST_NAME,
        retire_cluster_map,
    )

    eng = _engine_with_indexes(spark, tmp_path)
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "p q r s")],
        ["doc_id", "text"],
    )
    eng.build_cluster_map(docs, "text", "doc_id", "cm", n=1, threshold=0.5)
    cm_dir = os.path.join(eng._cluster_maps_dir(), "cm")
    retire_cluster_map(spark, cm_dir, [2])
    assert eng.fsck()["healthy"]
    manifest_p = os.path.join(cm_dir, MANIFEST_NAME)
    with open(manifest_p) as fh:
        manifest = json.load(fh)
    rseg = manifest["current"]["retirements"][0]["seg"]

    # missing 'retired' artifact on a retirement segment → error
    saved = os.path.join(cm_dir, rseg, "retired")
    os.rename(saved, saved + "__aside")
    rep = eng.fsck()
    assert not rep["healthy"]
    assert any("missing artifact 'retired'" in f["message"]
               for f in rep["findings"] if f["level"] == "error")
    os.rename(saved + "__aside", saved)
    assert eng.fsck()["healthy"]

    # coverage must equal the retirement segment's own index: higher
    # hides later writes, lower resurrects retired docs
    for bad in (99, 0):
        manifest["current"]["retirements"][0]["coverage"] = bad
        with open(manifest_p, "w") as fh:
            json.dump(manifest, fh)
        rep = eng.fsck()
        assert any(f"coverage {bad} != its segment index" in f["message"]
                   for f in rep["findings"] if f["level"] == "error"), bad
    manifest["current"]["retirements"][0]["coverage"] = 1
    # a tombstone list on a segment the manifest does not list as a
    # retirement → error (it would never be applied)
    manifest["current"]["retirements"] = []
    with open(manifest_p, "w") as fh:
        json.dump(manifest, fh)
    rep = eng.fsck()
    assert any("not in the manifest's retirement list" in f["message"]
               for f in rep["findings"] if f["level"] == "error")
