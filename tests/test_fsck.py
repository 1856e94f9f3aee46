"""fsck — the read-only storage audit (store/fsck.py, Engine.fsck):
a healthy warehouse reports zero errors/warns; planted damage of each
class is found at the right severity; and fsck never mutates state."""

from __future__ import annotations

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
