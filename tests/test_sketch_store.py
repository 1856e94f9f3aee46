"""Persisted KMV sketch store (store/sketch_store.py): append ==
rebuild bit-for-bit (the closure property, now as a storage
contract), exactly-once token replays, crash-orphan GC, and the
Engine surface."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from queens_spark.store.sketch_store import (
    append_sketch_store,
    build_sketch_store,
    load_sketch_store,
)


def _keys(spark, groups):
    rows = [(g, int(v)) for g, vs in groups.items() for v in vs]
    return spark.createDataFrame(rows, "src string, key bigint")


def _sk_rows(store):
    return sorted(
        (r["src"], r["v"]) for r in store.sketches().collect()
    )


def test_build_load_roundtrip_and_estimates(spark, tmp_path):
    df = _keys(spark, {"a": range(500), "b": range(400, 900)})
    d = str(tmp_path / "sks")
    build_sketch_store(df, "src", "key", d, "cols", k=32)
    st = load_sketch_store(spark, d, "cols")
    assert st.k == 32 and st.group_col == "src"
    est = {r["src"]: r for r in st.distinct_estimates().collect()}
    assert abs(est["a"]["est_distinct"] - 500) < 375
    ov = st.pair_overlap().collect()[0]
    assert abs(ov["union_est"] - 900) < 450


def test_append_equals_rebuild_bit_for_bit(spark, tmp_path):
    part1 = _keys(spark, {"a": range(300), "b": range(100)})
    part2 = _keys(spark, {"a": range(300, 700), "c": range(50)})
    both = part1.unionByName(part2)
    d1, d2 = str(tmp_path / "inc"), str(tmp_path / "full")
    build_sketch_store(part1, "src", "key", d1, "s", k=16)
    inc = append_sketch_store(spark, part2, d1, "s")
    full = build_sketch_store(both, "src", "key", d2, "s", k=16)
    assert _sk_rows(inc) == _sk_rows(full)
    # new group 'c' entered via append alone
    assert any(g == "c" for g, _ in _sk_rows(inc))


def test_token_replay_is_a_noop(spark, tmp_path):
    d = str(tmp_path / "tok")
    build_sketch_store(
        _keys(spark, {"a": range(100)}), "src", "key", d, "s", k=16
    )
    st1 = append_sketch_store(
        spark, _keys(spark, {"a": range(100, 200)}), d, "s", token="t1"
    )
    v_after = int(st1.entry["version"])
    rows_after = _sk_rows(st1)
    st2 = append_sketch_store(
        spark, _keys(spark, {"a": range(900, 950)}), d, "s", token="t1"
    )
    assert int(st2.entry["version"]) == v_after  # no new version
    assert _sk_rows(st2) == rows_after


def test_crash_orphan_warned_then_gcd(spark, tmp_path):
    d = str(tmp_path / "gc")
    build_sketch_store(
        _keys(spark, {"a": range(50)}), "src", "key", d, "s", k=8
    )
    # a crashed write: version dir on disk, manifest never flipped
    orphan = os.path.join(d, "s", "v99")
    os.makedirs(orphan)
    from queens_spark.store.fsck import fsck_sketch_stores

    warns = [f for f in fsck_sketch_stores(d) if f["level"] == "warn"]
    assert any("v99" in f["message"] for f in warns)
    append_sketch_store(spark, _keys(spark, {"a": range(50, 80)}), d, "s")
    assert not os.path.exists(orphan)  # GC'd by the next flip
    assert fsck_sketch_stores(d) == [
        f for f in fsck_sketch_stores(d) if f["level"] != "warn"
    ]


def test_engine_surface_and_fsck_integration(spark, tmp_path):
    from tests.test_index_registry import _engine_with_indexes

    eng = _engine_with_indexes(spark, tmp_path)
    docs = spark.createDataFrame(
        [(i % 3, i) for i in range(120)], "grp int, doc_id bigint"
    ).select(F.col("grp").cast("string").alias("grp"), "doc_id")
    eng.build_sketch_store(docs, "grp", "doc_id", "per_grp", k=8)
    st = eng.sketch_store("per_grp")
    assert st.describe()["n_groups"] == 3
    report = eng.fsck()
    assert report["healthy"]
    # break the sketch artifact → fsck error
    import shutil

    shutil.rmtree(st.entry["path"])
    report = eng.fsck()
    assert any(
        f["component"] == "sketch_store"
        for f in report["findings"]
        if f["level"] == "error"
    )


def _corpus_engine(spark, tmp_path):
    from queens_spark.core.schema import CollectionSchema, ColumnSpec
    from queens_spark.facade import Engine

    schemas = {
        "docs": CollectionSchema(
            "docs",
            [
                ColumnSpec("ingest_id", "INTEGER", nullable=False),
                ColumnSpec("table_name", "TEXT", nullable=False),
                ColumnSpec("doc_id", "INTEGER", nullable=False),
                ColumnSpec("src", "TEXT", nullable=False),
                ColumnSpec("text", "TEXT", nullable=False),
            ],
        )
    }
    return Engine(spark, str(tmp_path / "wh"), schemas=schemas)


def _batch(spark, ids, src="a"):
    return spark.createDataFrame(
        [(i, src, f"unique document body number {i} with words") for i in ids],
        "doc_id bigint, src string, text string",
    )


def test_registered_sketch_refreshes_inside_ingest(spark, tmp_path):
    eng = _corpus_engine(spark, tmp_path)
    seed = _batch(spark, range(10))
    eng.build_sketch_store(seed, "src", "doc_id", "per_src", k=8)
    eng.ingest(seed, "docs", "t0", dedup_text_col="text",
               dedup_id_col="doc_id")
    eng.register_index("docs", "sketch", "per_src")
    v0 = int(eng.sketch_store("per_src").entry["version"])

    eng.ingest(_batch(spark, range(10, 25), src="b"), "docs", "t1",
               dedup_text_col="text", dedup_id_col="doc_id",
               token="batch-1")
    st = eng.sketch_store("per_src")
    assert int(st.entry["version"]) == v0 + 1
    groups = {r["src"] for r in st.sketches().collect()}
    assert groups == {"a", "b"}  # the new source entered via ingest

    # redelivery with the same token: ledger screens everything away
    # (accepted=0 -> no refresh fires), versions unchanged
    eng.ingest(_batch(spark, range(10, 25), src="b"), "docs", "t1r",
               dedup_text_col="text", dedup_id_col="doc_id",
               token="batch-1")
    assert int(eng.sketch_store("per_src").entry["version"]) == v0 + 1


def test_maintain_clears_sketch_tokens(spark, tmp_path):
    eng = _corpus_engine(spark, tmp_path)
    seed = _batch(spark, range(8))
    eng.build_sketch_store(seed, "src", "doc_id", "per_src", k=8)
    eng.ingest(seed, "docs", "t0", dedup_text_col="text",
               dedup_id_col="doc_id")
    eng.register_index("docs", "sketch", "per_src")
    eng.ingest(_batch(spark, range(8, 14), src="b"), "docs", "t1",
               dedup_text_col="text", dedup_id_col="doc_id",
               token="tk")
    assert eng.sketch_store("per_src").entry["applied_tokens"] == ["tk"]
    rep = eng.maintain("docs")
    assert "sketch:per_src" in rep["compacted"]
    assert not eng.sketch_store("per_src").entry.get("applied_tokens")
    # post-maintain fsck stays healthy
    assert eng.fsck()["healthy"]


def test_register_sketch_validates_existence(spark, tmp_path):
    import pytest

    eng = _corpus_engine(spark, tmp_path)
    with pytest.raises(KeyError):
        eng.register_index("docs", "sketch", "nope")


def test_cli_skstore_lifecycle(spark, tmp_path, capsys, monkeypatch):
    from queens_spark.cli import main

    eng = _corpus_engine(spark, tmp_path)
    monkeypatch.setenv("QUEENS_SPARK_WAREHOUSE", eng.warehouse.root)
    src1 = str(tmp_path / "p1")
    src2 = str(tmp_path / "p2")
    _batch(spark, range(40), src="a").write.parquet(src1)
    _batch(spark, range(40, 90), src="b").write.parquet(src2)

    assert main(["skstore", "build", "s", "--source", src1,
                 "--group-col", "src", "--key-col", "doc_id",
                 "--k", "8"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_groups"] == 1 and out["version"] == 1

    assert main(["skstore", "append", "s", "--source", src2,
                 "--token", "t1"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_groups"] == 2 and out["version"] == 2

    assert main(["skstore", "distinct", "s"]) == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    by = {r["src"]: r for r in lines}
    assert by["a"]["sketch_n"] == 8  # full sketch at 40 keys, k=8
    assert by["b"]["est_distinct"] > 0

    assert main(["skstore", "overlap", "s"]) == 0
    ov = [json.loads(x) for x in
          capsys.readouterr().out.strip().splitlines()]
    assert len(ov) == 1 and ov[0]["inter_est"] == 0  # disjoint ids
