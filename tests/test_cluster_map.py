"""Stored dedup cluster map (store/cluster_map.py): stored == inline,
fingerprint staleness, param rebuilds."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from queens_spark.store.cluster_map import (
    build_cluster_map,
    build_or_load_cluster_map,
    load_cluster_map,
)

DOCS = [
    (1, "alpha beta gamma delta epsilon"),
    (2, "alpha beta gamma delta epsilon"),           # exact copy of 1
    (3, "alpha beta gamma delta zeta"),              # near-dup of 1
    (4, "completely different text about spark jobs"),
    (5, "another unrelated document entirely here now"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_stored_equals_inline(spark, docs, tmp_path):
    from queens_spark.operators.dedup import connected_components, dedup_edges
    from queens_spark.operators.text import quality_score

    cm = build_cluster_map(
        docs, "text", "doc_id", str(tmp_path / "cm"), n=3, threshold=0.6
    )
    stored = {
        r["doc_id"]: r["component_id"]
        for r in cm.members().collect()
    }
    edges = dedup_edges(docs, "text", "doc_id", n=3, threshold=0.6)
    inline = {
        r["doc_id"]: r["component_id"]
        for r in connected_components(docs, edges, "doc_id").collect()
    }
    assert stored == inline
    assert stored[1] == stored[2]  # exact copies cluster
    # canonical: one row per component, best member by (quality, -id)
    canon = {r["component_id"]: r for r in cm.canonical().collect()}
    assert set(canon) == set(stored.values())
    qual = {
        r["doc_id"]: r["quality"]
        for r in docs.select(
            "doc_id", quality_score("text").alias("quality")
        ).collect()
    }
    for comp, row in canon.items():
        members = [d for d, c in stored.items() if c == comp]
        best = max(members, key=lambda d: (qual[d], -d))
        assert row["best_doc_id"] == best
        assert row["n_members"] == len(members)


def test_load_serves_without_rebuild_and_fingerprint_gates(
    spark, docs, tmp_path
):
    d = str(tmp_path / "cm")
    build_cluster_map(docs, "text", "doc_id", d, fingerprint="fp-1")
    cm = load_cluster_map(spark, d, expected_fingerprint="fp-1")
    assert cm.entry["fingerprint"] == "fp-1"
    with pytest.raises(ValueError, match="stale"):
        load_cluster_map(spark, d, expected_fingerprint="fp-2")
    # build_or_load: matching params+fingerprint serves the stored map
    cm2 = build_or_load_cluster_map(
        docs, "text", "doc_id", d, fingerprint="fp-1"
    )
    assert cm2.entry["version"] == cm.entry["version"]
    # stale fingerprint or different params → rebuild (version bumps)
    cm3 = build_or_load_cluster_map(
        docs, "text", "doc_id", d, fingerprint="fp-2"
    )
    assert cm3.entry["version"] == cm.entry["version"] + 1
    cm4 = build_or_load_cluster_map(
        docs, "text", "doc_id", d, fingerprint="fp-2", threshold=0.5
    )
    assert cm4.entry["version"] == cm3.entry["version"] + 1
    # superseded version dirs GC'd
    vdirs = [x for x in os.listdir(d) if x.startswith("v")]
    assert vdirs == [cm4.entry["dir"]]


def test_engine_cluster_map_verbs(spark, docs, tmp_path):
    from queens_spark.facade import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    eng.build_cluster_map(docs, "text", "doc_id", "docs", threshold=0.6)
    cm = eng.cluster_map("docs")
    members = {r["doc_id"]: r["component_id"] for r in cm.members().collect()}
    assert members[1] == members[2]
    assert cm.canonical().count() == len(set(members.values()))
    assert cm.edges().count() >= 1


def test_crashed_build_retry_succeeds(spark, docs, tmp_path):
    d = str(tmp_path / "cm")
    cm = build_cluster_map(docs, "text", "doc_id", d, threshold=0.6)
    nxt = os.path.join(d, f"v{cm.entry['version'] + 1:06d}", "members")
    os.makedirs(nxt)
    with open(os.path.join(nxt, "part-junk.parquet"), "w") as fh:
        fh.write("crashed")
    cm2 = build_cluster_map(docs, "text", "doc_id", d, threshold=0.6)
    assert cm2.entry["version"] == cm.entry["version"] + 1
    assert cm2.members().count() == docs.count()
