"""Stored dedup cluster map (store/cluster_map.py): stored == inline,
fingerprint staleness, param rebuilds, and the O(batch) append —
bit-identical to a full rebuild on the union at the frozen
(n, threshold, max_df), including growth sequences that MERGE
pre-existing clusters and flip shingle hotness, with zero old-corpus
text access."""

from __future__ import annotations

import os
import random
import shutil

import pytest
from pyspark.sql import functions as F

from queens_spark.store.cluster_map import (
    append_cluster_map,
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


def _snap(cm):
    """Order-insensitive snapshot of every served table — the
    bit-for-bit comparison unit (quality/jaccard doubles compare
    exactly: both sides run the identical expressions on identical
    operands)."""
    members = sorted(
        (r["doc_id"], r["component_id"], r["quality"])
        for r in cm.members().collect()
    )
    canonical = sorted(
        (r["component_id"], r["best_doc_id"], r["best_quality"],
         r["n_members"])
        for r in cm.canonical().collect()
    )
    edges = sorted((r["a"], r["b"]) for r in cm.edges().collect())
    return members, canonical, edges


@pytest.mark.slow
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


@pytest.mark.slow
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
    # superseded segment/graph dirs GC'd after each rebuild's flip
    live = {s for s in cm4.entry["segments"]} | {cm4.entry["graph"]}
    on_disk = {
        x for x in os.listdir(d)
        if x.startswith(("seg_", "graph_", "v"))
    }
    assert on_disk == live


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
    # simulate a crashed rebuild: junk in the NEXT counter's dirs (the
    # manifest never pointed at them, so the live map is untouched)
    nxt = os.path.join(d, f"seg_{cm.entry['next_seg']:06d}", "members")
    os.makedirs(nxt)
    with open(os.path.join(nxt, "part-junk.parquet"), "w") as fh:
        fh.write("crashed")
    assert load_cluster_map(spark, d).members().count() == docs.count()
    cm2 = build_cluster_map(docs, "text", "doc_id", d, threshold=0.6)
    assert cm2.entry["version"] == cm.entry["version"] + 1
    assert cm2.members().count() == docs.count()


# --------------------------------------------------------- O(batch) append

# unigram shingles make Jaccard = word-set overlap — easy to craft
# exact merge/flip scenarios. threshold 0.5 throughout.
APPEND_KW = dict(n=1, threshold=0.5)


def _build(df, d, **kw):
    return build_cluster_map(df, "text", "doc_id", d, **APPEND_KW, **kw)


@pytest.mark.slow
def test_append_merges_preexisting_clusters_bit_identical(spark, tmp_path):
    A = spark.createDataFrame(
        [
            (1, "a b c d"), (2, "a b c e"),        # cluster X (J=0.6)
            (4, "p q r s"), (5, "p q r t"),        # cluster Y (J=0.6)
            (6, "x y z w"),                          # isolated
            (8, "a b c d"),                          # exact copy of 1
        ],
        ["doc_id", "text"],
    )
    B = spark.createDataFrame(
        [
            (7, "a b c d p q r s"),   # J=0.5 to BOTH clusters → merge
            (9, "totally different words here"),
        ],
        ["doc_id", "text"],
    )
    d = str(tmp_path / "m")
    cm = _build(A, d, max_df=10)
    before = {
        r["doc_id"]: r["component_id"] for r in cm.members().collect()
    }
    assert before[1] != before[4]  # two distinct clusters pre-append
    cm2 = append_cluster_map(B, d, token="t1")
    rebuilt = _build(A.union(B), str(tmp_path / "r"), max_df=10)
    assert _snap(cm2) == _snap(rebuilt)
    after = {
        r["doc_id"]: r["component_id"] for r in cm2.members().collect()
    }
    assert after[1] == after[4] == after[7]  # merged through the batch doc
    # merged-away component id is tombstoned out of canonical
    assert before[4] not in {
        r["component_id"] for r in cm2.canonical().collect()
    }


@pytest.mark.slow
def test_append_token_replay_noops(spark, tmp_path):
    A = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e")], ["doc_id", "text"]
    )
    B = spark.createDataFrame([(3, "a b c f")], ["doc_id", "text"])
    d = str(tmp_path / "m")
    _build(A, d)
    cm = append_cluster_map(B, d, token="tok")
    v, snap = cm.entry["version"], _snap(cm)
    cm2 = append_cluster_map(B, d, token="tok")
    assert cm2.entry["version"] == v
    assert _snap(cm2) == snap


@pytest.mark.slow
def test_append_hot_flip_reevaluates_old_pairs(spark, tmp_path):
    """The batch pushes shared shingles over the frozen max_df: the
    stored pair (1,2) loses its rare shingles and must re-qualify (or
    drop) through the band path, exactly as a rebuild decides it."""
    A = spark.createDataFrame(
        [
            (1, "a b c"), (2, "a b d"),   # J=0.5 via rare {a, b}
            (3, "m n o u"),
        ],
        ["doc_id", "text"],
    )
    # df(a)=df(b)=2 at build with max_df=2 → rare; batch flips both hot
    B = spark.createDataFrame(
        [(10, "a b x y z w q r")], ["doc_id", "text"]
    )
    d = str(tmp_path / "m")
    cm = _build(A, d, max_df=2)
    assert (1, 2) in {
        (r["a"], r["b"]) for r in cm.edges().collect()
    }
    cm2 = append_cluster_map(B, d)
    rebuilt = _build(A.union(B), str(tmp_path / "r"), max_df=2)
    assert _snap(cm2) == _snap(rebuilt)


@pytest.mark.slow
def test_append_chain_of_three_batches(spark, tmp_path):
    """Multi-append lineage: every prefix of a 3-batch growth sequence
    matches its from-scratch rebuild."""
    batches = [
        [(1, "a b c d"), (2, "a b c e"), (3, "p q r s")],
        [(4, "p q r t"), (5, "a b c d")],
        [(6, "a b c d p q r s"), (7, "solo words nothing shared")],
    ]
    d = str(tmp_path / "m")
    frames = [
        spark.createDataFrame(rows, ["doc_id", "text"]) for rows in batches
    ]
    cm = _build(frames[0], d, max_df=4)
    acc = frames[0]
    for i, b in enumerate(frames[1:], start=1):
        cm = append_cluster_map(b, d, token=f"t{i}")
        acc = acc.union(b)
        rebuilt = _build(acc, str(tmp_path / f"r{i}"), max_df=4)
        assert _snap(cm) == _snap(rebuilt), f"diverged at batch {i}"
    assert cm.describe()["segments"] == 3


@pytest.mark.slow
def test_append_never_reads_old_corpus_text(spark, tmp_path):
    """The plan-level guarantee, proven behaviorally: after the build,
    the source corpus is DELETED — the append must still succeed and
    still match the rebuild (computed beforehand), because every
    old-corpus touch reads the match artifacts, never the text."""
    src = str(tmp_path / "corpus.parquet")
    spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (4, "p q r s"), (5, "p q r t")],
        ["doc_id", "text"],
    ).write.parquet(src)
    A = spark.read.parquet(src)
    B = spark.createDataFrame(
        [(7, "a b c d p q r s")], ["doc_id", "text"]
    )
    expected = _snap(_build(A.union(B), str(tmp_path / "r"), max_df=10))
    d = str(tmp_path / "m")
    _build(A, d, max_df=10)
    shutil.rmtree(src)  # the old corpus is GONE
    cm = append_cluster_map(B, d)
    assert _snap(cm) == expected


def test_append_empty_batch_is_identity(spark, tmp_path):
    A = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e")], ["doc_id", "text"]
    )
    d = str(tmp_path / "m")
    cm = _build(A, d)
    snap = _snap(cm)
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    cm2 = append_cluster_map(empty, d, token="t-empty")
    assert _snap(cm2) == snap
    assert cm2.describe()["segments"] == 1
    # the token still records (exactly-once even for empty redeliveries)
    cm3 = append_cluster_map(empty, d, token="t-empty")
    assert _snap(cm3) == snap


@pytest.mark.slow
def test_append_with_smaller_ids_rewrites_reps(spark, tmp_path):
    """Batch ids below the old id range: the exact-copy rep (min id
    per fingerprint) and near-pair orientation (id_a < id_b) both
    change for existing docs — the append must rewrite them exactly
    as the rebuild would."""
    A = spark.createDataFrame(
        [(10, "a b c d"), (11, "a b c d"), (12, "a b c e"),
         (20, "p q r s")],
        ["doc_id", "text"],
    )
    # 5 is an exact copy of 10/11 (rep moves 10 → 5); 6 near-dups 12
    B = spark.createDataFrame(
        [(5, "a b c d"), (6, "a b c f")], ["doc_id", "text"]
    )
    d = str(tmp_path / "m")
    cm = _build(A, d, max_df=10)
    assert (10, 11) in {(r["a"], r["b"]) for r in cm.edges().collect()}
    cm2 = append_cluster_map(B, d)
    rebuilt = _build(A.union(B), str(tmp_path / "r"), max_df=10)
    assert _snap(cm2) == _snap(rebuilt)
    edges = {(r["a"], r["b"]) for r in cm2.edges().collect()}
    assert (5, 10) in edges and (5, 11) in edges  # new rep fans out
    after = {r["doc_id"]: r["component_id"] for r in cm2.members().collect()}
    assert after[10] == after[5] == 5  # component min follows the new id


@pytest.mark.slow
def test_append_with_null_text_matches_rebuild(spark, tmp_path):
    """doc_fingerprint(NULL) is NULL, and the build's rep window (and
    the DuckDB twins) group NULL fps into ONE partition — the append's
    fp regroup must match them null-safely, or a batch NULL-text doc
    misses its old NULL-fp group."""
    A = spark.createDataFrame(
        [(1, None), (2, "a b c d"), (3, None)], "doc_id bigint, text string"
    )
    B = spark.createDataFrame(
        [(7, None), (8, "a b c e")], "doc_id bigint, text string"
    )
    d = str(tmp_path / "m")
    cm = _build(A, d, max_df=10)
    before = {r["doc_id"]: r["component_id"] for r in cm.members().collect()}
    assert before[1] == before[3]  # NULL-text docs share one fp group
    cm2 = append_cluster_map(B, d)
    rebuilt = _build(A.union(B), str(tmp_path / "r"), max_df=10)
    assert _snap(cm2) == _snap(rebuilt)
    after = {r["doc_id"]: r["component_id"] for r in cm2.members().collect()}
    assert after[7] == after[1]  # the batch NULL doc joined the group


def test_append_rejects_reused_ids(spark, tmp_path):
    """The ledger screens content, not ids — a re-crawled id with
    edited text would strand a stale hash set in the match artifacts,
    so the append fails loudly instead of corrupting the map."""
    A = spark.createDataFrame(
        [(1, "a b c d"), (2, "p q r s")], ["doc_id", "text"]
    )
    d = str(tmp_path / "m")
    cm = _build(A, d)
    snap = _snap(cm)
    clash = spark.createDataFrame(
        [(1, "revised text for doc one")], ["doc_id", "text"]
    )
    with pytest.raises(ValueError, match="NOVEL ids"):
        append_cluster_map(clash, d)
    assert _snap(load_cluster_map(spark, d)) == snap  # map untouched


@pytest.mark.slow
def test_append_equals_rebuild_property(spark, tmp_path):
    """Randomized growth sequences over a small vocabulary — exercises
    exact copies, near-dups, hot flips (tiny max_df), cluster merges,
    splits-by-flip, and isolated docs in one sweep."""
    vocab = ["a", "b", "c", "d", "e", "f", "g", "h"]
    for seed in range(4):
        rng = random.Random(seed)
        ids = list(range(1, 25))
        rng.shuffle(ids)  # batch ids interleave BELOW and above old ids
        rows = []
        for i in ids:
            k = rng.randint(0, 6)
            rows.append((i, " ".join(rng.choice(vocab) for _ in range(k))))
        cut = rng.randint(6, 18)
        A = spark.createDataFrame(rows[:cut], ["doc_id", "text"])
        B = spark.createDataFrame(rows[cut:], ["doc_id", "text"])
        d = str(tmp_path / f"m{seed}")
        _build(A, d, max_df=3)
        cm = append_cluster_map(B, d)
        rebuilt = _build(
            A.union(B), str(tmp_path / f"r{seed}"), max_df=3
        )
        assert _snap(cm) == _snap(rebuilt), f"seed {seed} diverged"


@pytest.mark.slow
def test_cli_cmap_lifecycle(spark, tmp_path, capsys, monkeypatch):
    import json

    from queens_spark.cli import main
    from queens_spark.facade import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    monkeypatch.setenv("QUEENS_SPARK_WAREHOUSE", eng.warehouse.root)
    src1, src2 = str(tmp_path / "p1"), str(tmp_path / "p2")
    spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (4, "p q r s"), (5, "p q r t")],
        ["doc_id", "text"],
    ).write.parquet(src1)
    spark.createDataFrame(
        [(7, "a b c d p q r s")], ["doc_id", "text"]
    ).write.parquet(src2)

    assert main(["cmap", "build", "m", "--source", src1, "--n", "1",
                 "--threshold", "0.5", "--max-df", "10"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_docs"] == 4 and out["segments"] == 1

    assert main(["cmap", "append", "m", "--source", src2,
                 "--token", "t1"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_docs"] == 5 and out["segments"] == 2

    assert main(["cmap", "members", "m", "--limit", "10"]) == 0
    rows = [json.loads(x) for x in
            capsys.readouterr().out.strip().splitlines()]
    comp = {r["doc_id"]: r["component_id"] for r in rows}
    assert comp[1] == comp[4] == comp[7]  # the batch doc merged X and Y

    assert main(["cmap", "canonical", "m"]) == 0
    assert capsys.readouterr().out.strip()
    assert main(["cmap", "describe", "m"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["applied_tokens"] == 1

    # takedown from the shell: the retired doc stops serving
    assert main(["cmap", "retire", "m", "--ids", "7"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_docs"] == 4 and out["retirements"] == 1
    assert main(["cmap", "members", "m", "--limit", "10"]) == 0
    rows = [json.loads(x) for x in
            capsys.readouterr().out.strip().splitlines()]
    after = {r["doc_id"]: r["component_id"] for r in rows}
    assert 7 not in after
    assert after[1] != after[4]  # the merge-through-7 un-did


@pytest.mark.slow
def test_compact_then_append_stays_exact(spark, tmp_path):
    """Compaction is a pure rewrite: serves bit-identical, segments
    fold to one (plain artifact reads again), and a FURTHER append on
    the compacted map still equals the full rebuild."""
    from queens_spark.store.cluster_map import compact_cluster_map

    b1 = [(1, "a b c d"), (2, "a b c e"), (4, "p q r s")]
    b2 = [(5, "p q r t"), (6, "a b c d")]
    b3 = [(7, "a b c d p q r s")]
    f1, f2, f3 = (
        spark.createDataFrame(rows, ["doc_id", "text"])
        for rows in (b1, b2, b3)
    )
    d = str(tmp_path / "m")
    _build(f1, d, max_df=4)
    cm = append_cluster_map(f2, d, token="t1")
    snap = _snap(cm)
    assert compact_cluster_map(spark, d) == 2
    cm2 = load_cluster_map(spark, d)
    assert cm2.describe()["segments"] == 1
    assert _snap(cm2) == snap
    # idempotent no-op on an already-compact map
    assert compact_cluster_map(spark, d) == 0
    cm3 = append_cluster_map(f3, d, token="t2")
    rebuilt = _build(
        f1.union(f2).union(f3), str(tmp_path / "r"), max_df=4
    )
    assert _snap(cm3) == _snap(rebuilt)


@pytest.mark.slow
def test_maintain_compacts_registered_cluster_map(spark, tmp_path):
    from tests.test_index_registry import _engine_with_indexes, _frame

    eng = _engine_with_indexes(spark, tmp_path)
    seed = _frame(
        spark,
        [(i, f"seed document number {i} alpha beta gamma") for i in range(8)],
    )
    eng.build_cluster_map(seed, "text", "doc_id", "cm", n=1, threshold=0.5)
    eng.register_index("docs", "cluster", "cm")
    batch = _frame(spark, [(30, "wholly novel content nothing shared")])
    eng.ingest(
        batch, "docs", "m1",
        dedup_text_col="text", dedup_id_col="doc_id", token="tm1",
    )
    cm = eng.cluster_map("cm")
    assert cm.describe()["segments"] == 2
    snap = sorted(
        (r["doc_id"], r["component_id"]) for r in cm.members().collect()
    )
    report = eng.maintain("docs")
    assert "cluster:cm" in report["compacted"]
    cm2 = eng.cluster_map("cm")
    assert cm2.describe()["segments"] == 1
    assert cm2.describe()["applied_tokens"] == 0
    assert sorted(
        (r["doc_id"], r["component_id"]) for r in cm2.members().collect()
    ) == snap


@pytest.mark.slow
def test_build_or_load_auto_max_df_matches_stored(spark, docs, tmp_path):
    """'auto' matches whatever cap the stored map froze; an explicit
    mismatching int forces a rebuild."""
    d = str(tmp_path / "cm")
    cm = build_cluster_map(docs, "text", "doc_id", d, fingerprint="fp")
    cm2 = build_or_load_cluster_map(
        docs, "text", "doc_id", d, fingerprint="fp"
    )
    assert cm2.entry["version"] == cm.entry["version"]
    cm3 = build_or_load_cluster_map(
        docs, "text", "doc_id", d, fingerprint="fp",
        max_df=cm.entry["max_df"] + 7,
    )
    assert cm3.entry["version"] == cm.entry["version"] + 1


# ------------------------------------------------- coverage-scoped retire

def _retire(spark, d, ids):
    from queens_spark.store.cluster_map import retire_cluster_map

    return retire_cluster_map(spark, d, ids)


@pytest.mark.slow
def test_retire_equals_rebuild_minus_docs(spark, tmp_path):
    A = spark.createDataFrame(
        [
            (1, "a b c d"), (2, "a b c e"), (3, "a b c f"),  # cluster
            (4, "p q r s"), (5, "p q r t"),                   # cluster
            (6, "x y z w"),                                    # isolated
        ],
        ["doc_id", "text"],
    )
    d = str(tmp_path / "m")
    _build(A, d, max_df=10)
    cm = _retire(spark, d, [2, 6])
    survivors = A.where(~F.col("doc_id").isin([2, 6]))
    rebuilt = _build(survivors, str(tmp_path / "r"), max_df=10)
    assert _snap(cm) == _snap(rebuilt)
    assert cm.describe()["n_docs"] == 4
    assert cm.describe()["retirements"] == 1


@pytest.mark.slow
def test_retire_splits_component(spark, tmp_path):
    """Removing the bridge doc must SPLIT its component — the stored
    edge list makes the re-CC exact."""
    A = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "a b c d p q r s"),  # bridge: J=0.5 to both sides
            (3, "p q r s"),
        ],
        ["doc_id", "text"],
    )
    d = str(tmp_path / "m")
    cm0 = _build(A, d, max_df=10)
    before = {r["doc_id"]: r["component_id"] for r in cm0.members().collect()}
    assert before[1] == before[3]  # one component through the bridge
    cm = _retire(spark, d, [2])
    rebuilt = _build(
        A.where(F.col("doc_id") != 2), str(tmp_path / "r"), max_df=10
    )
    assert _snap(cm) == _snap(rebuilt)
    after = {r["doc_id"]: r["component_id"] for r in cm.members().collect()}
    assert after[1] != after[3]  # split
    assert set(after) == {1, 3}


@pytest.mark.slow
def test_retire_canonical_reelects_and_tombstones(spark, tmp_path):
    """Retiring a cluster's quality-best canonical re-elects the next
    best; retiring a whole cluster tombstones its component id."""
    A = spark.createDataFrame(
        [
            (1, "a b c d"), (2, "a b c d"), (3, "a b c d"),
            (7, "x y z w"), (8, "x y z v"),
        ],
        ["doc_id", "text"],
    )
    d = str(tmp_path / "m")
    cm0 = _build(A, d, max_df=10)
    canon0 = {
        r["component_id"]: r["best_doc_id"]
        for r in cm0.canonical().collect()
    }
    comp_of = {
        r["doc_id"]: r["component_id"] for r in cm0.members().collect()
    }
    best_137 = canon0[comp_of[1]]
    cm = _retire(spark, d, [best_137])
    rebuilt = _build(
        A.where(F.col("doc_id") != best_137), str(tmp_path / "r"),
        max_df=10,
    )
    assert _snap(cm) == _snap(rebuilt)
    # retire the REST of the {x y z} cluster → component vanishes
    cm = _retire(spark, d, [7, 8])
    rebuilt2 = _build(
        A.where(~F.col("doc_id").isin([best_137, 7, 8])),
        str(tmp_path / "r2"), max_df=10,
    )
    assert _snap(cm) == _snap(rebuilt2)
    assert comp_of[7] not in {
        r["component_id"] for r in cm.canonical().collect()
    }


@pytest.mark.slow
def test_retire_copy_rep_restars(spark, tmp_path):
    """Exact-copy group whose rep (min id) retires re-stars under the
    next-min survivor, including NULL-text fp groups."""
    A = spark.createDataFrame(
        [(10, "a b c d"), (11, "a b c d"), (12, "a b c d"),
         (20, None), (21, None), (22, None)],
        "doc_id bigint, text string",
    )
    d = str(tmp_path / "m")
    _build(A, d, max_df=10)
    cm = _retire(spark, d, [10, 20])
    rebuilt = _build(
        A.where(~F.col("doc_id").isin([10, 20])), str(tmp_path / "r"),
        max_df=10,
    )
    assert _snap(cm) == _snap(rebuilt)
    edges = {(r["a"], r["b"]) for r in cm.edges().collect()}
    assert (11, 12) in edges and (21, 22) in edges


def _no_band_partner(spark, base_words, n_shared):
    """Search (one Spark job) for a near-dup partner of the doc made of
    *base_words* that shares NO LSH band with it — the pair is then
    invisible to the band path and detectable only via rare shingles."""
    from queens_spark.operators.dedup import (
        _signature_from_hashes,
        band_frame,
        shingle_hashes,
    )

    cands = [(0, " ".join(base_words))] + [
        (k, " ".join(base_words[:n_shared] + [f"u{k}x", f"u{k}y"]))
        for k in range(1, 60)
    ]
    frame = spark.createDataFrame(cands, ["doc", "text"])
    sigs = frame.select(
        "doc", _signature_from_hashes(shingle_hashes("text", 1)).alias("sig")
    )
    bands = band_frame(sigs).collect()
    base = {
        (r["band_id"], r["band_sig"]) for r in bands if r["doc"] == 0
    }
    by_doc = {}
    for r in bands:
        by_doc.setdefault(r["doc"], set()).add((r["band_id"], r["band_sig"]))
    for k in range(1, 60):
        if not (by_doc[k] & base):
            return dict(cands)[k]
    raise AssertionError("no band-free partner found in 59 candidates")


@pytest.mark.slow
def test_retire_unflips_hot_shingle_exactly(spark, tmp_path):
    """THE un-flip corner: retiring a carrier drops a shingle's df back
    under the frozen cap, so a carrier pair that shares only hot
    shingles and no LSH band — not an edge while the shingle was hot —
    becomes a rare-path edge, exactly as the survivor rebuild decides.
    A further append must also stay exact (the postings COMPLETION
    rows for the un-flipped shingle's hot-era carriers feed it)."""
    words = [f"w{i}z" for i in range(10)]
    b_text = _no_band_partner(spark, words, 8)
    A = spark.createDataFrame(
        [
            (1, " ".join(words)),   # a
            (2, b_text),             # shares w0..w7 only; no shared band
            (3, " ".join(words)),   # copy of a
            (4, " ".join(words)),   # copy of a
        ],
        ["doc_id", "text"],
    )
    d = str(tmp_path / "m")
    cm0 = _build(A, d, max_df=3)   # df(w0..w7) = 4 > 3 → hot
    before = {r["doc_id"]: r["component_id"] for r in cm0.members().collect()}
    assert before[2] != before[1], "partner banded with base — bad search"
    cm = _retire(spark, d, [4])    # df(w0..w7) → 3 <= 3: un-flip
    rebuilt = _build(
        A.where(F.col("doc_id") != 4), str(tmp_path / "r"), max_df=3
    )
    assert _snap(cm) == _snap(rebuilt)
    after = {r["doc_id"]: r["component_id"] for r in cm.members().collect()}
    assert after[1] == after[2]  # the rare path surfaced the pair
    # append a new doc overlapping the un-flipped shingles: re-flips
    # them, and the affected-carrier lookup rides the completion rows
    B = spark.createDataFrame(
        [(9, " ".join(words[:8] + ["q1x", "q2x"]))], ["doc_id", "text"]
    )
    cm2 = append_cluster_map(B, d)
    rebuilt2 = _build(
        A.where(F.col("doc_id") != 4).union(B),
        str(tmp_path / "r2"), max_df=3,
    )
    assert _snap(cm2) == _snap(rebuilt2)


@pytest.mark.slow
def test_reappend_retired_id_serves_new_rows(spark, tmp_path):
    """The document-revision route: retire the old id, re-append the
    revised text under the SAME id — coverage-scoped tombstones hide
    only the old rows, so the map equals a rebuild on the revised
    corpus."""
    A = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "p q r s")],
        ["doc_id", "text"],
    )
    d = str(tmp_path / "m")
    _build(A, d, max_df=10)
    _retire(spark, d, [1])
    revised = spark.createDataFrame([(1, "p q r u")], ["doc_id", "text"])
    cm = append_cluster_map(revised, d)
    rebuilt = _build(
        A.where(F.col("doc_id") != 1).union(revised),
        str(tmp_path / "r"), max_df=10,
    )
    assert _snap(cm) == _snap(rebuilt)
    after = {r["doc_id"]: r["component_id"] for r in cm.members().collect()}
    assert after[1] == after[3]  # the REVISED text clusters with 3 now


@pytest.mark.slow
def test_retire_then_compact_applies_physically(spark, tmp_path):
    """Compaction folds retirement tombstones into the bytes: serves
    unchanged, retirement metadata clears, and a further append on the
    compacted map still equals the rebuild."""
    from queens_spark.store.cluster_map import compact_cluster_map

    A = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "a b c f"), (4, "p q r s")],
        ["doc_id", "text"],
    )
    d = str(tmp_path / "m")
    _build(A, d, max_df=10)
    cm = _retire(spark, d, [2])
    snap = _snap(cm)
    assert compact_cluster_map(spark, d) == 2
    cm2 = load_cluster_map(spark, d)
    assert _snap(cm2) == snap
    assert cm2.describe()["segments"] == 1
    assert cm2.describe()["retirements"] == 0
    B = spark.createDataFrame([(9, "p q r t")], ["doc_id", "text"])
    cm3 = append_cluster_map(B, d)
    rebuilt = _build(
        A.where(F.col("doc_id") != 2).union(B), str(tmp_path / "r"),
        max_df=10,
    )
    assert _snap(cm3) == _snap(rebuilt)


@pytest.mark.slow
def test_retire_absent_ids_and_empty_list_noop(spark, tmp_path):
    A = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e")], ["doc_id", "text"]
    )
    d = str(tmp_path / "m")
    cm = _build(A, d)
    snap, v = _snap(cm), cm.entry["version"]
    cm2 = _retire(spark, d, [])
    assert _snap(cm2) == snap and cm2.entry["version"] == v
    cm3 = _retire(spark, d, [999, 1000])
    assert _snap(cm3) == snap and cm3.entry["version"] == v


@pytest.mark.slow
def test_retire_append_interleave_property(spark, tmp_path):
    """Randomized retire/append/COMPACT interleavings against
    from-scratch rebuilds on the live set — exercises splits, merges,
    un-flips, copy-rep moves, repeat retirements, coverage scoping,
    and physical tombstone folding in one sweep."""
    from queens_spark.store.cluster_map import compact_cluster_map

    vocab = ["a", "b", "c", "d", "e", "f", "g", "h"]
    for seed in range(3):
        rng = random.Random(100 + seed)
        rows = {}
        next_id = 1
        d = str(tmp_path / f"m{seed}")

        def frame(items):
            return spark.createDataFrame(items, ["doc_id", "text"])

        first = []
        for _ in range(10):
            k = rng.randint(0, 6)
            first.append(
                (next_id, " ".join(rng.choice(vocab) for _ in range(k)))
            )
            next_id += 1
        rows.update(dict(first))
        _build(frame(first), d, max_df=3)
        for step in range(4):
            op = rng.random()
            if op < 0.2:
                compact_cluster_map(spark, d)
            elif op < 0.55 and rows:
                doomed = rng.sample(
                    sorted(rows), k=min(len(rows), rng.randint(1, 3))
                )
                for x in doomed:
                    rows.pop(x)
                _retire(spark, d, doomed)
            else:
                batch = []
                for _ in range(rng.randint(1, 4)):
                    k = rng.randint(0, 6)
                    batch.append(
                        (next_id,
                         " ".join(rng.choice(vocab) for _ in range(k)))
                    )
                    next_id += 1
                rows.update(dict(batch))
                append_cluster_map(frame(batch), d)
            cm = load_cluster_map(spark, d)
            rebuilt = _build(
                frame(sorted(rows.items())),
                str(tmp_path / f"r{seed}_{step}"), max_df=3,
            )
            assert _snap(cm) == _snap(rebuilt), (
                f"seed {seed} step {step} diverged"
            )


@pytest.mark.slow
def test_retire_crash_retry_succeeds(spark, tmp_path):
    """A retirement that crashed before its manifest flip leaves the
    live map intact (the counters never advanced, so its dirs are
    orphans); the retry clears them and lands."""
    A = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "p q r s")],
        ["doc_id", "text"],
    )
    d = str(tmp_path / "m")
    cm = _build(A, d, max_df=10)
    snap = _snap(cm)
    # simulate the crash: junk where the retirement would write
    for prefix, counter in (("seg", "next_seg"), ("graph", "next_graph")):
        nxt = os.path.join(d, f"{prefix}_{cm.entry[counter]:06d}", "members")
        os.makedirs(nxt)
        with open(os.path.join(nxt, "part-junk.parquet"), "w") as fh:
            fh.write("crashed")
    assert _snap(load_cluster_map(spark, d)) == snap  # live map intact
    cm2 = _retire(spark, d, [2])
    rebuilt = _build(
        A.where(F.col("doc_id") != 2), str(tmp_path / "r"), max_df=10
    )
    assert _snap(cm2) == _snap(rebuilt)
