"""Persistent dedup ledger: cross-run screening, crash-safe segment
appends, compaction, Engine surface."""

import os

import pytest
from pyspark.sql import Row

from queens_spark.store.dedup_ledger import (
    compact_ledger,
    ingest_deduped,
    ledger_fingerprints,
)


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def test_cross_run_screen_and_stats(spark, tmp_path):
    ldir = str(tmp_path / "ledger")
    b1 = _docs(spark, [(0, "alpha beta"), (1, "Alpha  beta"),  # dup of 0
                       (2, "gamma")])
    fresh1, s1 = ingest_deduped(b1, "text", "doc_id", ldir)
    assert s1 == {"batch": 3, "in_batch_dupes": 1,
                  "ledger_dupes": 0, "accepted": 2}
    assert {r["doc_id"] for r in fresh1.collect()} == {0, 2}

    # run 2: one ledger dup (gamma), one in-batch dup, one new
    b2 = _docs(spark, [(10, "gamma"), (11, "delta"),
                       (12, "delta"), (13, "epsilon")])
    fresh2, s2 = ingest_deduped(b2, "text", "doc_id", ldir)
    assert s2 == {"batch": 4, "in_batch_dupes": 1,
                  "ledger_dupes": 1, "accepted": 2}
    assert {r["doc_id"] for r in fresh2.collect()} == {11, 13}

    # fresh frame stays stable when evaluated AFTER the manifest flip
    assert fresh2.count() == 2

    led = ledger_fingerprints(spark, ldir)
    assert led.count() == 4  # alpha-beta, gamma, delta, epsilon
    assert {r["doc_id"] for r in led.collect()} == {0, 2, 11, 13}


def test_empty_ledger_returns_none(spark, tmp_path):
    assert ledger_fingerprints(spark, str(tmp_path / "nope")) is None


def test_orphan_segment_invisible(spark, tmp_path):
    """A segment dir the manifest never listed (crash mid-ingest) is
    not part of the ledger."""
    ldir = str(tmp_path / "ledger")
    ingest_deduped(_docs(spark, [(0, "a")]), "text", "doc_id", ldir)
    # fully-written but never-flipped segment
    spark.createDataFrame(
        [Row(fingerprint="deadbeef", doc_id=99)]
    ).write.parquet(os.path.join(ldir, "seg_orphan"))
    assert ledger_fingerprints(spark, ldir).count() == 1


def test_compact_merges_segments_content_unchanged(spark, tmp_path):
    ldir = str(tmp_path / "ledger")
    for i, t in enumerate(["a", "b", "c"]):
        ingest_deduped(_docs(spark, [(i, t)]), "text", "doc_id", ldir)
    before = {(r["fingerprint"], r["doc_id"])
              for r in ledger_fingerprints(spark, ldir).collect()}
    assert compact_ledger(spark, ldir) == 3
    after = {(r["fingerprint"], r["doc_id"])
             for r in ledger_fingerprints(spark, ldir).collect()}
    assert after == before
    assert compact_ledger(spark, ldir) == 0  # single segment: no-op
    # the compacted ledger still screens
    _, s = ingest_deduped(
        _docs(spark, [(9, "b"), (10, "z")]), "text", "doc_id", ldir)
    assert s["ledger_dupes"] == 1 and s["accepted"] == 1


def test_engine_surface(spark, tmp_path):
    from queens_spark.facade import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    fresh, s = eng.ingest_deduped(
        _docs(spark, [(0, "x"), (1, "x")]), "text", "doc_id")
    assert s["accepted"] == 1 and fresh.count() == 1
    # a second Engine on the same root sees the same ledger
    eng2 = Engine(spark, str(tmp_path / "wh"))
    _, s2 = eng2.ingest_deduped(
        _docs(spark, [(5, "x"), (6, "y")]), "text", "doc_id")
    assert s2["ledger_dupes"] == 1 and s2["accepted"] == 1


def test_fuzzy_ledger_screens_near_dups_across_runs(spark, tmp_path):
    """MinHash mode: near-identical (not byte-identical) content is
    dropped both in-batch and against earlier runs; unrelated text
    survives; short unshingleable docs screen exactly only."""
    ldir = str(tmp_path / "fuzzy")
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight")
    nearA = base.replace("tonight", "today")       # ~1-word edit
    nearB = base.replace("quick", "rapid")
    other = ("completely different content about spark shuffles "
             "partitions exchanges codegen and adaptive execution "
             "plans at terabyte scale with broadcast joins")
    b1 = _docs(spark, [(0, base), (1, nearA), (2, other), (3, "hi")])
    fresh1, s1 = ingest_deduped(b1, "text", "doc_id", ldir,
                                near_dup_threshold=0.6)
    assert {r["doc_id"] for r in fresh1.collect()} == {0, 2, 3}
    assert s1["in_batch_near_dupes"] == 1 and s1["accepted"] == 3

    b2 = _docs(spark, [(10, nearB),       # near-dup of run-1 doc 0
                       (11, other),       # exact dup of run-1 doc 2
                       (12, "hi"),        # exact dup (unshingleable)
                       (13, "fresh short text never seen before with "
                            "plenty of shingles to hash properly")])
    fresh2, s2 = ingest_deduped(b2, "text", "doc_id", ldir,
                                near_dup_threshold=0.6)
    assert {r["doc_id"] for r in fresh2.collect()} == {13}
    assert s2["ledger_dupes"] == 2          # exact: other + "hi"
    assert s2["ledger_near_dupes"] == 1     # fuzzy: nearB
    assert s2["accepted"] == 1


def test_fuzzy_and_exact_modes_do_not_mix(spark, tmp_path):
    ldir = str(tmp_path / "ledger")
    ingest_deduped(_docs(spark, [(0, "a")]), "text", "doc_id", ldir)
    with pytest.raises(ValueError, match="modes don't mix"):
        ingest_deduped(_docs(spark, [(1, "b")]), "text", "doc_id",
                       ldir, near_dup_threshold=0.8)


def test_compact_preserves_mode(spark, tmp_path):
    """Compaction must not drop the manifest's mode — an exact ingest
    into a compacted fuzzy ledger would otherwise slip through."""
    ldir = str(tmp_path / "fledger")
    long = ("one two three four five six seven eight nine ten "
            "eleven twelve thirteen fourteen fifteen sixteen")
    ingest_deduped(_docs(spark, [(0, long)]), "text", "doc_id", ldir,
                   near_dup_threshold=0.6)
    ingest_deduped(_docs(spark, [(1, long + " extra")]), "text",
                   "doc_id", ldir, near_dup_threshold=0.6)
    assert compact_ledger(spark, ldir) == 2
    with pytest.raises(ValueError, match="modes don't mix"):
        ingest_deduped(_docs(spark, [(2, "zz")]), "text", "doc_id", ldir)
    # and the compacted fuzzy ledger still fuzzy-screens
    _, s = ingest_deduped(
        _docs(spark, [(3, long.replace("ten", "TEN"))]), "text",
        "doc_id", ldir, near_dup_threshold=0.6)
    assert s["ledger_near_dupes"] >= 0 and s["batch"] == 1


def test_compact_ingest_compact_cycle(spark, tmp_path):
    """Segment dir names never repeat: compact -> ingest x2 -> compact
    used to re-derive the SAME seg{n}__compacted name and overwrite a
    path it was reading (AnalysisException, permanently broken
    compaction). The manifest's monotonic counter prevents it."""
    ldir = str(tmp_path / "ledger")
    for i, t in enumerate(["a", "b", "c"]):
        ingest_deduped(_docs(spark, [(i, t)]), "text", "doc_id", ldir)
    assert compact_ledger(spark, ldir) == 3
    ingest_deduped(_docs(spark, [(10, "d")]), "text", "doc_id", ldir)
    ingest_deduped(_docs(spark, [(11, "e")]), "text", "doc_id", ldir)
    assert compact_ledger(spark, ldir) == 3  # used to explode here
    assert {r["doc_id"] for r in
            ledger_fingerprints(spark, ldir).collect()} == {0, 1, 2, 10, 11}
    # the cycle keeps working indefinitely
    ingest_deduped(_docs(spark, [(12, "f")]), "text", "doc_id", ldir)
    assert compact_ledger(spark, ldir) == 2
    assert ledger_fingerprints(spark, ldir).count() == 6


def test_legacy_manifest_without_counter(spark, tmp_path):
    """Pre-counter manifests (no next_seg key) derive the counter from
    the max numeric segment suffix on disk — no collision, no loss."""
    import json

    from queens_spark.store.dedup_ledger import _manifest_path

    ldir = str(tmp_path / "ledger")
    ingest_deduped(_docs(spark, [(0, "a")]), "text", "doc_id", ldir)
    ingest_deduped(_docs(spark, [(1, "b")]), "text", "doc_id", ldir)
    with open(_manifest_path(ldir)) as fh:
        m = json.load(fh)
    m.pop("next_seg")
    with open(_manifest_path(ldir), "w") as fh:
        json.dump(m, fh)
    ingest_deduped(_docs(spark, [(2, "c")]), "text", "doc_id", ldir)
    with open(_manifest_path(ldir)) as fh:
        m2 = json.load(fh)
    assert len(set(m2["segments"])) == 3
    assert {r["doc_id"] for r in
            ledger_fingerprints(spark, ldir).collect()} == {0, 1, 2}


def test_fuzzy_stats_are_consistent(spark, tmp_path):
    """Drop counts are COUNTED, not derived: every batch row is
    accounted for exactly once across the stats."""
    ldir = str(tmp_path / "fuzzy")
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight")
    b1 = _docs(spark, [(0, base), (1, base.replace("tonight", "today")),
                       (2, base), (3, "hi")])
    _, s1 = ingest_deduped(b1, "text", "doc_id", ldir,
                           near_dup_threshold=0.6)
    assert (s1["in_batch_dupes"] + s1["ledger_dupes"]
            + s1["in_batch_near_dupes"] + s1["ledger_near_dupes"]
            + s1["accepted"]) == s1["batch"]
    b2 = _docs(spark, [(10, base.replace("quick", "rapid")),
                       (11, "hi"), (12, "completely novel content with "
                       "enough distinct words to shingle and hash")])
    _, s2 = ingest_deduped(b2, "text", "doc_id", ldir,
                           near_dup_threshold=0.6)
    assert s2["ledger_near_dupes"] == 1 and s2["ledger_dupes"] == 1
    assert (s2["in_batch_dupes"] + s2["ledger_dupes"]
            + s2["in_batch_near_dupes"] + s2["ledger_near_dupes"]
            + s2["accepted"]) == s2["batch"]


@pytest.mark.slow
def test_ledger_wired_into_engine_ingest(spark, tmp_path):
    """Provenance happens INSIDE ingest: with dedup_* args,
    Engine.ingest screens the frame through the persistent ledger,
    appends only fresh content, records the stats in the version's
    table_description, and refuses to append an all-duplicate batch
    (returns None — an empty latest version would blank the staged
    table)."""
    import datetime

    from pyspark.sql import Row

    from queens_spark.facade import Engine

    eng = Engine(spark, str(tmp_path / "wh"))

    def frame(items):
        return spark.createDataFrame([
            Row(row=i, label=lab, year=2000 + i, fuel="gas",
                group="G", unit="u", value=float(i))
            for i, lab in items
        ])

    ts = datetime.datetime(2024, 1, 1)
    iid = eng.ingest(frame([(0, "alpha doc"), (1, "alpha  DOC"),
                            (2, "beta doc")]),
                     "dukes", "b1", ingest_ts=ts,
                     dedup_text_col="label", dedup_id_col="row")
    assert iid is not None
    eng.stage("dukes")
    got = {r["row"] for r in eng.query("dukes", "b1", {}).collect()}
    assert got == {0, 2}  # in-batch normalized dup dropped
    log = eng.warehouse.read_log("dukes").where("success = 1").collect()
    assert any(r["table_description"] and "dedup {" in
               r["table_description"] and '"accepted": 2' in
               r["table_description"] for r in log)

    # batch 2 under its OWN table_name: ledger drops the cross-batch
    # dup, only fresh content lands
    iid2 = eng.ingest(frame([(10, "beta doc"), (11, "gamma doc")]),
                      "dukes", "b2", ingest_ts=ts,
                      dedup_text_col="label", dedup_id_col="row")
    assert iid2 is not None
    eng.stage("dukes")
    assert {r["row"] for r in eng.query("dukes", "b2", {}).collect()} \
        == {11}
    # corpus = union of batch tables, duplicate-free across batches
    assert {r["row"] for r in eng.query("dukes", "b1", {}).collect()} \
        == {0, 2}

    # an all-duplicate batch appends NOTHING (and b2 stays intact)
    assert eng.ingest(frame([(20, "alpha doc"), (21, "gamma doc")]),
                      "dukes", "b2", ingest_ts=ts,
                      dedup_text_col="label", dedup_id_col="row") is None
    eng.stage("dukes")
    assert {r["row"] for r in eng.query("dukes", "b2", {}).collect()} \
        == {11}

    with pytest.raises(ValueError, match="go together"):
        eng.ingest(frame([(30, "x")]), "dukes", "b3",
                   dedup_text_col="label")


@pytest.mark.slow
def test_delete_from_ledger_takedown_and_reentry(spark, tmp_path):
    """Ledger retirement: retired fingerprints stop blocking, so the
    re-crawl-after-takedown flow accepts equivalent content again;
    coverage scoping keeps the re-accepted row live while the old one
    stays hidden; compaction applies deletes physically."""
    from pyspark.sql import Row

    from queens_spark.store.dedup_ledger import (
        compact_ledger,
        delete_from_ledger,
        ingest_deduped,
        ledger_fingerprints,
    )

    ldir = str(tmp_path / "ledger")

    def frame(items):
        return spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in items]
        )

    b1 = frame([(0, "alpha body"), (1, "beta body")])
    _, s1 = ingest_deduped(b1, "text", "doc_id", ldir)
    assert s1["accepted"] == 2
    # a dup is blocked while the ledger row lives
    _, s2 = ingest_deduped(frame([(9, "alpha body")]),
                           "text", "doc_id", ldir)
    assert s2["accepted"] == 0

    assert delete_from_ledger(spark, ldir, [0]) == 1
    assert ledger_fingerprints(spark, ldir).count() == 1
    # equivalent content re-enters under a new id
    _, s3 = ingest_deduped(frame([(9, "alpha body")]),
                           "text", "doc_id", ldir)
    assert s3["accepted"] == 1
    # ... and blocks again from now on
    _, s4 = ingest_deduped(frame([(12, "alpha body")]),
                           "text", "doc_id", ldir)
    assert s4["accepted"] == 0

    # coverage scoping: deleting id 9's ROW then re-accepting id 9
    # itself serves the NEW row, not the hidden old one
    delete_from_ledger(spark, ldir, [9])
    _, s5 = ingest_deduped(frame([(9, "alpha body")]),
                           "text", "doc_id", ldir)
    assert s5["accepted"] == 1
    assert ledger_fingerprints(spark, ldir).where(
        "doc_id = 9").count() == 1

    # compaction applies tombstones physically and the blocks survive
    merged = compact_ledger(spark, ldir)
    assert merged >= 2
    assert ledger_fingerprints(spark, ldir).count() == 2  # beta + alpha(9)
    _, s6 = ingest_deduped(frame([(20, "alpha body")]),
                           "text", "doc_id", ldir)
    assert s6["accepted"] == 0
    # deleting an id that is not in the ledger is a harmless no-op
    assert delete_from_ledger(spark, ldir, [999]) == 0


@pytest.mark.slow
def test_blocklist_bans_content_permanently(spark, tmp_path):
    """The blocklist is the stays-down half of takedowns: blocked
    fingerprints are dropped from every later ingest (reported as
    'blocked', not dupes) even after the acceptance row is retired."""
    from pyspark.sql import Row

    from queens_spark.store.dedup_ledger import (
        block_texts,
        delete_from_ledger,
        ingest_deduped,
    )

    ldir = str(tmp_path / "ledger")

    def frame(items):
        return spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in items]
        )

    _, s1 = ingest_deduped(frame([(0, "banned body"), (1, "ok body")]),
                           "text", "doc_id", ldir)
    assert s1["accepted"] == 2

    # retire + block id 0's content
    assert block_texts(spark, ldir, ["banned  BODY"]) == 1  # normalized
    delete_from_ledger(spark, ldir, [0])

    # equivalent content can NOT re-enter; ok content dupes normally
    fresh, s2 = ingest_deduped(
        frame([(5, "banned body"), (6, "ok body"), (7, "new body")]),
        "text", "doc_id", ldir,
    )
    assert s2["blocked"] == 1
    assert s2["ledger_dupes"] == 1
    assert s2["accepted"] == 1
    assert {r["doc_id"] for r in fresh.collect()} == {7}
    # pre-emptive ban: content never accepted anywhere
    assert block_texts(spark, ldir, ["future spam"]) == 1
    _, s3 = ingest_deduped(frame([(9, "future  spam")]),
                           "text", "doc_id", ldir)
    assert s3["blocked"] == 1 and s3["accepted"] == 0


@pytest.mark.slow
def test_near_blocklist_bans_trivial_edits(spark, tmp_path):
    """near_threshold blocking: a banned text's NEAR-duplicates (the
    watermark-stripping adversary) are dropped too — in exact-mode
    ledgers the batch signatures are computed only because a near
    segment exists, never otherwise."""
    from pyspark.sql import Row

    from queens_spark.store.dedup_ledger import (
        block_texts,
        ingest_deduped,
    )

    banned = ("the forbidden document about dangerous topics "
              "that must never enter the corpus " * 4)
    near = banned + "watermark2024"  # appended-watermark adversary
    far = ("an entirely different essay on gardening tulips and "
           "watering schedules in早春 temperate climates " * 4)

    ldir = str(tmp_path / "ledger")
    assert block_texts(spark, ldir, [banned], near_threshold=0.6) == 1

    def frame(items):
        return spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in items]
        )

    fresh, s = ingest_deduped(
        frame([(0, banned), (1, near), (2, far)]),
        "text", "doc_id", ldir,
    )
    assert s["blocked"] == 2          # exact + near
    assert s["accepted"] == 1
    assert {r["doc_id"] for r in fresh.collect()} == {2}

    # minhash-mode ledger: the near ban composes with fuzzy dedup
    ldir2 = str(tmp_path / "ledger2")
    block_texts(spark, ldir2, [banned], near_threshold=0.6)
    fresh2, s2 = ingest_deduped(
        frame([(5, near), (6, far)]),
        "text", "doc_id", ldir2, near_dup_threshold=0.7,
    )
    assert s2["blocked"] == 1
    assert s2["accepted"] == 1
    # a doc too short to shingle is screened exactly only (no crash)
    _, s3 = ingest_deduped(frame([(9, "tiny")]), "text", "doc_id", ldir)
    assert s3["accepted"] == 1 and s3["blocked"] == 0


def test_engine_block_texts_and_cli(spark, tmp_path, capsys):
    import json as _json

    from queens_spark.cli import main
    from queens_spark.facade import Engine
    from queens_spark.store.dedup_ledger import ingest_deduped

    root = str(tmp_path / "wh")
    eng = Engine(spark, root)
    assert eng.block_texts("docs", ["spam body one"]) == 1
    rc = main(["--warehouse", root, "block", "docs",
               "--text", "spam body two"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["blocked"] == 1

    from pyspark.sql import Row

    ldir = f"{root}/system/dedup_ledger/docs"
    _, s = ingest_deduped(
        spark.createDataFrame([
            Row(doc_id=0, text="SPAM  body one"),
            Row(doc_id=1, text="spam body two"),
            Row(doc_id=2, text="legit body"),
        ]),
        "text", "doc_id", ldir,
    )
    assert s["blocked"] == 2 and s["accepted"] == 1
