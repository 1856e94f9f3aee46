"""Drift statistic (operators/drift.py) + persisted corpus profile
inside ingest (store/corpus_profile.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from queens_spark.operators.drift import (
    PPM,
    drift_from_counters,
    group_drift_scores,
    hist_counts,
)
from queens_spark.operators.text import token_count


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


def test_group_drift_matches_python_twin(spark):
    rows = []
    i = 0
    spec = [
        ("a", [3, 3, 7, 12, 25]),
        ("b", [3, 3, 7, 12, 25]),   # identical shape to a
        ("c", [55, 60, 61, 62, 3]),  # shifted regime
    ]
    for source, lens in spec:
        for n in lens:
            rows.append((i, source, " ".join(["w"] * n)))
            i += 1
    docs = _mkdocs(spark, rows)
    got = {
        r["source"]: (r["n_rows"], r["drift_score"])
        for r in group_drift_scores(
            docs, token_count("text"), "source", width=10, n_buckets=4
        ).collect()
    }

    def bucket(n):
        return min(n // 10, 3)

    from collections import Counter

    per = {s: Counter() for s, _ in spec}
    for _, s, t in rows:
        per[s][bucket(len(t.split()))] += 1
    glob = sum((per[s] for s, _ in spec), Counter())
    for s, _ in spec:
        n_rows, score = got[s]
        assert n_rows == sum(per[s].values())
        assert score == drift_from_counters(dict(per[s]), dict(glob))
    # identical sources score identically; the shifted one dominates
    assert got["a"] == got["b"]
    assert got["c"][1] > got["a"][1] >= 0


def test_identical_distributions_score_zero(spark):
    rows = [(i, "s", " ".join(["w"] * (5 + i % 3))) for i in range(30)]
    docs = _mkdocs(spark, rows)
    out = group_drift_scores(
        docs, token_count("text"), "source", width=5, n_buckets=4
    ).collect()
    # one source IS the corpus: shares equal, drift exactly 0
    assert out[0]["drift_score"] == 0


def test_drift_from_counters_envelope():
    # ppm shares bound every term regardless of magnitude
    huge_a = {0: 10**12}
    huge_r = {1: 10**12}
    assert drift_from_counters(huge_a, huge_r) <= 2 * PPM**2
    assert drift_from_counters({}, huge_r) == 0
    assert drift_from_counters(huge_a, {}) == 0


def test_hist_counts_tail_bucket(spark):
    docs = _mkdocs(spark, [(1, "s", " ".join(["w"] * 500))])
    rows = hist_counts(docs, token_count("text"), 10, 4).collect()
    assert rows == [rows[0]] and rows[0]["bucket"] == 3  # tail absorbed


# ------------------------------------------------- profile lifecycle

@pytest.fixture()
def eng(spark, tmp_path):
    from queens_spark.core.schema import CollectionSchema, ColumnSpec
    from queens_spark.facade import Engine

    schemas = {
        "docs": CollectionSchema(
            "docs",
            [
                ColumnSpec("ingest_id", "INTEGER", nullable=False),
                ColumnSpec("table_name", "TEXT", nullable=False),
                ColumnSpec("doc_id", "TEXT", nullable=False),
                ColumnSpec("text", "TEXT", nullable=False),
            ],
        )
    }
    return Engine(spark, str(tmp_path / "wh"), schemas=schemas)


def _batch(spark, ids, n_tokens):
    rows = [
        (str(i), " ".join(f"tok{i}_{j}" for j in range(n_tokens)))
        for i in ids
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.mark.slow
def test_profile_updates_and_drift_in_ingest_log(spark, eng):
    b1 = _batch(spark, range(10), 5)
    b2 = _batch(spark, range(100, 110), 5)   # same shape
    b3 = _batch(spark, range(200, 210), 900)  # length regime shift
    for i, b in enumerate((b1, b2, b3)):
        eng.ingest(
            b, "docs", f"t{i}",
            dedup_text_col="text", dedup_id_col="doc_id",
        )
    prof = eng.corpus_profile("docs")
    assert sum(prof["hist"].values()) == 30
    vers = eng.get_versions("docs").collect()
    descs = {r["table_name"]: r["table_description"] for r in vers}
    import json, re

    def drift_of(table):
        m = re.search(r"drift (\{.*\})", descs[table])
        return json.loads(m.group(1))

    assert drift_of("t0")["drift"] == 0            # first batch: no reference
    assert drift_of("t1")["drift"] == 0            # same distribution
    assert drift_of("t2")["drift"] > 100_000       # regime shift flagged
    assert drift_of("t2")["corpus_rows"] == 20     # scored vs pre-batch corpus


def test_profile_token_replay_is_idempotent(spark, eng):
    from queens_spark.store.corpus_profile import read_profile, update_profile

    b = _batch(spark, range(10), 5)
    d = str(eng._profiles_dir())
    s1 = update_profile(b, token_count("text"), d, "p", token="tok-1")
    s2 = update_profile(b, token_count("text"), d, "p", token="tok-1")
    assert s1 == s2
    assert sum(read_profile(d, "p")["hist"].values()) == 10  # added once


def test_profile_param_mismatch_refused(spark, eng):
    from queens_spark.store.corpus_profile import update_profile

    b = _batch(spark, range(5), 5)
    d = str(eng._profiles_dir())
    update_profile(b, token_count("text"), d, "p2", width=50, n_buckets=20)
    with pytest.raises(ValueError, match="mismatched"):
        update_profile(b, token_count("text"), d, "p2", width=10, n_buckets=20)


@pytest.mark.slow
def test_maintain_profile_tokens_follow_ledger(spark, eng):
    b1 = _batch(spark, range(10), 5)
    b2 = _batch(spark, range(100, 110), 5)
    eng.ingest(
        b1, "docs", "t0",
        dedup_text_col="text", dedup_id_col="doc_id", token="tk-a",
    )
    # SINGLE-segment ledger: compaction no-ops and KEEPS its token map
    # → the profile must keep its twin too (dropping it would double-
    # add the histogram when the ledger replays tk-a's acceptance)
    report = eng.maintain("docs")
    assert report["ledger_segments_merged"] == 0
    assert report["profile_tokens_cleared"] == 0
    assert "tk-a" in eng.corpus_profile("docs")["applied_tokens"]
    eng.ingest(
        b1, "docs", "t0r",
        dedup_text_col="text", dedup_id_col="doc_id", token="tk-a",
    )  # ledger replay fires the profile append — token map absorbs it
    assert sum(eng.corpus_profile("docs")["hist"].values()) == 10

    # TWO segments: compaction merges, clears the ledger token map,
    # and the profile tokens follow
    eng.ingest(
        b2, "docs", "t1",
        dedup_text_col="text", dedup_id_col="doc_id", token="tk-b",
    )
    report = eng.maintain("docs")
    assert report["ledger_segments_merged"] >= 2
    assert report["profile_tokens_cleared"] == 2
    assert not eng.corpus_profile("docs").get("applied_tokens")
    # replay after clearing: the compacted ledger re-screens the batch
    # to accepted=0, ingest no-ops, the histogram is NOT re-added
    out = eng.ingest(
        b2, "docs", "t1r",
        dedup_text_col="text", dedup_id_col="doc_id", token="tk-b",
    )
    assert out is None
    assert sum(eng.corpus_profile("docs")["hist"].values()) == 20


def test_categorical_drift_from_buckets(spark):
    from queens_spark.operators.drift import group_drift_from_buckets
    from queens_spark.operators.text import char_poly_hash

    rows = (
        [("d1", t) for t in ["a"] * 8 + ["b"] * 2]
        + [("d2", t) for t in ["a"] * 8 + ["b"] * 2]   # same mix as d1
        + [("d3", t) for t in ["b"] * 9 + ["a"]]        # inverted mix
    )
    df = spark.createDataFrame(rows, ["day", "event_type"])
    got = {
        r["day"]: r["drift_score"]
        for r in group_drift_from_buckets(
            df, char_poly_hash(F.col("event_type")) % F.lit(32), "day"
        ).collect()
    }
    assert got["d1"] == got["d2"]       # identical mixes score equal
    assert got["d3"] > got["d1"]        # the inverted day dominates


@pytest.mark.slow
def test_max_drift_admission_gate(spark, eng):
    b1 = _batch(spark, range(10), 5)
    eng.ingest(
        b1, "docs", "t0", dedup_text_col="text", dedup_id_col="doc_id",
    )
    shifted = _batch(spark, range(100, 110), 900)
    with pytest.raises(ValueError, match="ingest rejected"):
        eng.ingest(
            shifted, "docs", "t1",
            dedup_text_col="text", dedup_id_col="doc_id",
            max_drift=100_000,
        )
    # rejection left EVERY artifact untouched: profile, ledger, log
    assert sum(eng.corpus_profile("docs")["hist"].values()) == 10
    assert eng.get_versions("docs").count() == 1
    # the same batch re-offered without content changes still screens
    # as novel (the ledger never saw it)
    out = eng.ingest(
        shifted, "docs", "t1",
        dedup_text_col="text", dedup_id_col="doc_id",
    )
    assert out is not None
    # a short-doc batch vs the now-bimodal corpus drifts ~1e6 (half
    # the mass moved buckets): a gate above that admits it
    ok = _batch(spark, range(200, 210), 5)
    assert eng.ingest(
        ok, "docs", "t2", dedup_text_col="text", dedup_id_col="doc_id",
        max_drift=1_100_000,
    ) is not None


def test_stream_gates_against_stored_ecdf_reference(spark, tmp_path):
    """The stored-baseline monitor: a registered ECDF store (kept
    fresh through the registry ingest chain) supplies the pooled
    reference that STREAMING micro-batches gate against — batch drift
    matrices and the stream score against the SAME artifact, with the
    exact integer chi-square matching the driver-side twin."""
    import json
    import os

    from queens_spark.facade import Engine
    from queens_spark.operators.drift import (
        bucketize,
        drift_from_count_frame_vs_reference,
        drift_from_counters,
    )
    from tests.test_index_registry import _engine_with_indexes, _frame

    eng = _engine_with_indexes(spark, tmp_path)
    seed = _frame(
        spark,
        [(i, f"seed document number {i} alpha beta gamma") for i in range(8)],
    )
    eng.build_ecdf_store(
        seed.withColumn("table_name", F.lit("seed")), "table_name",
        "size(filter(split(text, '\\\\s+'), x -> x != ''))", "lens",
        width=2, n_buckets=8,
    )
    eng.register_index("docs", "ecdf", "lens")
    # registry ingest keeps the stored baseline fresh before streaming
    eng.ingest(
        _frame(spark, [(40, "registry refreshed content here now")])
        .withColumn("table_name", F.lit("b1")),
        "docs", "b1",
        dedup_text_col="text", dedup_id_col="doc_id", token="te1",
    )
    st = eng.ecdf_store("lens")
    ref = st.pooled_counters()
    assert sum(ref.values()) == 9  # 8 seed + 1 refreshed

    # stream micro-batches; foreachBatch gates vs the STORED reference
    src = str(tmp_path / "in")
    os.makedirs(src)
    with open(os.path.join(src, "b.json"), "w") as fh:
        for i, t in [
            (100, "in distribution document six tokens x"),
            (101, "way way way way way way way way way out of "
                  "distribution document with a very long tail of "
                  "tokens that the reference never saw at all ever"),
        ]:
            fh.write(json.dumps({"doc_id": i, "text": t}) + "\n")
    scores: dict[int, int] = {}

    def gate(batch_df, batch_id):
        from queens_spark.operators.text import token_count

        counts = (
            batch_df.select(
                F.col("doc_id"),
                bucketize(token_count("text"), 2, 8).alias("bucket"),
            )
            .groupBy("doc_id", "bucket")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        )
        for r in drift_from_count_frame_vs_reference(
            counts, "doc_id", ref
        ).collect():
            scores[int(r["doc_id"])] = int(r["drift_score"])

    q = (
        spark.readStream.schema("doc_id bigint, text string")
        .json(src)
        .writeStream.foreachBatch(gate)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert set(scores) == {100, 101}
    assert scores[101] > scores[100]  # the outlier screams
    # exactness: the distributed score equals the driver-side twin on
    # the same counters (per-doc batch histogram vs stored reference)
    from queens_spark.operators.text import token_count as _tc

    per_doc = {100: {}, 101: {}}
    rows = (
        spark.read.json(src)
        .select("doc_id", bucketize(_tc("text"), 2, 8).alias("b"))
        .collect()
    )
    for r in rows:
        d = per_doc[int(r["doc_id"])]
        d[int(r["b"])] = d.get(int(r["b"]), 0) + 1
    for doc, batch in per_doc.items():
        assert scores[doc] == drift_from_counters(batch, ref), doc
