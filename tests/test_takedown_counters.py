"""Exact decremental retirement for the COUNTER stores.

``Engine.retire_documents`` reads the doomed rows back from the
warehouse's accepted batches (pre-purge) and:

- SUBTRACTS their histogram from every registered ECDF grid — serves
  equal ``build_ecdf_store`` on the survivors bit-for-bit;
- SUBTRACTS their token histogram from the corpus profile at its own
  stored geometry (the profile remembers its value column);
- overwrites the affected rollup winner segments with survivor
  partials (min/max cannot subtract, so the partials recompute from
  the still-readable doomed batches) — ``rollup`` equals the GROUP BY
  over the survivors;
- flags KMV sketches retired-pending-rebuild (``status`` stale) —
  bottom-k genuinely cannot subtract, and a rebuild clears the flag.

Appends AFTER a retirement stay exact under the same token contract
(histogram addition commutes with subtraction).
"""

import pytest
from pyspark.sql import Row, functions as F

from queens_spark.core.schema import CollectionSchema, ColumnSpec
from queens_spark.facade import Engine

VALUE_SQL = "size(filter(split(text, '\\\\s+'), x -> x != ''))"


def docs_schemas():
    return {
        "docs": CollectionSchema(
            "docs",
            [
                ColumnSpec("ingest_id", "INTEGER", nullable=False),
                ColumnSpec("table_name", "TEXT", nullable=False),
                ColumnSpec("doc_id", "INTEGER", nullable=False),
                ColumnSpec("text", "TEXT", nullable=False),
                ColumnSpec("lang", "TEXT"),
                ColumnSpec("score", "INTEGER"),
            ],
        )
    }


def _frame(spark, lo, hi):
    return spark.createDataFrame(
        [
            Row(
                doc_id=i,
                text="word " * (3 + (i * 5) % 11) + f"uniq{i}",
                lang=("fr" if i % 2 else "en"),
                score=(i * 13) % 97,
            )
            for i in range(lo, hi)
        ]
    )


def _hist_rows(store):
    return sorted(
        (r[store.group_col], int(r["bucket"]), int(r["n"]))
        for r in store.hist().collect()
    )


@pytest.fixture()
def engine(spark, tmp_path):
    eng = Engine(spark, str(tmp_path / "wh"), schemas=docs_schemas())
    b1 = _frame(spark, 0, 12)
    eng.build_ecdf_store(b1, "lang", VALUE_SQL, "lens", width=2, n_buckets=12)
    eng.register_index("docs", "ecdf", "lens")
    eng.build_sketch_store(b1, "lang", "doc_id", "sk")
    eng.register_index("docs", "sketch", "sk")
    eng.register_rollup("docs", "r1", keys=["lang"], values=["score"])
    # b1: warehouse plain (the stores already hold it), ledger via
    # ingest_deduped; b2 rides the full dedup path (store appends)
    eng.ingest(b1, "docs", "t0")
    eng.ingest_deduped(b1, "text", "doc_id", ledger="docs")
    eng.ingest(
        _frame(spark, 12, 20), "docs", "t1",
        dedup_text_col="text", dedup_id_col="doc_id",
    )
    return eng


@pytest.mark.slow
def test_ecdf_retire_equals_rebuild_on_survivors(spark, engine, tmp_path):
    eng = engine
    doomed = [1, 4, 13, 18]
    report = eng.retire_documents("docs", ids=doomed)
    assert "ecdf:lens (decremented)" in report["indexes"]
    survivors = (
        _frame(spark, 0, 20)
        .where(~F.col("doc_id").isin(doomed))
    )
    from queens_spark.store.ecdf_store import build_ecdf_store

    expected = build_ecdf_store(
        survivors, "lang", VALUE_SQL, str(tmp_path / "ref_ecdf"),
        "ref", width=2, n_buckets=12,
    )
    assert _hist_rows(eng.ecdf_store("lens")) == _hist_rows(expected)
    # thresholds (the serving verb) agree too
    got = sorted(
        tuple(r) for r in eng.ecdf_store("lens")
        .thresholds({"p50": 5000}).collect()
    )
    want = sorted(tuple(r) for r in expected.thresholds({"p50": 5000}).collect())
    assert got == want


@pytest.mark.slow
def test_append_after_retire_stays_exact(spark, engine, tmp_path):
    eng = engine
    eng.retire_documents("docs", ids=[0, 7, 15])
    eng.ingest(
        _frame(spark, 20, 26), "docs", "t2",
        dedup_text_col="text", dedup_id_col="doc_id",
    )
    survivors = (
        _frame(spark, 0, 26)
        .where(~F.col("doc_id").isin([0, 7, 15]))
    )
    from queens_spark.store.ecdf_store import build_ecdf_store

    expected = build_ecdf_store(
        survivors, "lang", VALUE_SQL, str(tmp_path / "ref_ecdf"),
        "ref", width=2, n_buckets=12,
    )
    assert _hist_rows(eng.ecdf_store("lens")) == _hist_rows(expected)


@pytest.mark.slow
def test_rollup_retire_equals_survivor_groupby(spark, engine):
    eng = engine
    report = eng.retire_documents("docs", ids=[2, 3, 14])
    assert report.get("rollups_recomputed") == ["r1"]
    got = sorted(
        (r["lang"], int(r["n_rows"]), int(r["score_sum"]),
         int(r["score_min"]), int(r["score_max"]))
        for r in eng.rollup("docs", "r1").collect()
    )
    survivors = (
        _frame(spark, 0, 20)
        .where(~F.col("doc_id").isin([2, 3, 14]))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("score").alias("s"),
            F.min("score").alias("mn"),
            F.max("score").alias("mx"),
        )
    )
    want = sorted(
        (r["lang"], int(r["n"]), int(r["s"]), int(r["mn"]), int(r["mx"]))
        for r in survivors.collect()
    )
    assert got == want
    # post-purge the lazily-repairable raw equals the same survivors
    eng.maintain("docs")
    got2 = sorted(
        (r["lang"], int(r["n_rows"]), int(r["score_sum"]),
         int(r["score_min"]), int(r["score_max"]))
        for r in eng.rollup("docs", "r1").collect()
    )
    assert got2 == want


def test_profile_retire_equals_survivor_rebuild(spark, tmp_path):
    eng = Engine(spark, str(tmp_path / "wh"), schemas=docs_schemas())
    eng.ingest(
        _frame(spark, 0, 12), "docs", "t0",
        dedup_text_col="text", dedup_id_col="doc_id",
    )
    eng.ingest(
        _frame(spark, 12, 20), "docs", "t1",
        dedup_text_col="text", dedup_id_col="doc_id",
    )
    doomed = [0, 5, 13, 19]
    report = eng.retire_documents("docs", ids=doomed)
    assert report["profile_decremented_rows"] == len(doomed)
    got = eng.corpus_profile("docs")["hist"]
    # rebuild the profile from the survivors at the same geometry
    from queens_spark.operators.text import token_count
    from queens_spark.store.corpus_profile import (
        read_profile,
        update_profile,
    )

    survivors = (
        _frame(spark, 0, 20).where(~F.col("doc_id").isin(doomed))
    )
    update_profile(
        survivors, token_count("text"), str(tmp_path / "ref_prof"),
        "ref",
    )
    want = read_profile(str(tmp_path / "ref_prof"), "ref")["hist"]
    assert got == want


@pytest.mark.slow
def test_sketch_flagged_stale_until_rebuild(spark, engine):
    eng = engine
    report = eng.retire_documents("docs", ids=[6])
    assert any(
        x.startswith("sketch:sk (skipped") for x in report["indexes"]
    )
    st = eng.status("docs")
    row = [r for r in st["stores"] if r["kind"] == "sketch"][0]
    assert row["retired_pending_rebuild"] is True
    assert row["stale"] is True
    assert "sketch:sk" in st["stale_stores"]
    # a rebuild on the survivors clears the flag
    survivors = _frame(spark, 0, 20).where(F.col("doc_id") != 6)
    eng.build_sketch_store(survivors, "lang", "doc_id", "sk")
    row = [
        r for r in eng.status("docs")["stores"] if r["kind"] == "sketch"
    ][0]
    assert row["retired_pending_rebuild"] is False


def test_multiprofile_ecdf_retire_equals_rebuild(spark, tmp_path):
    """retire_from_ecdf_store on a MULTI-profile store: the doomed
    rows' histograms subtract per profile in one pass — every
    profile's grid equals a rebuild on the survivors."""
    from queens_spark.store.ecdf_store import (
        build_ecdf_profiles,
        retire_from_ecdf_store,
    )

    profiles = {
        "len": {"value_sql": VALUE_SQL, "width": 2, "n_buckets": 12},
        "score": {"value_sql": "score", "width": 10, "n_buckets": 10},
    }
    full = _frame(spark, 0, 20)
    store_dir = str(tmp_path / "ecdf")
    build_ecdf_profiles(full, "lang", profiles, store_dir, "mp")
    doomed_ids = [0, 3, 8, 17]
    doomed = full.where(F.col("doc_id").isin(doomed_ids))
    got = retire_from_ecdf_store(spark, doomed, store_dir, "mp")
    want = build_ecdf_profiles(
        full.where(~F.col("doc_id").isin(doomed_ids)),
        "lang", profiles, str(tmp_path / "ref"), "ref",
    )
    for p in ("len", "score"):
        g = sorted(
            (r["lang"], int(r["bucket"]), int(r["n"]))
            for r in got.hist(p).collect()
        )
        w = sorted(
            (r["lang"], int(r["bucket"]), int(r["n"]))
            for r in want.hist(p).collect()
        )
        assert g == w, p


@pytest.mark.slow
def test_double_and_sequential_retires_stay_exact(spark, engine, tmp_path):
    """Two hazards pinned: re-retiring an id before the purge must NOT
    double-subtract its counters, and a SECOND takedown's rollup
    recompute must not resurrect the first takedown's rows (the
    survivor partials exclude every live segment)."""
    eng = engine
    eng.retire_documents("docs", ids=[1, 4])
    eng.retire_documents("docs", ids=[1, 4])      # re-retire: no-op
    eng.retire_documents("docs", ids=[13])        # sequential takedown
    doomed = [1, 4, 13]
    from queens_spark.store.ecdf_store import build_ecdf_store

    survivors = (
        _frame(spark, 0, 20).where(~F.col("doc_id").isin(doomed))
    )
    expected = build_ecdf_store(
        survivors, "lang", VALUE_SQL, str(tmp_path / "ref_ecdf2"),
        "ref", width=2, n_buckets=12,
    )
    assert _hist_rows(eng.ecdf_store("lens")) == _hist_rows(expected)
    got = sorted(
        (r["lang"], int(r["n_rows"]), int(r["score_sum"]),
         int(r["score_min"]), int(r["score_max"]))
        for r in eng.rollup("docs", "r1").collect()
    )
    want = sorted(
        (r["lang"], int(r["n"]), int(r["s"]), int(r["mn"]), int(r["mx"]))
        for r in survivors.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("score").alias("s"),
            F.min("score").alias("mn"),
            F.max("score").alias("mx"),
        ).collect()
    )
    assert got == want
    eng.maintain("docs")
    assert eng.fsck()["error"] == 0
