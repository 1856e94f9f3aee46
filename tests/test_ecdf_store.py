"""Persisted mergeable ECDF store (store/ecdf_store.py): exact-merge
appends == rebuilds bit-for-bit, integer-exact thresholds, token
idempotency, registry-driven refresh inside Engine.ingest, fsck
coverage."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from queens_spark.store.ecdf_store import (
    append_ecdf_store,
    build_ecdf_store,
    build_or_load_ecdf_store,
    load_ecdf_store,
)

VAL = "v + 0"  # value_sql over a plain bigint column


def _frame(spark, rows):
    return spark.createDataFrame(rows, "g string, v bigint")


def _hist_snap(st):
    return sorted(
        (r[st.group_col], r["bucket"], r["n"]) for r in st.hist().collect()
    )


def test_append_equals_rebuild_property(spark, tmp_path):
    for seed in range(5):
        rng = random.Random(seed)
        rows = [
            (rng.choice("abc"), rng.randint(0, 400)) for _ in range(120)
        ]
        cut = rng.randint(20, 100)
        A, B = _frame(spark, rows[:cut]), _frame(spark, rows[cut:])
        d = str(tmp_path / f"s{seed}")
        build_ecdf_store(A, "g", VAL, d, "e", width=25, n_buckets=8)
        st = append_ecdf_store(spark, B, d, "e")
        rebuilt = build_ecdf_store(
            A.union(B), "g", VAL, str(tmp_path / f"r{seed}"), "e",
            width=25, n_buckets=8,
        )
        assert _hist_snap(st) == _hist_snap(rebuilt), f"seed {seed}"


def test_thresholds_hand_computed(spark, tmp_path):
    # group 'a': values 0..9 with width 2, n_buckets 10 → buckets 0..4,
    # 2 per bucket, total 10. p50 (5000bp): smallest bucket with
    # cum*10000 >= 5000*10 → cum >= 5 → bucket 2 (cum 6) → edge 6.
    rows = [("a", v) for v in range(10)]
    d = str(tmp_path / "s")
    st = build_ecdf_store(
        _frame(spark, rows), "g", VAL, d, "e", width=2, n_buckets=10
    )
    out = {
        r["threshold"]: (r["value_lt"], r["covered_bp"])
        for r in st.thresholds({"p50": 5000, "p90": 9000}).collect()
    }
    assert out["p50"] == (6, 6000)
    assert out["p90"] == (10, 10000)
    # cdf is integer-exact and bounded at n_buckets rows per group
    cdf = st.cdf().collect()
    assert all(r["total"] == 10 for r in cdf)
    assert max(r["cum_n"] for r in cdf) == 10


def test_overflow_bucket_absorbs_tail(spark, tmp_path):
    rows = [("a", 5), ("a", 10_000_000)]
    st = build_ecdf_store(
        _frame(spark, rows), "g", VAL, str(tmp_path / "s"), "e",
        width=10, n_buckets=4,
    )
    assert _hist_snap(st) == [("a", 0, 1), ("a", 3, 1)]


def test_token_replay_noops_and_clear(spark, tmp_path):
    d = str(tmp_path / "s")
    build_ecdf_store(_frame(spark, [("a", 1)]), "g", VAL, d, "e")
    st = append_ecdf_store(spark, _frame(spark, [("a", 2)]), d, "e",
                           token="t1")
    v, snap = st.entry["version"], _hist_snap(st)
    st2 = append_ecdf_store(spark, _frame(spark, [("a", 2)]), d, "e",
                            token="t1")
    assert st2.entry["version"] == v and _hist_snap(st2) == snap
    from queens_spark.store.ecdf_store import clear_applied_tokens

    assert clear_applied_tokens(d, "e") == 1
    assert load_ecdf_store(spark, d, "e").entry["applied_tokens"] == []


def test_build_or_load_serves_on_match(spark, tmp_path):
    d = str(tmp_path / "s")
    A = _frame(spark, [("a", 1), ("b", 60)])
    st = build_or_load_ecdf_store(A, "g", VAL, d, "e", fingerprint="fp1")
    st2 = build_or_load_ecdf_store(A, "g", VAL, d, "e", fingerprint="fp1")
    assert st2.entry["version"] == st.entry["version"]
    st3 = build_or_load_ecdf_store(A, "g", VAL, d, "e", fingerprint="fp2")
    assert st3.entry["version"] == st.entry["version"] + 1
    st4 = build_or_load_ecdf_store(A, "g", VAL, d, "e", width=99,
                                   fingerprint="fp2")
    assert st4.entry["version"] == st3.entry["version"] + 1


@pytest.mark.slow
def test_registry_refresh_inside_ingest(spark, tmp_path):
    """kind "ecdf" joins the derived-state-inside-the-write posture:
    dedup-screened ingests fold the survivors' histogram in under the
    batch token, exactly once under redelivery."""
    from tests.test_index_registry import _engine_with_indexes, _frame as _docs

    eng = _engine_with_indexes(spark, tmp_path)
    seed = _docs(
        spark,
        [(i, f"seed document number {i} alpha beta gamma") for i in range(8)],
    )
    # profile token LENGTHS per table_name (a schema column every
    # ingested frame carries, so registry appends need no extra config)
    eng.build_ecdf_store(
        seed.withColumn("table_name", F.lit("seed")),
        "table_name",
        "size(filter(split(text, '\\\\s+'), x -> x != ''))",
        "toklen",
        width=2,
        n_buckets=8,
    )
    with pytest.raises(KeyError):
        eng.register_index("docs", "ecdf", "nope")
    eng.register_index("docs", "ecdf", "toklen")
    before = sum(
        r["n"] for r in eng.ecdf_store("toklen").hist().collect()
    )
    batch = _docs(spark, [(40, "fresh words entirely novel here")])
    batch = batch.withColumn("table_name", F.lit("e1"))
    eng.ingest(
        batch, "docs", "e1",
        dedup_text_col="text", dedup_id_col="doc_id", token="te1",
    )
    after = sum(r["n"] for r in eng.ecdf_store("toklen").hist().collect())
    assert after == before + 1
    # redelivery no-ops
    eng.ingest(
        batch, "docs", "e1",
        dedup_text_col="text", dedup_id_col="doc_id", token="te1",
    )
    assert sum(
        r["n"] for r in eng.ecdf_store("toklen").hist().collect()
    ) == after


def test_cli_ecdf_lifecycle(spark, tmp_path, capsys, monkeypatch):
    import json

    from queens_spark.cli import main
    from queens_spark.facade import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    monkeypatch.setenv("QUEENS_SPARK_WAREHOUSE", eng.warehouse.root)
    src1, src2 = str(tmp_path / "p1"), str(tmp_path / "p2")
    _frame(spark, [("a", v) for v in range(10)]).write.parquet(src1)
    _frame(spark, [("b", 3), ("a", 99)]).write.parquet(src2)

    assert main(["ecdf", "build", "e", "--source", src1,
                 "--group-col", "g", "--value-sql", VAL,
                 "--width", "2", "--n-buckets", "10"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_groups"] == 1 and out["version"] == 1

    assert main(["ecdf", "append", "e", "--source", src2,
                 "--token", "t1"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_groups"] == 2 and out["version"] == 2

    assert main(["ecdf", "thresholds", "e", "--bp", "5000"]) == 0
    rows = [json.loads(x) for x in
            capsys.readouterr().out.strip().splitlines()]
    by = {r["g"]: r for r in rows}
    assert by["b"]["value_lt"] == 4  # single value 3 → bucket 1 edge
    assert main(["ecdf", "cdf", "e"]) == 0
    assert capsys.readouterr().out.strip()
    assert main(["ecdf", "drift", "e"]) == 0
    drift = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert {r["g"] for r in drift} == {"a", "b"}


def test_fsck_covers_ecdf_store(spark, tmp_path):
    import os
    import shutil

    from tests.test_index_registry import _engine_with_indexes

    eng = _engine_with_indexes(spark, tmp_path)
    docs = spark.createDataFrame(
        [("a", 3), ("b", 70)], "g string, v bigint"
    )
    eng.build_ecdf_store(docs, "g", VAL, "e")
    assert eng.fsck()["healthy"]
    base = os.path.join(eng._ecdf_store_dir(), "e")
    os.makedirs(os.path.join(base, "v99"))
    report = eng.fsck()
    assert report["healthy"]
    assert any(
        f["component"] == "ecdf_store" and "v99" in f["message"]
        for f in report["findings"] if f["level"] == "warn"
    )
    shutil.rmtree(os.path.join(base, "v1"))
    report = eng.fsck()
    assert not report["healthy"]
    assert any(
        f["component"] == "ecdf_store"
        for f in report["findings"] if f["level"] == "error"
    )


def test_null_values_dropped_and_bp_guard(spark, tmp_path):
    d = str(tmp_path / "s")
    rows = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 3)], "g string, v bigint"
    )
    st = build_ecdf_store(rows, "g", VAL, d, "e", width=2, n_buckets=4)
    assert sum(r["n"] for r in st.hist().collect()) == 2  # null dropped
    with pytest.raises(ValueError, match="basis points"):
        st.thresholds({"bad": 0})
    with pytest.raises(ValueError, match="basis points"):
        st.thresholds({"bad": 20000})


# ------------------------------------------------ multi-profile stores

def _msnap(st, profile):
    return sorted(
        (r[st.group_col], r["bucket"], r["n"])
        for r in st.hist(profile=profile).collect()
    )


def test_multi_profile_equals_per_profile_singles(spark, tmp_path):
    """One multi-profile scan == N separate single-profile builds,
    per profile and bit-for-bit (same bucketize grid, same NULL
    drop)."""
    from queens_spark.store.ecdf_store import build_ecdf_profiles

    rows = [("a", v) for v in range(40)] + [("b", v * 3) for v in range(25)]
    df = _frame(spark, rows).withColumn(
        "v2",
        F.when(F.col("v") % 7 == 0, F.lit(None)).otherwise(
            F.col("v") * F.col("v")
        ),
    )
    profs = {
        "lin": {"value_sql": "v + 0", "width": 10, "n_buckets": 6},
        "sq": {"value_sql": "v2 + 0", "width": 300, "n_buckets": 5},
    }
    st = build_ecdf_profiles(df, "g", profs, str(tmp_path / "m"), "mp")
    for pname, p in profs.items():
        single = build_ecdf_store(
            df, "g", p["value_sql"], str(tmp_path / f"s_{pname}"), "e",
            width=p["width"], n_buckets=p["n_buckets"],
        )
        assert _msnap(st, pname) == _hist_snap(single), pname
    # thresholds/cdf demand an explicit profile; singles reject one
    with pytest.raises(ValueError, match="multi-profile"):
        st.hist()
    with pytest.raises(KeyError):
        st.cdf(profile="nope")
    single = load_ecdf_store(spark, str(tmp_path / "s_lin"), "e")
    with pytest.raises(ValueError, match="single-profile"):
        single.hist(profile="lin")


def test_multi_profile_append_equals_rebuild(spark, tmp_path):
    from queens_spark.store.ecdf_store import (
        append_ecdf_store as _append,
        build_ecdf_profiles,
    )

    profs = {
        "lin": {"value_sql": "v + 0", "width": 25, "n_buckets": 8},
        "dbl": {"value_sql": "v * 2", "width": 50, "n_buckets": 8},
    }
    for seed in range(3):
        rng = random.Random(40 + seed)
        rows = [
            (rng.choice("abc"), rng.randint(0, 400)) for _ in range(100)
        ]
        cut = rng.randint(20, 80)
        A, B = _frame(spark, rows[:cut]), _frame(spark, rows[cut:])
        d = str(tmp_path / f"m{seed}")
        build_ecdf_profiles(A, "g", profs, d, "mp")
        st = _append(spark, B, d, "mp", token=f"t{seed}")
        rebuilt = build_ecdf_profiles(
            A.union(B), "g", profs, str(tmp_path / f"r{seed}"), "mp"
        )
        for pname in profs:
            assert _msnap(st, pname) == _msnap(rebuilt, pname), (
                f"seed {seed} profile {pname}"
            )
        # token replay no-ops across every profile at once
        st2 = _append(spark, B, d, "mp", token=f"t{seed}")
        assert st2.entry["version"] == st.entry["version"]


def test_multi_profile_build_or_load_and_engine_verb(spark, tmp_path):
    from queens_spark.facade import Engine
    from queens_spark.store.ecdf_store import build_or_load_ecdf_profiles

    profs = {"lin": {"value_sql": "v + 0", "width": 10, "n_buckets": 4}}
    df = _frame(spark, [("a", v) for v in range(10)])
    d = str(tmp_path / "s")
    st = build_or_load_ecdf_profiles(df, "g", profs, d, "mp",
                                     fingerprint="fp1")
    st2 = build_or_load_ecdf_profiles(df, "g", profs, d, "mp",
                                      fingerprint="fp1")
    assert st2.entry["version"] == st.entry["version"]  # served
    profs2 = {"lin": {"value_sql": "v + 1", "width": 10, "n_buckets": 4}}
    st3 = build_or_load_ecdf_profiles(df, "g", profs2, d, "mp",
                                      fingerprint="fp1")
    assert st3.entry["version"] == st.entry["version"] + 1  # rebuilt
    eng = Engine(spark, str(tmp_path / "wh"))
    est = eng.build_ecdf_profiles(df, "g", profs, "mp")
    assert est.describe()["profiles"]["lin"]["width"] == 10
