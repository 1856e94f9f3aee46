"""Incremental materialized rollups (store/rollup.py): partial
segments per ingest, winner-aware serving, lazy repair."""

from __future__ import annotations

import datetime
import os
import shutil

import pytest
from pyspark.sql import functions as F

from queens_spark.core.schema import CollectionSchema, ColumnSpec
from queens_spark.facade import Engine


@pytest.fixture()
def eng(spark, tmp_path):
    schemas = {
        "meter": CollectionSchema(
            "meter",
            [
                ColumnSpec("ingest_id", "INTEGER", nullable=False),
                ColumnSpec("table_name", "TEXT", nullable=False),
                ColumnSpec("year", "INTEGER", nullable=False),
                ColumnSpec("fuel", "TEXT", nullable=False),
                ColumnSpec("site", "TEXT", nullable=False),
                ColumnSpec("value", "INTEGER"),
            ],
        )
    }
    return Engine(spark, str(tmp_path / "wh"), schemas=schemas)


def _frame(spark, rows):
    return spark.createDataFrame(rows, ["year", "fuel", "site", "value"])


TS = lambda m: datetime.datetime(2024, m, 1)  # noqa: E731


def _seed(spark, eng):
    eng.register_rollup("meter", "by_fuel", ["year", "fuel"], ["value"])
    a1 = [(2020, f, s, v) for f, s, v in
          [("coal", "s1", 10), ("coal", "s2", 30), ("gas", "s1", 7)]]
    b1 = [(2021, f, s, v) for f, s, v in
          [("coal", "s1", 100), ("gas", "s2", 50)]]
    a2 = [(2020, f, s, v) for f, s, v in
          [("coal", "s1", 11), ("gas", "s1", 8), ("gas", "s3", 2)]]
    eng.ingest(_frame(spark, a1), "meter", "A", ingest_ts=TS(1))
    eng.ingest(_frame(spark, b1), "meter", "B", ingest_ts=TS(2))
    eng.ingest(_frame(spark, a2), "meter", "A", ingest_ts=TS(3))  # replaces A
    return a2, b1


def _expected(rows):
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0, None, None])
    for y, f, _, v in rows:
        e = agg[(y, f)]
        e[0] += 1
        e[1] += v
        e[2] = v if e[2] is None else min(e[2], v)
        e[3] = v if e[3] is None else max(e[3], v)
    return {k: tuple(v) for k, v in agg.items()}


def _got(df):
    return {
        (r["year"], r["fuel"]): (
            r["n_rows"], r["value_sum"], r["value_min"], r["value_max"]
        )
        for r in df.collect()
    }


def test_rollup_respects_latest_wins(spark, eng):
    a2, b1 = _seed(spark, eng)
    # replaced table A counts ONLY its winning (latest) version
    assert _got(eng.rollup("meter", "by_fuel")) == _expected(a2 + b1)


def test_rollup_matches_staged_groupby(spark, eng):
    _seed(spark, eng)
    eng.stage("meter")
    direct = (
        eng.warehouse.read_prod("meter")
        .groupBy("year", "fuel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("value").alias("value_sum"),
            F.min("value").alias("value_min"),
            F.max("value").alias("value_max"),
        )
    )
    assert _got(eng.rollup("meter", "by_fuel")) == _got(direct)


def test_rollup_time_travel(spark, eng):
    a2, b1 = _seed(spark, eng)
    a1 = [(2020, "coal", "s1", 10), (2020, "coal", "s2", 30),
          (2020, "gas", "s1", 7)]
    # before table A's replacement landed: first A version + B
    got = _got(eng.rollup("meter", "by_fuel", as_of=TS(2)))
    assert got == _expected(a1 + b1)


def test_missing_segment_repaired_lazily(spark, eng):
    a2, b1 = _seed(spark, eng)
    segs_root = os.path.join(
        eng._rollups_dir(), "meter", "by_fuel", "segments"
    )
    victims = sorted(os.listdir(segs_root))
    shutil.rmtree(os.path.join(segs_root, victims[-1]))  # crash simulation
    assert _got(eng.rollup("meter", "by_fuel")) == _expected(a2 + b1)
    # the repair persisted: the segment is back on disk
    assert sorted(os.listdir(segs_root)) == victims


def test_register_after_ingests_repairs_everything(spark, eng):
    # ingests happen first; registration arrives later → first serve
    # backfills every winning segment from raw
    rows = [(2020, "coal", "s1", 5), (2020, "gas", "s1", 9)]
    eng.ingest(_frame(spark, rows), "meter", "A", ingest_ts=TS(1))
    eng.register_rollup("meter", "late", ["fuel"], ["value"])
    got = {
        r["fuel"]: (r["n_rows"], r["value_sum"])
        for r in eng.rollup("meter", "late").collect()
    }
    assert got == {"coal": (1, 5), "gas": (1, 9)}


def test_spec_conflict_refused_and_idempotent(spark, eng):
    eng.register_rollup("meter", "by_fuel", ["year", "fuel"], ["value"])
    eng.register_rollup("meter", "by_fuel", ["year", "fuel"], ["value"])
    with pytest.raises(ValueError, match="different spec"):
        eng.register_rollup("meter", "by_fuel", ["fuel"], ["value"])


def test_rollup_cli(spark, tmp_path, capsys, monkeypatch):
    import json as _json

    from queens_spark.cli import main

    # CLI builds its own Engine with default schemas; registration is
    # pure registry bookkeeping, so the stock "dukes" collection works
    root = str(tmp_path / "wh")
    # register without NAME is the documented error path (exit 2)
    rc = main(["--warehouse", root, "rollup", "register", "dukes",
               "--keys", "year,fuel", "--values", "value"])
    assert rc == 2
    capsys.readouterr()
    rc = main(["--warehouse", root, "rollup", "register", "dukes",
               "by_fuel", "--keys", "year,fuel", "--values", "value"])
    assert rc == 0
    reg = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert reg["registered"] == "by_fuel"
    rc = main(["--warehouse", root, "rollup", "list", "dukes"])
    assert rc == 0
    listed = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "by_fuel" in listed


def test_maintain_gcs_superseded_rollup_segments(spark, eng):
    a2, b1 = _seed(spark, eng)  # 3 ingests, ingest 1 superseded by 3
    segs_root = os.path.join(
        eng._rollups_dir(), "meter", "by_fuel", "segments"
    )
    assert len(os.listdir(segs_root)) == 3
    report = eng.maintain("meter")
    assert report["rollup_segments_gcd"] == {"by_fuel": 1}
    assert sorted(os.listdir(segs_root)) == [
        "ingest_000000002", "ingest_000000003"
    ]
    # current-time serving unchanged; the GC'd old-as_of repairs lazily
    assert _got(eng.rollup("meter", "by_fuel")) == _expected(a2 + b1)
    a1 = [(2020, "coal", "s1", 10), (2020, "coal", "s2", 30),
          (2020, "gas", "s1", 7)]
    got = _got(eng.rollup("meter", "by_fuel", as_of=TS(2)))
    assert got == _expected(a1 + b1)


# ------------------------------------------ property: winner algebra

from hypothesis import HealthCheck, given, settings, strategies as st

ingest_st = st.lists(
    st.tuples(
        st.sampled_from(["A", "B"]),                      # table
        st.lists(                                          # rows
            st.tuples(
                st.integers(min_value=2020, max_value=2021),  # year
                st.sampled_from(["coal", "gas"]),             # fuel
                st.integers(min_value=-50, max_value=50),     # value
            ),
            min_size=1,
            max_size=4,
        ),
    ),
    min_size=1,
    max_size=4,
)


@pytest.mark.slow
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ingests=ingest_st)
def test_rollup_equals_winner_groupby_on_random_histories(
    spark, tmp_path_factory, ingests
):
    """For ANY ingest history with replacements: the incrementally
    maintained rollup equals a brute-force GROUP BY over each table's
    LATEST version — the latest-wins algebra the stager applies."""
    eng = Engine(
        spark,
        str(tmp_path_factory.mktemp("wh_prop")),
        schemas={
            "meter": CollectionSchema(
                "meter",
                [
                    ColumnSpec("ingest_id", "INTEGER", nullable=False),
                    ColumnSpec("table_name", "TEXT", nullable=False),
                    ColumnSpec("year", "INTEGER", nullable=False),
                    ColumnSpec("fuel", "TEXT", nullable=False),
                    ColumnSpec("site", "TEXT", nullable=False),
                    ColumnSpec("value", "INTEGER"),
                ],
            )
        },
    )
    eng.register_rollup("meter", "p", ["year", "fuel"], ["value"])
    latest: dict[str, list] = {}
    for i, (table, rows) in enumerate(ingests):
        # unique site per row keeps the dimension key valid
        full = [(y, f, f"s{j}", v) for j, (y, f, v) in enumerate(rows)]
        eng.ingest(_frame(spark, full), "meter", table, ingest_ts=TS(i + 1))
        latest[table] = full
    expect = _expected([r for rows in latest.values() for r in rows])
    assert _got(eng.rollup("meter", "p")) == expect
