"""End-to-end slice: ingest → stage → query with the filter DSL.

Exercises S5, S6, A1, A2, P1-P8, J4, W3, O1/O2 (SURVEY.md §7.2 step 4):
versioned ingest with flip-flag log, window-rank staging with as-of
cutoff, metadata-gated queryability, NOCASE text semantics, $or
composition, keyset pagination.
"""

from datetime import datetime

import pytest
from pyspark.sql import Row

from queens_spark.core.errors import SchemaValidationError
from queens_spark.facade import Engine


def fact_rows(ingest_tag: str, years=(2020, 2021), fuels=("Gas", "coal")):
    rows = []
    i = 0
    for y in years:
        for f in fuels:
            rows.append(
                Row(
                    row=i, label=f"{f} {ingest_tag}", year=y, fuel=f,
                    group="Supply", unit="ktoe", value=float(i + 1),
                )
            )
            i += 1
    return rows


@pytest.fixture()
def engine(spark, warehouse_root):
    return Engine(spark, warehouse_root)


def test_ingest_stage_query_roundtrip(spark, engine):
    df = spark.createDataFrame(fact_rows("v1"))
    engine.ingest(df, "dukes", "1.1", ingest_ts=datetime(2024, 1, 1))
    staged = engine.stage("dukes")
    assert staged == ["1.1"]

    out = engine.query("dukes", "1.1", {"year": 2020}).collect()
    assert len(out) == 2
    # all-null dimension columns pruned from the result
    assert "technology" not in out[0].asDict()


def test_latest_version_wins(spark, engine):
    engine.ingest(spark.createDataFrame(fact_rows("v1")), "dukes", "1.1",
                  ingest_ts=datetime(2024, 1, 1))
    engine.ingest(spark.createDataFrame(fact_rows("v2")), "dukes", "1.1",
                  ingest_ts=datetime(2024, 6, 1))
    engine.stage("dukes")
    labels = {r["label"] for r in engine.query("dukes", "1.1").collect()}
    assert all("v2" in l for l in labels)


def test_as_of_cutoff_selects_older_version(spark, engine):
    engine.ingest(spark.createDataFrame(fact_rows("v1")), "dukes", "1.1",
                  ingest_ts=datetime(2024, 1, 1))
    engine.ingest(spark.createDataFrame(fact_rows("v2")), "dukes", "1.1",
                  ingest_ts=datetime(2024, 6, 1))
    engine.stage("dukes", as_of=datetime(2024, 3, 1))
    labels = {r["label"] for r in engine.query("dukes", "1.1").collect()}
    assert all("v1" in l for l in labels)


def test_failed_ingest_invisible_to_staging(spark, engine):
    engine.ingest(spark.createDataFrame(fact_rows("v1")), "dukes", "1.1",
                  ingest_ts=datetime(2024, 1, 1))
    # simulate a crashed ingest: success=0 marker only, no success flip
    wh = engine.warehouse
    wh._append_log("dukes", [{
        "ingest_id": 99, "ingest_ts": datetime(2024, 6, 1),
        "data_collection": "dukes", "table_name": "1.1",
        "url": None, "table_description": None, "success": 0,
    }])
    engine.stage("dukes")
    labels = {r["label"] for r in engine.query("dukes", "1.1").collect()}
    assert all("v1" in l for l in labels)


def test_nocase_text_equality(spark, engine):
    engine.ingest(spark.createDataFrame(fact_rows("v1", fuels=("Gas", "coal"))),
                  "dukes", "1.1", ingest_ts=datetime(2024, 1, 1))
    engine.stage("dukes")
    # 'gas' must match 'Gas' (COLLATE NOCASE)
    out = engine.query("dukes", "1.1", {"fuel": "gas"}).collect()
    assert len(out) == 2
    out = engine.query("dukes", "1.1", {"fuel": {"like": "COAL%"}}).collect()
    assert len(out) == 2


def test_or_composition(spark, engine):
    engine.ingest(spark.createDataFrame(fact_rows("v1")), "dukes", "1.1",
                  ingest_ts=datetime(2024, 1, 1))
    engine.stage("dukes")
    out = engine.query(
        "dukes", "1.1",
        {"year": {"gt": 2020}, "$or": [{"fuel": "Gas"}, {"fuel": "Coal"}]},
    ).collect()
    # (year>2020) AND (gas OR coal) → the two 2021 rows
    assert len(out) == 2


def test_multiple_tables_partition_isolation(spark, engine):
    engine.ingest(spark.createDataFrame(fact_rows("t11")), "dukes", "1.1",
                  ingest_ts=datetime(2024, 1, 1))
    engine.ingest(spark.createDataFrame(fact_rows("t61")), "dukes", "6.1",
                  ingest_ts=datetime(2024, 1, 1))
    assert sorted(engine.stage("dukes")) == ["1.1", "6.1"]
    out = engine.query("dukes", "1.1").collect()
    assert {r["table_name"] for r in out} == {"1.1"}


def test_keyset_pagination_walk(spark, engine):
    rows = fact_rows("v1", years=tuple(range(2000, 2025)), fuels=("Gas", "Coal"))
    engine.ingest(spark.createDataFrame(rows), "dukes", "1.1",
                  ingest_ts=datetime(2024, 1, 1))
    engine.stage("dukes")
    seen, cursor, pages = [], None, 0
    while True:
        page, cursor = engine.query_page("dukes", "1.1", limit=7, cursor=cursor)
        seen.extend(page)
        pages += 1
        if cursor is None:
            break
    assert len(seen) == 50
    assert pages >= 8
    uids = [r["row_uid"] for r in seen]
    assert uids == sorted(uids) and len(set(uids)) == 50


def test_duplicate_key_rejected(spark, engine):
    rows = fact_rows("v1") + fact_rows("v1")  # same dims twice
    with pytest.raises(SchemaValidationError):
        engine.ingest(spark.createDataFrame(rows), "dukes", "1.1")


def test_unexpected_column_rejected(spark, engine):
    df = spark.createDataFrame([Row(row=0, label="x", year=2020, bogus=1,
                                    unit="ktoe", value=1.0)])
    with pytest.raises(SchemaValidationError):
        engine.ingest(df, "dukes", "1.1")


@pytest.mark.slow
def test_value_coercion_and_all_null_guard(spark, engine):
    # string values coerce; suppression symbols go null (FIXTURES.md §3)
    df = spark.createDataFrame(
        [Row(row=0, label="a", year=2020, unit="u", value="1.5"),
         Row(row=1, label="b", year=2021, unit="u", value="[x]")]
    )
    engine.ingest(df, "dukes", "1.1", ingest_ts=datetime(2024, 1, 1))
    engine.stage("dukes")
    out = {r["label"]: r["value"] for r in engine.query("dukes", "1.1").collect()}
    assert out["a"] == 1.5 and out["b"] is None

    # but an entirely-null value column is an error
    df2 = spark.createDataFrame(
        [Row(row=0, label="a", year=2020, unit="u", value="..")]
    )
    with pytest.raises(SchemaValidationError):
        engine.ingest(df2, "dukes", "1.2")


@pytest.mark.slow
def test_metadata_gates_queryability(spark, engine):
    engine.ingest(spark.createDataFrame(fact_rows("v1")), "dukes", "1.1",
                  ingest_ts=datetime(2024, 1, 1))
    engine.stage("dukes")
    # 'technology' is in the schema but all-null for this table
    with pytest.raises(NameError):
        engine.query("dukes", "1.1", {"technology": "wind"})


def test_load_schema_json_reference_format(tmp_path, spark, warehouse_root):
    """The reference's schema.json format drives the engine unchanged
    (SURVEY.md §1.4 config compatibility)."""
    import json

    from queens_spark.core.schema import load_schema_json

    path = tmp_path / "schema.json"
    path.write_text(json.dumps({
        "mycoll": {
            "ingest_id": {"type": "INTEGER", "nullable": False},
            "table_name": {"type": "TEXT", "nullable": False},
            "row": {"type": "INTEGER", "nullable": False},
            "label": {"type": "TEXT", "nullable": False},
            "year": {"type": "INTEGER", "nullable": False},
            "fuel": {"type": "TEXT", "nullable": True},
            "value": {"type": "REAL", "nullable": True},
        }
    }))
    schemas = load_schema_json(str(path))
    assert set(schemas) == {"mycoll"}
    sch = schemas["mycoll"]
    assert sch.sql_type_of("value") == "REAL"
    assert not sch.columns["year"].nullable

    # the loaded schema drives a full ingest→stage→query cycle
    from datetime import datetime

    from pyspark.sql import Row

    eng = Engine(spark, warehouse_root, schemas=schemas)
    df = spark.createDataFrame([
        Row(row=i, label=f"l{i}", year=2020, fuel=f"f{i}", value=float(i))
        for i in range(4)
    ])
    eng.ingest(df, "mycoll", "t1", ingest_ts=datetime(2024, 1, 1))
    assert eng.stage("mycoll") == ["t1"]
    assert eng.query("mycoll", "t1", {"fuel": "F2"}).count() == 1  # NOCASE
