"""Two-phase row_uid: per-table dense ordinal that follows the
declared sort order WITHOUT a single-task-per-table window (the
billion-row-table scale hazard flagged in round 1)."""

from pyspark.sql import Row

from queens_spark.store.warehouse import with_row_uid


def _frame(spark):
    rows = [
        Row(table_name=t, year=y, label=f"l{y % 3}", value=float(y * i))
        for t in ("1.1", "2.2")
        for i, y in enumerate([2020, 2018, 2019, 2021, 2017])
    ]
    return spark.createDataFrame(rows)


def test_row_uid_dense_and_ordered(spark):
    df = _frame(spark)
    out = with_row_uid(df, ["table_name", "year", "label", "value"])
    for t in ("1.1", "2.2"):
        got = (
            out.where(out.table_name == t)
            .orderBy("year")
            .select("row_uid", "year")
            .collect()
        )
        assert sorted(r.row_uid for r in got) == list(range(1, 6))
        # uid order == sort-column order
        assert [r.row_uid for r in got] == sorted(
            r.row_uid for r in got
        ), f"uid not monotone in sort order for {t}"


def test_row_uid_plan_has_no_per_table_window(spark):
    df = _frame(spark)
    out = with_row_uid(df, ["table_name", "year", "label", "value"])
    plan = out._jdf.queryExecution().executedPlan().toString().lower()
    assert "rangepartitioning" in plan
    # the ordinal window is keyed by (chunk, table) — a row_number
    # window keyed by the table alone would serialize each logical
    # table through one task. (The offsets branch may legitimately
    # hash by table_name: it is a chunks×tables metadata frame.)
    assert "hashpartitioning(__pid" in plan
    assert "row_number() windowspecdefinition(__pid" in plan
