"""Property-based check of the filter DSL's COMPILED semantics.

Hypothesis generates random (valid) filter dicts; each is evaluated
two ways over the same fixed corpus — the engine's compiled Column
expression on Spark, and an independent pure-Python evaluator written
straight from the DSL spec (NOCASE text matching, SQL null semantics,
``(base AND …) AND (g₁ OR g₂ …)`` composition). The two must select
the same row ids for every generated filter. This is the class of test
the reference lacks entirely (SURVEY.md §5).
"""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from queens_spark.core.filters import build_filter_expr, normalize_filters
from queens_spark.core.schema import DUKES_SCHEMA

QUERYABLE = {"year", "fuel", "value", "table_name"}

ROWS = [
    # (rid, year, fuel, value)
    (0, 2018, "Gas", 1.5),
    (1, 2019, "gas", -2.0),
    (2, 2019, "Coal", 0.0),
    (3, 2020, "coal gas", 3.25),
    (4, 2020, None, 7.0),
    (5, 2021, "Wind", None),
    (6, 2021, "GAS", 1.5),
    (7, 2022, "Solar", 100.0),
    (8, 2022, "", 5.5),
    (9, 2018, "Natural Gas", -0.5),
]

NUM_OPS = ["eq", "neq", "lt", "lte", "gt", "gte"]


def _like_to_regex(pattern: str) -> str:
    out = []
    for ch in pattern:
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


def _eval_pred(row: tuple, col: str, op: str, val) -> bool:
    """Pure-Python reference semantics for one predicate (SQL null
    semantics: NULL never matches)."""
    idx = {"year": 1, "fuel": 2, "value": 3}[col]
    cell = row[idx]
    if cell is None:
        return False
    if col == "fuel":  # TEXT: COLLATE NOCASE
        if op == "eq":
            return cell.lower() == str(val).lower()
        if op == "neq":
            return cell.lower() != str(val).lower()
        if op == "like":
            return re.match(_like_to_regex(str(val)), cell, re.IGNORECASE) is not None
    num = float(val)
    cellf = float(cell)
    return {
        "eq": cellf == num,
        "neq": cellf != num,
        "lt": cellf < num,
        "lte": cellf <= num,
        "gt": cellf > num,
        "gte": cellf >= num,
    }[op]


def _eval_group(row: tuple, group: dict) -> bool:
    return all(
        _eval_pred(row, col, op, val)
        for col, ops in group.items()
        for op, val in ops.items()
    )


def _eval_filters(row: tuple, filters: dict) -> bool:
    base, or_groups = normalize_filters(filters)
    if not _eval_group(row, base):
        return False
    if or_groups:
        return any(_eval_group(row, g) for g in or_groups)
    return True


# ------------------------------------------------------------ strategies

year_pred = st.sampled_from(NUM_OPS).flatmap(
    lambda op: st.sampled_from([2018, 2019, 2020, 2021, 2022, 1999]).map(
        lambda v: ("year", op, v)
    )
)
value_pred = st.sampled_from(NUM_OPS).flatmap(
    lambda op: st.sampled_from([-2.0, 0.0, 1.5, 3.25, 7.0, 100.0]).map(
        lambda v: ("value", op, v)
    )
)
fuel_value = st.sampled_from(
    ["Gas", "gas", "GAS", "Coal", "coal gas", "Wind", "", "%gas%", "%Gas",
     "co%", "_as", "%a%", "Natural Gas", "%"]
)
fuel_pred = st.tuples(st.sampled_from(["eq", "neq", "like"]), fuel_value).map(
    lambda t: ("fuel", t[0], t[1])
)
any_pred = st.one_of(year_pred, value_pred, fuel_pred)


def _group_from_preds(preds) -> dict:
    group: dict = {}
    for col, op, val in preds:
        group.setdefault(col, {})[op] = val
    return group


group_st = st.lists(any_pred, min_size=1, max_size=3).map(_group_from_preds)


@st.composite
def filters_st(draw):
    filters = dict(draw(group_st)) if draw(st.booleans()) else {}
    if draw(st.booleans()):
        filters["$or"] = draw(st.lists(group_st, min_size=1, max_size=3))
    return filters


@pytest.fixture(scope="module")
def corpus(spark):
    df = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], "1.1") for r in ROWS],
        "rid bigint, year bigint, fuel string, value double, table_name string",
    )
    df = df.persist()
    df.count()
    yield df
    df.unpersist()


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(filters=filters_st())
def test_compiled_filters_match_reference_semantics(spark, corpus, filters):
    expr = build_filter_expr(filters, DUKES_SCHEMA, QUERYABLE)
    got = {r["rid"] for r in corpus.where(expr).select("rid").collect()}
    want = {r[0] for r in ROWS if _eval_filters(r, filters)}
    assert got == want, f"filters={filters!r}: spark={sorted(got)} py={sorted(want)}"
