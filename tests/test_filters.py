"""Filter-DSL semantics: normalisation, validation taxonomy, casting.

Mirrors the reference's tests/test_validation.py:156-245 and the
FIXTURES.md §6 rejection matrix.
"""

import pytest

from queens_spark.core.filters import (
    normalize_filters,
    to_nested,
    validate_group,
    validate_filters,
)
from queens_spark.core.schema import DUKES_SCHEMA


def test_to_nested_flat_scalar():
    assert to_nested({"year": 2022}) == {"year": {"eq": 2022}}


def test_to_nested_passthrough():
    assert to_nested({"year": {"gte": 2020}}) == {"year": {"gte": 2020}}


def test_normalize_or_list():
    base, groups = normalize_filters(
        {"year": {"gt": 2020}, "$or": [{"fuel": "Gas"}, {"fuel": "Coal"}]}
    )
    assert base == {"year": {"gt": 2020}}
    assert groups == [{"fuel": {"eq": "Gas"}}, {"fuel": {"eq": "Coal"}}]


def test_normalize_or_dict_tolerated():
    _, groups = normalize_filters({"$or": {"fuel": {"like": "Coal%"}, "year": 2020}})
    assert groups == [{"fuel": {"like": "Coal%"}}, {"year": {"eq": 2020}}]


def test_normalize_empty():
    assert normalize_filters(None) == ({}, [])
    assert normalize_filters({}) == ({}, [])


def test_validate_casts_str_to_int():
    out = validate_group({"year": {"gte": "2020"}}, DUKES_SCHEMA)
    assert out == {"year": {"gte": 2020}}
    assert isinstance(out["year"]["gte"], int)


def test_validate_casts_to_float():
    out = validate_group({"value": {"lt": "1.5"}}, DUKES_SCHEMA)
    assert out == {"value": {"lt": 1.5}}


def test_validate_like_passthrough():
    out = validate_group({"fuel": {"like": "%gas%"}}, DUKES_SCHEMA)
    assert out == {"fuel": {"like": "%gas%"}}


def test_unknown_column_keyerror():
    with pytest.raises(KeyError):
        validate_group({"nope": {"eq": 1}}, DUKES_SCHEMA)


def test_not_queryable_nameerror():
    with pytest.raises(NameError):
        validate_group({"fuel": {"eq": "Gas"}}, DUKES_SCHEMA, queryable={"year"})


def test_bad_operator_valueerror():
    with pytest.raises(ValueError):
        validate_group({"year": {"betweenish": 1}}, DUKES_SCHEMA)


def test_text_ordering_op_valueerror():
    with pytest.raises(ValueError):
        validate_group({"fuel": {"lt": "Gas"}}, DUKES_SCHEMA)


def test_like_non_string_typeerror():
    with pytest.raises(TypeError):
        validate_group({"fuel": {"like": 123}}, DUKES_SCHEMA)


def test_uncastable_value_typeerror():
    with pytest.raises(TypeError):
        validate_group({"year": {"eq": "twenty"}}, DUKES_SCHEMA)


def test_validate_filters_both_parts():
    base, groups = validate_filters(
        {"year": {"gte": "2015"}},
        [{"fuel": {"eq": "Gas"}}],
        DUKES_SCHEMA,
    )
    assert base["year"]["gte"] == 2015
    assert groups[0]["fuel"]["eq"] == "Gas"
