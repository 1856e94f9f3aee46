"""Join-key discovery semantics (operators/discovery.py)."""

from __future__ import annotations

from queens_spark.operators.discovery import (
    joinability_matrix,
    tall_column_values,
)


def test_containment_detects_fk_direction(spark):
    child = spark.createDataFrame(
        [(k,) for k in [1, 2, 3, 1, 2]], "fk bigint"
    )
    parent = spark.createDataFrame(
        [(k,) for k in range(1, 11)], "pk bigint"
    )
    tall = tall_column_values({"fk": (child, "fk"), "pk": (parent, "pk")})
    out = {
        (r["col_a"], r["col_b"]): r
        for r in joinability_matrix(tall, k=16).collect()
    }
    fk = out[("fk", "pk")]
    assert fk["exact_a"] == 3  # distinct fk values
    assert fk["contain_bp"] == 10000  # fk ⊆ pk
    pk = out[("pk", "fk")]
    assert pk["exact_a"] == 10
    assert pk["contain_bp"] == 3000  # 3 of 10 pk values referenced
    # sub-k sketches are exact, so the estimate matches exactly
    assert fk["est_contain_bp"] == 10000
    assert pk["est_contain_bp"] == 3000


def test_disjoint_columns_report_zero(spark):
    a = spark.createDataFrame([(1,), (2,)], "x bigint")
    b = spark.createDataFrame([(100,), (200,)], "y bigint")
    tall = tall_column_values({"a.x": (a, "x"), "b.y": (b, "y")})
    out = {
        (r["col_a"], r["col_b"]): r
        for r in joinability_matrix(tall, k=16).collect()
    }
    assert out[("a.x", "b.y")]["contain_bp"] == 0
    assert out[("a.x", "b.y")]["est_contain_bp"] == 0
    assert len(out) == 2  # both directions present even at zero


def test_nulls_are_dropped(spark):
    a = spark.createDataFrame([(1,), (None,)], "x bigint")
    b = spark.createDataFrame([(1,)], "y bigint")
    tall = tall_column_values({"a.x": (a, "x"), "b.y": (b, "y")})
    out = {
        (r["col_a"], r["col_b"]): r
        for r in joinability_matrix(tall, k=16).collect()
    }
    assert out[("a.x", "b.y")]["exact_a"] == 1
    assert out[("a.x", "b.y")]["contain_bp"] == 10000
