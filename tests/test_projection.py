"""Random sign projection (operators/projection.py): determinism,
Spark/driver twin agreement, and the JL distance-preservation sanity
that makes the recall harness meaningful."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from queens_spark.operators.projection import (
    duckdb_rp_project,
    project_ints,
    rp_project,
    rp_signs,
    sq_dist_to_lits,
)


def test_signs_are_deterministic_and_pm1():
    a, b = rp_signs(16, 4), rp_signs(16, 4)
    assert a == b
    assert all(s in (-1, 1) for row in a for s in row)
    # different tags give different matrices
    assert rp_signs(16, 4, tag="other") != a


def test_spark_projection_matches_driver_twin(spark):
    signs = rp_signs(8, 3)
    vec = [0.5, -0.25, 0.125, 1.0, -1.0, 0.75, 0.0, 0.3]
    qv = [int(math.floor(x * 1000)) for x in vec]
    expected = project_ints(qv, signs)
    df = spark.createDataFrame([(vec,)], "embedding array<float>")
    got = df.select(rp_project("embedding", signs).alias("p")).collect()[0][
        "p"
    ]
    assert list(got) == expected


def test_duckdb_twin_matches(spark):
    import duckdb

    signs = rp_signs(4, 2)
    qv = [100, -200, 300, 50]
    sql = duckdb_rp_project("[100, -200, 300, 50]", signs)
    got = duckdb.sql(f"SELECT {sql} AS p").fetchall()[0][0]
    assert list(got) == project_ints(qv, signs)


def test_sq_dist_to_lits_exact(spark):
    df = spark.createDataFrame([([3, 4],)], "v array<bigint>")
    got = df.select(sq_dist_to_lits(F.col("v"), [0, 0]).alias("d")).collect()
    assert got[0]["d"] == 25


def test_projection_roughly_preserves_relative_distance(spark):
    # JL sanity on structured points: a near pair must project nearer
    # than a far pair, averaged over output dims (deterministic check
    # with this fixed matrix — a regression here means the sign
    # stream broke, not bad luck)
    signs = rp_signs(32, 8)
    a = [1000] * 32
    near = [990] * 32
    far = [-1000] * 32
    pa, pn, pf = (project_ints(v, signs) for v in (a, near, far))
    d_near = sum((x - y) ** 2 for x, y in zip(pa, pn))
    d_far = sum((x - y) ** 2 for x, y in zip(pa, pf))
    assert d_near < d_far
