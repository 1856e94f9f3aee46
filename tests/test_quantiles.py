"""Distributed exact quantiles (q58 path): values match the in-buffer
percentile() aggregate, and the plan has no per-group single-task
sort."""

import math

from pyspark.sql import Row, functions as F

from queens_spark.operators.quantiles import exact_group_quantiles, grouped_ordinal


def frame(spark):
    rows = [
        Row(g="a", v=float(x)) for x in [9, 1, 5, 3, 7]
    ] + [
        Row(g="b", v=float(x)) for x in [4, 2, 8, 6]
    ] + [Row(g="a", v=None)]
    return spark.createDataFrame(rows)


def test_matches_builtin_percentile(spark):
    df = frame(spark)
    got = {
        r["g"]: (r["p25"], r["p50"], r["p90"])
        for r in exact_group_quantiles(
            df, "g", "v", {"p25": 0.25, "p50": 0.5, "p90": 0.9}
        ).collect()
    }
    ref = {
        r["g"]: (r["p25"], r["p50"], r["p90"])
        for r in df.groupBy("g").agg(
            F.percentile("v", F.lit(0.25)).alias("p25"),
            F.percentile("v", F.lit(0.5)).alias("p50"),
            F.percentile("v", F.lit(0.9)).alias("p90"),
        ).collect()
    }
    assert got.keys() == ref.keys()
    for g in got:
        for a, b in zip(got[g], ref[g]):
            assert math.isclose(a, b, rel_tol=1e-12), (g, got[g], ref[g])


def test_ordinal_is_dense_and_sorted(spark):
    df = frame(spark)
    out = grouped_ordinal(df, "g", "v").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append((r["__rk"], r["__v"]))
    for g, pairs in by_g.items():
        pairs.sort()
        assert [p[0] for p in pairs] == list(range(1, len(pairs) + 1))
        vals = [p[1] for p in pairs]
        assert vals == sorted(vals)


def test_plan_has_no_per_group_window(spark):
    df = frame(spark)
    plan = (
        grouped_ordinal(df, "g", "v")
        ._jdf.queryExecution().executedPlan().toString().lower()
    )
    assert "rangepartitioning" in plan
    assert "row_number() windowspecdefinition(__pid" in plan


def test_grouped_rank_matches_rank_window_with_ties(spark):
    # ties share the min ordinal (RANK semantics), payload columns
    # ride through, __n is the group size — all from one pass with no
    # join back against the source frame
    rows = [
        Row(i=i, g=g, v=float(v))
        for i, (g, v) in enumerate(
            [("a", 5), ("a", 1), ("a", 5), ("a", 3), ("a", 5),
             ("b", 2), ("b", 2), ("b", 9), ("c", 7)]
        )
    ] + [Row(i=99, g="a", v=None)]
    df = spark.createDataFrame(rows)
    from pyspark.sql import Window

    from queens_spark.operators.quantiles import grouped_rank

    got = {
        r["i"]: (r["g"], r["__v"], r["__rk"], r["__n"])
        for r in grouped_rank(df, "g", "v", carry_cols=("i",)).collect()
    }
    w = Window.partitionBy("g").orderBy("v")
    ref = {
        r["i"]: (r["g"], r["v"], r["rk"], r["n"])
        for r in df.where(F.col("v").isNotNull())
        .withColumn("rk", F.rank().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("g")))
        .collect()
    }
    assert got == ref


def test_grouped_rank_plan_is_two_phase(spark):
    df = frame(spark)
    from queens_spark.operators.quantiles import grouped_rank

    plan = (
        grouped_rank(df, "g", "v")
        ._jdf.queryExecution().executedPlan().toString().lower()
    )
    assert "rangepartitioning" in plan
    import re

    assert re.search(r"rank\(__v#\d+\) windowspecdefinition\(__pid#", plan)


def test_offsets_join_strategy_does_not_change_results(spark):
    """The chunks×groups offsets frame broadcasts by default; a
    high-cardinality group column must be able to opt out
    (broadcast_offsets=False) WITHOUT changing any value — only the
    join strategy may differ."""
    from pyspark.sql import functions as F

    from queens_spark.operators.quantiles import (
        exact_group_quantiles,
        grouped_rank,
    )

    base = spark.range(0, 5000, 1, 4).select(
        (F.col("id") % 11).alias("g"),
        ((F.col("id") * 37) % 101).cast("double").alias("v"),
    )
    a = exact_group_quantiles(base, "g", "v", {"p25": 0.25, "p75": 0.75})
    b = exact_group_quantiles(
        base, "g", "v", {"p25": 0.25, "p75": 0.75}, broadcast_offsets=False
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    ra = grouped_rank(base, "g", "v")
    rb = grouped_rank(base, "g", "v", broadcast_offsets=False)
    assert sorted(map(tuple, ra.collect())) == sorted(map(tuple, rb.collect()))
