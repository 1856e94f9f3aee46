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
