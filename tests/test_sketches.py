"""Tests for the portable HLL distinct sketch (q68)."""

import pytest
from pyspark.sql import Row, functions as F

from queens_spark.operators.sketches import (
    M_REGS,
    RHO_CAP,
    hll_distinct,
    hll_estimate,
    hll_registers,
)


@pytest.fixture(scope="module")
def keys(spark):
    return spark.createDataFrame(
        [Row(g="a", k=i) for i in range(2000)]
        + [Row(g="b", k=3 * i + 7) for i in range(500)]
    )


def test_estimate_within_sigma(keys):
    got = {r["g"]: r["hll_est"] for r in hll_distinct(keys, "k", ["g"]).collect()}
    # sigma = 1.04/sqrt(64) ~ 13%; allow 3 sigma
    assert abs(got["a"] / 2000 - 1) < 0.4
    assert abs(got["b"] / 500 - 1) < 0.4


def test_registers_are_bounded_and_mergeable(keys):
    regs = hll_registers(keys, "k", ["g"])
    assert regs.count() <= 2 * M_REGS
    assert regs.agg(F.max("rho")).collect()[0][0] <= RHO_CAP
    # merge = union + re-max: two halves must finish to the SAME
    # estimate as the whole (the cross-day rollup property)
    lo = hll_registers(keys.where("k < 900"), "k", ["g"])
    hi = hll_registers(keys.where("k >= 900"), "k", ["g"])
    merged = (
        lo.unionAll(hi)
        .groupBy("g", "reg")
        .agg(F.max("rho").alias("rho"))
    )
    whole = {r["g"]: r["hll_est"] for r in hll_estimate(regs, ["g"]).collect()}
    via_merge = {r["g"]: r["hll_est"] for r in hll_estimate(merged, ["g"]).collect()}
    assert whole == via_merge


def test_duplicates_do_not_move_the_estimate(spark):
    once = spark.createDataFrame([Row(g="x", k=i) for i in range(300)])
    thrice = spark.createDataFrame([Row(g="x", k=i % 300) for i in range(900)])
    e1 = hll_distinct(once, "k", ["g"]).collect()[0]["hll_est"]
    e3 = hll_distinct(thrice, "k", ["g"]).collect()[0]["hll_est"]
    assert e1 == e3


def test_cms_overestimates_and_merges(spark):
    from queens_spark.operators.sketches import CMS_D, CMS_W, cms_build, cms_probe

    toks = (["alpha"] * 50 + ["beta"] * 20 + [f"rare{i}" for i in range(200)])
    df = spark.createDataFrame([Row(token=t) for t in toks])
    sketch = cms_build(df)
    assert sketch.count() <= CMS_D * CMS_W
    probes = spark.createDataFrame(
        [Row(token="alpha"), Row(token="beta"), Row(token="rare0"),
         Row(token="never_seen")])
    got = {r["token"]: r["cms_est"] for r in cms_probe(sketch, probes).collect()}
    # estimates never under-count; at this scale they are exact-ish
    assert got["alpha"] >= 50 and got["beta"] >= 20 and got["rare0"] >= 1
    assert got["alpha"] <= 50 + 2 * len(toks) // CMS_W
    # unseen tokens may collide but stay within the additive bound
    assert 0 <= got["never_seen"] <= 2 * len(toks) // CMS_W + 1
    # merge-by-addition: sum of two half sketches == whole sketch.
    # Deterministic split (an unordered limit() is not a stable
    # partition of a multiset — subtract/exceptAll on it can drop
    # duplicate tokens under partitioning changes).
    idx = spark.createDataFrame(
        [Row(idx=i, token=t) for i, t in enumerate(toks)]
    )
    from queens_spark.operators.sketches import cms_merge

    half1 = cms_build(idx.where("idx < 100").select("token"))
    half2 = cms_build(idx.where("idx >= 100").select("token"))
    merged = cms_merge([half1, half2])
    whole = {(r["cms_row"], r["bucket"]): r["cnt"] for r in sketch.collect()}
    via = {(r["cms_row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    assert whole == via


def test_hll_merge_equals_whole_corpus_estimate(spark):
    """Union + re-max of independently-built register frames must give
    the SAME estimate as one pass over everything — the per-shard
    rollup contract q84 relies on."""
    from pyspark.sql import functions as F

    from queens_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    whole = hll_estimate(
        hll_registers(ev, "user_id", ["event_type"]), ["event_type"]
    )
    shards = [
        hll_registers(ev.where(F.col("user_id") % 4 == i),
                      "user_id", ["event_type"])
        for i in range(4)
    ]
    merged = hll_estimate(hll_merge(shards, ["event_type"]), ["event_type"])
    a = {r["event_type"]: r["hll_est"] for r in whole.collect()}
    b = {r["event_type"]: r["hll_est"] for r in merged.collect()}
    assert a == b and len(a) > 0  # bit-identical, not approximately


def test_hll_rejects_non_integral_keys(spark):
    df = spark.createDataFrame([Row(g="a", k="not-a-number")])
    with pytest.raises(TypeError, match="integral"):
        hll_distinct(df, "k", ["g"])


def test_sampled_quantiles_merge_equals_whole(spark):
    """The sketch state (hash-sampled rows) must merge by UNION:
    sampling two disjoint shards and finishing the union re-creates
    the whole-corpus finish EXACTLY — same rows, same estimates."""
    from queens_spark.operators.quantiles import exact_group_quantiles
    from queens_spark.operators.sampling import hash_sample
    from queens_spark.operators.sketches import sampled_quantiles

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    whole = {
        r["event_type"]: (r["n_sample"], r["p50"], r["p90"])
        for r in sampled_quantiles(
            ev, "event_type", "value", "event_id", 2000,
            {"p50": 0.5, "p90": 0.9},
        ).collect()
    }
    # shard by user parity — orthogonal to the sampling hash
    s1 = hash_sample(ev.where(F.col("user_id") % 2 == 0), "event_id", 2000)
    s2 = hash_sample(ev.where(F.col("user_id") % 2 == 1), "event_id", 2000)
    merged_state = s1.unionByName(s2)
    est = exact_group_quantiles(
        merged_state, "event_type", "value", {"p50": 0.5, "p90": 0.9}
    )
    n = merged_state.groupBy("event_type").agg(
        F.count("value").alias("n_sample")
    )
    merged = {
        r["event_type"]: (r["n_sample"], r["p50"], r["p90"])
        for r in n.join(est, "event_type").collect()
    }
    assert merged == whole and len(whole) > 0


def test_sampled_quantiles_rate_guard(spark):
    import pytest

    from queens_spark.operators.sketches import sampled_quantiles

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    with pytest.raises(ValueError, match="rate_bp"):
        sampled_quantiles(ev, "event_type", "value", "event_id", 0, {"p50": 0.5})
