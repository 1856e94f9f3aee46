"""KMV sketch semantics (operators/kmv.py): exactness below k,
estimator form at k, the merge closure property, and pair-overlap
edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from queens_spark.operators.kmv import (
    DEFAULT_K,
    KMV_RANGE,
    kmv_distinct_estimates,
    kmv_hash,
    kmv_pair_overlap,
    kmv_sketches,
)


def _keys_df(spark, groups: dict[str, list[int]]):
    rows = [(g, int(v)) for g, vs in groups.items() for v in vs]
    return spark.createDataFrame(rows, "g string, key bigint")


def test_sketch_is_bottom_k_distinct_hashes(spark):
    df = _keys_df(spark, {"a": list(range(100)) + list(range(100))})
    k = 8
    sk = kmv_sketches(df, "g", "key", k)
    got = sorted(r["v"] for r in sk.collect())
    all_h = sorted(
        r["h"]
        for r in df.select(kmv_hash("key").alias("h")).distinct().collect()
    )
    assert got == all_h[:k]
    assert all(0 <= v < KMV_RANGE for v in got)


def test_sub_k_group_estimate_is_exact(spark):
    df = _keys_df(spark, {"small": [1, 2, 3]})
    sk = kmv_sketches(df, "g", "key", DEFAULT_K)
    row = kmv_distinct_estimates(sk, "g", DEFAULT_K).collect()[0]
    assert (row["sketch_n"], row["est_distinct"]) == (3, 3)


def test_full_sketch_uses_kmv_estimator(spark):
    n, k = 5000, 32
    df = _keys_df(spark, {"big": list(range(n))})
    sk = kmv_sketches(df, "g", "key", k)
    row = kmv_distinct_estimates(sk, "g", k).collect()[0]
    assert row["sketch_n"] == k
    vk = max(r["v"] for r in sk.collect())
    assert row["est_distinct"] == (k - 1) * KMV_RANGE // vk
    # 1/sqrt(32) ≈ 18%; allow 4 sigma
    assert abs(row["est_distinct"] - n) < 0.75 * n


def test_merge_closure_union_sketch_equals_rebuild(spark):
    # the k smallest of A∪B from member sketches == from-scratch build
    a, b = list(range(0, 3000)), list(range(1500, 4500))
    k = 16
    df = _keys_df(spark, {"a": a, "b": b})
    both = _keys_df(spark, {"u": a + b})
    pair = kmv_pair_overlap(kmv_sketches(df, "g", "key", k), "g", k)
    union_est = pair.collect()[0]["union_est"]
    direct = kmv_distinct_estimates(
        kmv_sketches(both, "g", "key", k), "g", k
    ).collect()[0]["est_distinct"]
    assert union_est == direct


def test_pair_overlap_disjoint_and_subk_exact(spark):
    df = _keys_df(spark, {"a": [1, 2, 3], "b": [10, 11], "c": [2, 3]})
    out = {
        (r["group_a"], r["group_b"]): r
        for r in kmv_pair_overlap(
            kmv_sketches(df, "g", "key", DEFAULT_K), "g", DEFAULT_K
        ).collect()
    }
    assert len(out) == 3  # all unordered pairs, including zero overlap
    ab = out[("a", "b")]
    assert (ab["union_est"], ab["inter_est"]) == (5, 0)
    ac = out[("a", "c")]
    assert (ac["union_est"], ac["inter_est"]) == (3, 2)


def test_pair_overlap_estimates_are_calibrated(spark):
    k = 64
    a = list(range(0, 6000))
    b = list(range(3000, 9000))  # |A∪B| = 9000, |A∩B| = 3000
    df = _keys_df(spark, {"a": a, "b": b})
    row = kmv_pair_overlap(kmv_sketches(df, "g", "key", k), "g", k).collect()[0]
    assert abs(row["union_est"] - 9000) < 0.5 * 9000
    assert abs(row["inter_est"] - 3000) < 0.75 * 3000


def test_sketches_merge_identically_under_repartition(spark):
    # partition layout must not change the sketch (pure distinct+rank)
    df = _keys_df(spark, {"a": list(range(2000))})
    k = 16
    s1 = sorted(r["v"] for r in kmv_sketches(df, "g", "key", k).collect())
    s2 = sorted(
        r["v"]
        for r in kmv_sketches(df.repartition(13), "g", "key", k).collect()
    )
    assert s1 == s2
