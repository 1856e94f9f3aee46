"""Embedding-probe semantics: nearest-centroid classifier, Fisher
probe + tie-corrected AUC, simplified silhouette (operators/probe.py)
on hand-checkable synthetic data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from queens_spark.operators.probe import (
    binary_auc_bp,
    centroid_distances,
    classify_by_centroids,
    collect_centroids,
    fisher_direction_e6,
    label_centroids_e6,
    probe_score,
    silhouette_components,
)


def _vec_df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], int(lbl)) for i, (v, lbl) in enumerate(rows)],
        "vec_id bigint, embedding array<float>, label int",
    )


def test_label_centroids_exact_integer_mean(spark):
    # label 0: components (0.1, 0.2) and (0.3, 0.4) → qv (100,200),(300,400)
    # centroid_e6 = sum*1000 div 2 → (200000, 300000)
    df = _vec_df(spark, [(([0.1, 0.2]), 0), (([0.3, 0.4]), 0)])
    rows = {
        (r["label"], r["dim"]): (r["n"], r["centroid_e6"])
        for r in label_centroids_e6(df, "embedding", "label").collect()
    }
    assert rows == {(0, 1): (2, 200000), (0, 2): (2, 300000)}


def test_collect_centroids_orders_dims(spark):
    df = _vec_df(spark, [(([0.1, 0.2, 0.3]), 7)])
    model = collect_centroids(label_centroids_e6(df, "embedding", "label"))
    assert model == {7: [100000, 200000, 300000]}


def test_classifier_separable_is_perfect(spark):
    rows = [(([1.0, 0.0]), 0)] * 3 + [(([0.0, 1.0]), 1)] * 3
    df = _vec_df(spark, rows)
    model = collect_centroids(label_centroids_e6(df, "embedding", "label"))
    out = df.select(
        "label", classify_by_centroids("embedding", model).alias("pred")
    ).collect()
    assert all(r["label"] == r["pred"] for r in out)


def test_classifier_tie_breaks_to_smaller_label(spark):
    # two identical centroids → every point equidistant → label 0 wins
    df = _vec_df(spark, [(([0.5, 0.5]), 0), (([0.5, 0.5]), 1)])
    model = collect_centroids(label_centroids_e6(df, "embedding", "label"))
    preds = df.select(
        classify_by_centroids("embedding", model).alias("p")
    ).collect()
    assert {r["p"] for r in preds} == {0}


def test_centroid_distances_exact_values(spark):
    df = _vec_df(spark, [(([0.0, 0.0]), 0)])
    model = {0: [0, 0], 1: [1000000, 0]}
    d = df.select(
        centroid_distances("embedding", model).alias("d")
    ).collect()[0]["d"]
    assert [(x["d2"], x["label"]) for x in d] == [
        (0, 0),
        (1000000 * 1000000, 1),
    ]


def test_fisher_direction_and_score(spark):
    df = _vec_df(spark, [(([1.0, 0.0]), 1), (([0.0, 1.0]), 0)])
    w = fisher_direction_e6(df, "embedding", F.col("label") == 1)
    assert w == [1000000, -1000000]
    s = df.select(
        "label", probe_score("embedding", w).alias("s")
    ).collect()
    by = {r["label"]: r["s"] for r in s}
    # qv=(1000,0)·w → 1e9 ; qv=(0,1000)·w → -1e9
    assert by == {1: 1_000_000_000, 0: -1_000_000_000}


def test_fisher_direction_requires_both_classes(spark):
    df = _vec_df(spark, [(([1.0, 0.0]), 1)])
    with pytest.raises(ValueError, match="both classes"):
        fisher_direction_e6(df, "embedding", F.col("label") == 1)


def _auc(spark, scored):
    df = spark.createDataFrame(scored, "score bigint, pos boolean")
    return binary_auc_bp(df, "score", "pos").collect()[0]


def test_auc_perfect_separation(spark):
    r = _auc(spark, [(10, True), (9, True), (2, False), (1, False)])
    assert (r["n_pos"], r["n_neg"], r["auc_bp"]) == (2, 2, 10000)


def test_auc_reversed_is_zero(spark):
    r = _auc(spark, [(1, True), (2, False)])
    assert r["auc_bp"] == 0


def test_auc_with_ties_matches_hand_computation(spark):
    # scores: pos {3, 2}, neg {2, 1}; asc ranks: 1→1, the two 2s → 2.5
    # each, 3→4. Σr⁺ = 2.5 + 4 = 6.5 ⇒ auc = (6.5 - 3)/4 = 0.875
    r = _auc(spark, [(3, True), (2, True), (2, False), (1, False)])
    assert r["auc_bp"] == 8750


def test_auc_single_class_is_null(spark):
    r = _auc(spark, [(3, True), (1, True)])
    assert r["auc_bp"] is None
    assert (r["n_pos"], r["n_neg"]) == (2, 0)


def test_silhouette_components_and_noise_sign(spark):
    # point 0 is a label-1 point sitting ON the label-0 centroid →
    # a² > b² → negative silhouette; the clean points are positive.
    df = _vec_df(
        spark,
        [
            (([1.0, 0.0]), 0),
            (([1.0, 0.0]), 0),
            (([0.0, 1.0]), 1),
            (([0.0, 1.0]), 1),
            (([1.0, 0.0]), 1),  # mislabeled
        ],
    )
    model = collect_centroids(label_centroids_e6(df, "embedding", "label"))
    a2, b2 = silhouette_components("embedding", "label", model)
    out = df.select(
        "vec_id",
        "label",
        a2.alias("a2"),
        b2.alias("b2"),
        F.expr("(b2 - a2) * 10000 div greatest(a2, b2, 1)").alias("s_bp"),
    ).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert by_id[4]["s_bp"] < 0  # the planted noise point
    assert by_id[0]["s_bp"] > 0 and by_id[2]["s_bp"] > 0
    # a² is against the OWN centroid even when another is closer
    assert by_id[4]["a2"] > by_id[4]["b2"]


def test_spark_div_truncates_toward_zero_like_duckdb(spark):
    # the silhouette/mean contracts rely on div ≡ DuckDB's // on
    # negative numerators (both truncate toward zero)
    row = spark.sql(
        "SELECT -7 div 2 AS a, 7 div -2 AS b, -7 div -2 AS c"
    ).collect()[0]
    assert (row["a"], row["b"], row["c"]) == (-3, -3, 3)


def _scored_df(spark, scored):
    return spark.createDataFrame(scored, "score bigint, pos boolean")


def test_roc_points_hand_case(spark):
    from queens_spark.operators.probe import roc_points

    # scores desc: 3(pos), 2(pos+neg tie), 1(neg)
    df = _scored_df(
        spark, [(3, True), (2, True), (2, False), (1, False)]
    )
    pts = {r["score"]: r for r in roc_points(df, "score", "pos").collect()}
    assert (pts[3]["tpr_bp"], pts[3]["fpr_bp"]) == (5000, 0)
    assert (pts[2]["tpr_bp"], pts[2]["fpr_bp"]) == (10000, 5000)
    assert (pts[1]["tpr_bp"], pts[1]["fpr_bp"]) == (10000, 10000)


def test_average_precision_hand_case(spark):
    from queens_spark.operators.probe import average_precision_e6

    # thresholds desc: s=3 → P=1/1, ΔR=1/2 ; s=2 → P=2/3, ΔR=1/2 ;
    # s=1 → ΔR=0. AP = 0.5·1 + 0.5·(2/3) = 5/6
    df = _scored_df(
        spark, [(3, True), (2, True), (2, False), (1, False)]
    )
    row = average_precision_e6(df, "score", "pos").collect()[0]
    # integer form: (1·(1e6·1//1) + 1·(2e6//3)) // 2 = (1000000+666666)//2
    assert row["ap_e6"] == 833333
    assert (row["n_pos"], row["n_neg"]) == (2, 2)


def test_average_precision_perfect_is_1(spark):
    from queens_spark.operators.probe import average_precision_e6

    df = _scored_df(spark, [(9, True), (8, True), (1, False)])
    assert average_precision_e6(df, "score", "pos").collect()[0][
        "ap_e6"
    ] == 1000000


def test_calibration_bins_monotone_and_tie_sharing(spark):
    from queens_spark.operators.probe import calibration_bins

    # 4 rows, 2 bins; scores 1,1 (neg) and 5,5 (pos): each tie group
    # lands whole in one bin
    df = _scored_df(
        spark, [(1, False), (1, False), (5, True), (5, True)]
    )
    out = {r["bin"]: r for r in
           calibration_bins(df, "score", "pos", bins=2).collect()}
    assert out[0]["pos_rate_bp"] == 0 and out[0]["n"] == 2
    assert out[1]["pos_rate_bp"] == 10000 and out[1]["n"] == 2


def test_null_scores_are_dropped_consistently(spark):
    from queens_spark.operators.probe import binary_auc_bp, roc_points

    df = spark.createDataFrame(
        [(3, True), (None, True), (1, False)],
        "score bigint, pos boolean",
    )
    r = binary_auc_bp(df, "score", "pos").collect()[0]
    assert (r["n_pos"], r["n_neg"], r["auc_bp"]) == (1, 1, 10000)
    pts = roc_points(df, "score", "pos").collect()
    assert len(pts) == 2  # only the two non-null scores


def test_score_magnitude_guard_fails_loudly(spark):
    """Scores at or above 2^53 would silently lose precision in the
    double-based ordinal — the generic API must raise, not misrank."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    ok = _auc(spark, [((1 << 53) - 1, True), (1, False)])
    assert ok["auc_bp"] == 10000  # just-inside bound still exact
    bad = spark.createDataFrame(
        [(1 << 53, True), (1, False)], "score bigint, pos boolean"
    )
    with pytest.raises(SparkRuntimeException, match="2\\^53"):
        binary_auc_bp(bad, "score", "pos").collect()
