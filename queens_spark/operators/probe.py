"""Embedding-space model-quality probes — the evaluation side of a
training-data pipeline: given an embedding column and labels, answer
"are these embeddings any good?" with exact, oracle-gradeable numbers.

Three probes, all standard protocol:

- **nearest-centroid classifier** (the linear-probe protocol's
  cheapest honest instance): train exact per-class centroids on a
  deterministic hash split, classify the held-out split by nearest
  centroid, report the confusion matrix. One counter-width shuffle
  (label × dim sums) trains the model; scoring is MAP-ONLY — the
  centroids (n_classes × dim fixed-point ints, a few KB) are collected
  and constant-folded into a HOF literal, the same
  small-model-as-literal shape as the PQ codebook (similarity.py), so
  classifying 100 TB of vectors is one embarrassingly parallel pass
  with no join and no second shuffle.
- **Fisher-direction probe + exact AUC**: w = centroid(pos) −
  centroid(neg) over the train split (the closed-form linear probe
  under an identity-covariance assumption — no iterations, one
  aggregation), score the test split by the integer dot product, and
  evaluate with the tie-corrected Mann-Whitney AUC. Ranks ride the
  two-phase distributed ordinal (operators/quantiles.grouped_ordinal —
  never a single-task global window), ties contribute their exact
  average rank via per-score-group counts, and the statistic stays in
  integer arithmetic end-to-end: auc_bp = (2·Σr⁺ − n⁺(n⁺+1)) · 10⁴
  div (2·n⁺·n⁻).
- **simplified silhouette** (squared-distance, centroid-based): per
  point a² = d²(x, own centroid), b² = min over other classes,
  s_bp = (b² − a²)·10⁴ div max(a², b², 1). The classic silhouette
  needs all-pairs distances (O(n²) — impossible at corpus scale); the
  centroid variant is the standard scale substitute and keeps the
  same sign semantics: negative ⇒ the point sits closer to another
  class's prototype (a label-noise candidate).

Everything is exact fixed-point: components quantize to e3
(similarity.QUANT), centroids to e6 via ``sum·1000 div n``, so Spark
and a SQL oracle agree bit-for-bit. Magnitude audit for bigint
safety at |component| ≤ ~2 (unit-ish embeddings): qv ≤ 2·10³, x_e6 ≤
2·10⁶, per-dim squared diff ≤ 1.6·10¹³, ×4096 dims ≤ 6.6·10¹⁶ < 2⁶³;
dot products |qv·w_e6| ≤ 8·10⁹ per dim — headroom of ~10⁵ dims.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from queens_spark.operators.similarity import QUANT, lit_array, quantize


def label_centroids_e6(
    df: DataFrame, vec_col: str, label_col: str
) -> DataFrame:
    """Exact per-class centroids in e6 fixed point: (label, dim
    [1-based], n, centroid_e6 = Σ floor(x·10³) · 10³ div n). The
    shuffle carries n_classes × dim counter rows with map-side partial
    aggregation — never vectors."""
    return (
        df.select(
            F.col(label_col).alias("label"),
            F.posexplode(quantize(vec_col)).alias("pos", "v"),
        )
        .groupBy("label", (F.col("pos") + 1).cast("int").alias("dim"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("sum(v) * 1000 div count(1)").alias("centroid_e6"),
        )
    )


def collect_centroids(cdf: DataFrame) -> dict[int, list[int]]:
    """Collect a :func:`label_centroids_e6` frame into the tiny
    driver-side model (label → e6 component list). n_classes × dim
    integers — model-scale, never corpus-scale."""
    rows = cdf.select("label", "dim", "centroid_e6").collect()
    byl: dict[int, dict[int, int]] = {}
    for r in rows:
        byl.setdefault(r["label"], {})[r["dim"]] = r["centroid_e6"]
    return {
        lbl: [dims[i] for i in sorted(dims)] for lbl, dims in byl.items()
    }


def _vec_e6(vec_col: str) -> Column:
    """Embedding → e6 fixed-point integer components (exact: one float
    → floor-e3 quantization, then an integer upscale)."""
    return F.transform(quantize(vec_col), lambda v: v * QUANT)


def sq_dist_e6(x_e6: Column, cent: list[int]) -> Column:
    """Σ(x − c)² between an e6 vector column and one constant-folded
    centroid literal. Pure JVM HOF — no join, no UDF."""
    lits = lit_array(cent, "bigint")
    return F.aggregate(
        F.zip_with(x_e6, lits, lambda x, c: (x - c) * (x - c)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def centroid_distances(
    vec_col: str, model: dict[int, list[int]]
) -> Column:
    """Array of (d2, label) structs, one per class, from constant-
    folded centroid literals — map-only scoring against a trained
    model."""
    x = _vec_e6(vec_col)
    return F.array(
        *[
            F.struct(
                sq_dist_e6(x, cent).alias("d2"),
                F.lit(int(lbl)).cast("int").alias("label"),
            )
            for lbl, cent in sorted(model.items())
        ]
    )


def classify_by_centroids(
    vec_col: str, model: dict[int, list[int]]
) -> Column:
    """Predicted label = argmin squared distance, ties to the smaller
    label (struct ordering is lexicographic, so array_min on
    (d2, label) is exactly that tie-break)."""
    return F.array_min(centroid_distances(vec_col, model))["label"]


def fisher_direction_e6(
    train: DataFrame, vec_col: str, pos: Column
) -> list[int]:
    """w = centroid(pos) − centroid(¬pos) in e6 fixed point — the
    closed-form one-pass linear probe direction. Returns the tiny
    driver-side weight list (dim integers)."""
    cents = collect_centroids(
        label_centroids_e6(
            train.select(
                F.when(pos, 1).otherwise(0).alias("y"),
                F.col(vec_col),
            ),
            vec_col,
            "y",
        )
    )
    if set(cents) != {0, 1}:
        raise ValueError(
            f"fisher_direction_e6 needs both classes in train, got {sorted(cents)}"
        )
    return [p - n for p, n in zip(cents[1], cents[0])]


def probe_score(vec_col: str, w_e6: list[int]) -> Column:
    """Integer dot product of the quantized embedding with a constant-
    folded weight vector — map-only scoring."""
    lits = lit_array(w_e6, "bigint")
    return F.aggregate(
        F.zip_with(quantize(vec_col), lits, lambda x, c: x * c),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def binary_auc_bp(
    df: DataFrame, score_col: str, pos_col: str
) -> DataFrame:
    """Exact tie-corrected Mann-Whitney AUC in basis points, one row:
    (n_pos, n_neg, auc_bp).

    auc = (Σ avg-rank⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻) with ascending ranks,
    ties taking their average rank. Kept integer throughout by working
    in doubled ranks: for a tie group with c members, min-rank r, and
    c⁺ positives, Σ 2·avg-rank⁺ = c⁺·(2(r−1) + c + 1).

    Scale shape: ranks come from the two-phase distributed ordinal
    (no single-task global window — the score domain can be
    corpus-sized), then one groupBy(score) for tie groups and one
    scalar aggregation. Degenerate single-class inputs return NULL
    auc_bp rather than dividing by zero (ANSI mode raises)."""
    g = score_groups(df, score_col, pos_col)
    return g.agg(
        F.sum("__cp").alias("n_pos"),
        F.sum(F.col("__c") - F.col("__cp")).alias("n_neg"),
        F.sum(
            F.col("__cp")
            * (2 * (F.col("__rkmin") - 1) + F.col("__c") + 1)
        ).alias("__two_rsum"),
    ).select(
        "n_pos",
        "n_neg",
        F.expr(
            "CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL "
            "ELSE (__two_rsum - n_pos * (n_pos + 1)) * 10000 "
            "div (2 * n_pos * n_neg) END"
        ).alias("auc_bp"),
    )


def score_groups(df: DataFrame, score_col: str, pos_col: str) -> DataFrame:
    """Reduce (score, is_positive) rows to one row per DISTINCT score:
    (__s, __c count, __cp positives, __rkmin ascending min-rank,
    __befcp positives strictly below). The corpus is consumed by ONE
    counter aggregation (map-side partial — the scorer pass runs
    exactly once); the min-rank is then a prefix sum over the score-
    GROUP table only — rkmin(s) = 1 + Σ_{s'<s} c(s'), exact in bigint —
    computed two-phase (range-partition ascending, chunk-local running
    sums, broadcast chunk offsets) because for near-unique scores the
    group table is itself corpus-sized and must never funnel through a
    single-task global window. Everything downstream (ROC, AP,
    calibration) runs on this group table.

    NULL scores are DROPPED explicitly here (a rank is undefined for
    them); without the filter they would survive the count aggregation
    and silently shift every rank below them.

    Scores must satisfy |score| < 2^53 — the guard predates this
    prefix-sum form (ranks once rode a double-typed ordinal) and is
    kept as the API contract: callers feeding wider scores get a loud
    per-row error, not silently changed semantics. One map-side
    comparison — free next to the aggregation."""
    df = df.where(F.col(score_col).isNotNull())
    raw_s = F.col(score_col).cast("bigint")
    guarded_s = F.when(F.abs(raw_s) < F.lit(1 << 53), raw_s).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "score_groups: |score| must stay below 2^53 (the "
                    "rank contract of this API); got "
                ),
                raw_s.cast("string"),
            )
        ).cast("bigint")
    )
    base = df.select(
        guarded_s.alias("__s"),
        F.when(F.col(pos_col).cast("boolean"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("__p"),
    )
    groups = base.groupBy("__s").agg(
        F.count(F.lit(1)).alias("__c"), F.sum("__p").alias("__cp")
    )
    from pyspark.sql import Window

    ranged = groups.repartitionByRange(F.col("__s").asc())
    part = ranged.withColumn("__pid", F.spark_partition_id())
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(F.col("__s").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = part.withColumn(
        "__lbc", F.coalesce(F.sum("__c").over(w_local), F.lit(0))
    ).withColumn(
        "__lbcp", F.coalesce(F.sum("__cp").over(w_local), F.lit(0))
    )
    ptot = part.groupBy("__pid").agg(
        F.sum("__c").alias("__pc"), F.sum("__cp").alias("__pcp")
    )
    w_off = (
        Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # Chunk offsets AND the grand totals ride the same chunks×1 frame —
    # totals as an unbounded window so no consumer ever has to re-
    # reference this chain to learn n/n_pos (the multi-reference
    # re-run footgun).
    offs = ptot.select(
        "__pid",
        F.coalesce(F.sum("__pc").over(w_off), F.lit(0)).alias("__oc"),
        F.coalesce(F.sum("__pcp").over(w_off), F.lit(0)).alias("__ocp"),
        F.sum("__pc").over(w_all).alias("__n"),
        F.sum("__pcp").over(w_all).alias("__npos"),
    )
    return (
        local.join(F.broadcast(offs), "__pid")
        .select(
            "__s",
            "__c",
            "__cp",
            (F.col("__oc") + F.col("__lbc") + 1).alias("__rkmin"),
            (F.col("__ocp") + F.col("__lbcp")).alias("__befcp"),
            F.col("__n"),
            F.col("__npos"),
            (F.col("__n") - F.col("__npos")).alias("__nneg"),
        )
    )


def _with_cum_ge(groups: DataFrame) -> DataFrame:
    """Add, per score group, the counts AT OR ABOVE the score
    (threshold semantics: predict positive when score ≥ s): __tp
    (positives ≥ s), __hits (rows ≥ s), plus totals __npos/__nneg/__n.

    :func:`score_groups` already carries the strictly-below prefix
    sums (__rkmin − 1 rows below, __befcp positives below) and the
    grand totals, so the descending cumulatives are pure per-row
    arithmetic — tp(s) = npos − below_cp(s), hits(s) = n − below_c(s).
    Zero additional passes, joins, or shuffles."""
    return groups.withColumn(
        "__tp", F.col("__npos") - F.col("__befcp")
    ).withColumn("__hits", F.col("__n") - (F.col("__rkmin") - F.lit(1)))


def roc_points(df: DataFrame, score_col: str, pos_col: str) -> DataFrame:
    """Exact ROC curve: one point per distinct score threshold s
    (predict positive when score ≥ s), in integer basis points.
    Output: (score, tpr_bp, fpr_bp) — the staircase AUC integrates to
    :func:`binary_auc_bp` up to tie interpolation."""
    cum = _with_cum_ge(score_groups(df, score_col, pos_col))
    return cum.select(
        F.col("__s").alias("score"),
        F.expr(
            "CASE WHEN __npos = 0 THEN NULL "
            "ELSE __tp * 10000 div __npos END"
        ).alias("tpr_bp"),
        F.expr(
            "CASE WHEN __nneg = 0 THEN NULL "
            "ELSE (__hits - __tp) * 10000 div __nneg END"
        ).alias("fpr_bp"),
    )


def average_precision_e6(
    df: DataFrame, score_col: str, pos_col: str
) -> DataFrame:
    """Exact step average precision (AP, the PR-curve area in its
    standard discrete form): AP = Σ_thresholds ΔR_k · P_k with
    recall steps ΔR_k = (positives at score s_k)/n_pos and precision
    P_k = TP_k / hits_k at threshold ≥ s_k. Integer end-to-end:
    ap_e6 = Σ cp_k · (TP_k·10⁶ div hits_k) div n_pos — the nested
    truncating divisions are identical on both engines. One row:
    (n_pos, n_neg, ap_e6); NULL on a single-class input."""
    cum = _with_cum_ge(score_groups(df, score_col, pos_col))
    return cum.agg(
        F.max("__npos").alias("n_pos"),
        F.max("__nneg").alias("n_neg"),
        F.sum(
            F.expr("__cp * (__tp * 1000000 div __hits)")
        ).alias("__num"),
    ).select(
        "n_pos",
        "n_neg",
        F.expr(
            "CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL "
            "ELSE __num div n_pos END"
        ).alias("ap_e6"),
    )


def calibration_bins(
    df: DataFrame, score_col: str, pos_col: str, bins: int = 10
) -> DataFrame:
    """Score-decile calibration: assign each distinct-score GROUP to a
    bin by its min-rank (ties share a bin — deterministic without a
    per-row tie-break, the same order-invariance argument as the AUC),
    then report per bin the row count, positive count, and positive
    rate in basis points. A well-calibrated monotone score shows
    pos_rate_bp rising with the bin id. Scale-clean: ordinal + counter
    aggregations only."""
    g = score_groups(df, score_col, pos_col)
    return (
        g.select(
            F.expr(f"(__rkmin - 1) * {int(bins)} div __n").alias("bin"),
            "__c",
            "__cp",
        )
        .groupBy("bin")
        .agg(
            F.sum("__c").cast("bigint").alias("n"),
            F.sum("__cp").cast("bigint").alias("n_pos"),
            F.expr("CAST(sum(__cp) * 10000 div sum(__c) AS BIGINT)")
            .alias("pos_rate_bp"),
        )
    )


def silhouette_components(
    vec_col: str, label_col: str, model: dict[int, list[int]]
) -> tuple[Column, Column]:
    """Per-row (a², b²) against a trained centroid model: a² = squared
    distance to the OWN class centroid, b² = minimum over the others.
    Map-only (constant-folded centroids). The simplified silhouette is
    then ``(b2 - a2) * 10000 div greatest(a2, b2, 1)`` — callers apply
    the div on the ALIASED columns (both Spark's ``div`` and DuckDB's
    ``//`` truncate toward zero, so the negative-side values agree;
    the products overflow double's 2⁵³ so this must never detour
    through ``/``)."""
    dists = centroid_distances(vec_col, model)
    lbl = F.col(label_col).cast("int")
    a2 = F.array_min(F.filter(dists, lambda s: s["label"] == lbl))["d2"]
    b2 = F.array_min(F.filter(dists, lambda s: s["label"] != lbl))["d2"]
    return a2, b2
