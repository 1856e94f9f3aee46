"""Join-key discovery — the data-catalog question "which columns can
join?", answered from column-value profiles instead of tribal
knowledge (the published shape: Aurum/LSH-ensemble-style profiling,
re-expressed on exact + KMV machinery).

Given a tall (colid, value) frame of candidate key columns across
tables, emit every DIRECTED column pair with its exact set
containment |A∩B| / |A| and the KMV-sketch estimate of the same — a
containment of 10000 bp means A ⊆ B, a foreign-key candidate.

Scale shape: the exact path distincts the tall frame once and
computes ALL pairwise intersections in ONE self-join on the value
hash (never a join per pair); the sketch path is the 100 TB answer —
one corpus pass builds every column's k-row sketch
(operators/kmv.py), after which the full matrix is sketch-×-sketch
arithmetic, and profiling a NEW table never rescans the old ones
(sketches persist and merge). On surrogate-integer keys both paths
honestly report the classic trap: different entities sharing a dense
1..N id range look joinable by value — containment finds FK
directionality, not semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from queens_spark.operators.kmv import (
    DEFAULT_K,
    kmv_distinct_estimates,
    kmv_hash,
    kmv_pair_overlap,
)


def tall_column_values(
    frames: dict[str, tuple[DataFrame, str]]
) -> DataFrame:
    """Stack candidate columns into one (colid, value) frame; values
    cast to bigint (surrogate-key profiling). NULLs drop — they join
    nothing."""
    parts = [
        df.select(
            F.lit(colid).alias("colid"),
            F.col(col).cast("bigint").alias("value"),
        ).where(F.col(col).isNotNull())
        for colid, (df, col) in sorted(frames.items())
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def tall_column_values_grouped(
    tables: list[tuple[DataFrame, dict[str, str]]]
) -> DataFrame:
    """Like :func:`tall_column_values`, but ONE scan per source table:
    each table's candidate columns leave the scan as an exploded
    (colid, value) array, so a table profiled on k columns is read
    once instead of k times (at corpus scale, k× fewer full passes
    over the fact table). Row set identical to the per-column union:
    explode emits one (colid, value) row per column per source row,
    and the NULL filter drops the same rows the per-column form
    dropped."""
    parts = []
    for df, colmap in tables:
        entries = [
            F.struct(
                F.lit(colid).alias("colid"),
                F.col(col).cast("bigint").alias("value"),
            )
            for colid, col in sorted(colmap.items())
        ]
        parts.append(
            df.select(F.explode(F.array(*entries)).alias("__e"))
            .select("__e.colid", "__e.value")
            .where(F.col("value").isNotNull())
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def joinability_matrix(
    tall: DataFrame, k: int = DEFAULT_K
) -> DataFrame:
    """Every directed column pair (col_a ≠ col_b) with exact and
    sketch-estimated containment of A's value set in B's.

    Output: col_a, col_b, exact_a (|A| hashed-distinct), exact_inter,
    contain_bp (exact), est_contain_bp (KMV). Estimates can exceed
    10⁴ bp — they are reported raw, not clamped, so calibration error
    stays visible."""
    from queens_spark.operators.dedup import _persist
    from queens_spark.operators.kmv import kmv_sketches_from_hashes

    # ONE hash+distinct pass feeds sizes, the all-pairs intersection,
    # AND the sketches — at corpus scale the tall-frame scan dominates
    # and three consumers would triple it (A/B at sf0.1 is neutral
    # warm: the scan is cheap there and persist costs what it saves).
    # Distinct on the raw VALUES first, hash after: the portable
    # quadratic hash is a ~40-op expression, and evaluating it per
    # distinct value instead of per row cuts its cost by the
    # duplication factor (measured 2.0 s → 0.9 s at sf0.1's 5.8×).
    # The second distinct collapses 50-bit hash collisions so the
    # (colid, h) SET is identical to hashing before the distinct —
    # counter-width input, negligible cost.
    hd = _persist(
        tall.distinct()
        .select("colid", kmv_hash("value").alias("h"))
        .distinct()
    )
    sizes = hd.groupBy("colid").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        hd.select(F.col("colid").alias("ca"), "h")
        .join(hd.select(F.col("colid").alias("cb"), "h"), "h")
        .where(F.col("ca") != F.col("cb"))
        .groupBy("ca", "cb")
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )

    # the sketch feeds est_sizes AND the pair-overlap (which fans it
    # out five ways internally) — persist the k-rows once
    sk = _persist(kmv_sketches_from_hashes(hd, "colid", "h", k))
    est_sizes = kmv_distinct_estimates(sk, "colid", k).select(
        F.col("colid"), F.col("est_distinct").alias("est_n")
    )
    ov = kmv_pair_overlap(sk, "colid", k)
    # unordered sketch pairs → both directions
    directed_est = ov.select(
        F.col("group_a").alias("ca"),
        F.col("group_b").alias("cb"),
        "inter_est",
    ).unionByName(
        ov.select(
            F.col("group_b").alias("ca"),
            F.col("group_a").alias("cb"),
            "inter_est",
        )
    )

    cols = sizes.select(F.col("colid").alias("ca"))
    pairs = cols.join(
        cols.select(F.col("ca").alias("cb")), F.col("ca") != F.col("cb")
    )
    return (
        pairs.join(
            sizes.select(F.col("colid").alias("ca"), F.col("n").alias("na")),
            "ca",
        )
        .join(inter, ["ca", "cb"], "left")
        .join(directed_est, ["ca", "cb"], "left")
        .join(
            est_sizes.select(
                F.col("colid").alias("ca"), F.col("est_n").alias("est_na")
            ),
            "ca",
        )
        .select(
            F.col("ca").alias("col_a"),
            F.col("cb").alias("col_b"),
            F.col("na").cast("bigint").alias("exact_a"),
            F.coalesce(F.col("exact_inter"), F.lit(0))
            .cast("bigint")
            .alias("exact_inter"),
            F.expr(
                "CAST(coalesce(exact_inter, 0) * 10000 div na AS BIGINT)"
            ).alias("contain_bp"),
            F.expr(
                "CAST(CASE WHEN est_na = 0 THEN 0 "
                "ELSE coalesce(inter_est, 0) * 10000 div est_na END "
                "AS BIGINT)"
            ).alias("est_contain_bp"),
        )
    )
