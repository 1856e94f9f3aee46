"""KMV (k-minimum-values) distinct sketches — mergeable cardinality
and set-overlap estimation with cross-engine-exact arithmetic.

The HLL module (operators/sketches.py) answers "how many distinct?"
per group; KMV answers the harder compositional questions — "how many
distinct in the UNION / INTERSECTION of two groups?" — from per-group
sketches alone, which no fixed-register sketch can do for
intersections. The classic use here: the cross-source duplication
matrix (q172 computes it exactly from the stored dedup map) at corpus
scale, where per-source shingle sets are billions and an exact
pairwise distinct-intersection is a full shuffle per pair. KMV makes
each source a k-row sketch built in one pass; every pairwise estimate
is then sketch-×-sketch arithmetic on k-row tables.

Why KMV is mergeable exactly: the k smallest hash values of A ∪ B are
a subset of (k smallest of A) ∪ (k smallest of B) — so union sketches
compose from member sketches with NO loss versus a from-scratch build.

Portability: the key hash is the 62-bit quadratic-round hll_hash
(engine-reproducible), folded to 50 bits so every downstream product
stays < 2⁶³: the estimator (k−1)·R div v_k with R = 2⁵⁰ peaks at
15·2⁵⁰ ≈ 1.7·10¹⁶, and the intersection scale-up n_common·est div k
at ≈ 2.7·10¹⁷ — bigint-safe on both engines, and `div` / `//` agree
(truncation toward zero; all operands non-negative here anyway).
Estimates are the standard unbiased KMV forms (Bar-Yossef et al.,
"Counting distinct elements in a data stream"; Beyer et al., SIGMOD'07
for the intersection ratio estimator). Hash collisions at 50 bits
merge ≈ n²/2⁵¹ pairs — immaterial against the ±1/√k sketch error, and
both engines merge identically so oracle equality is unaffected.

Scale shape: the ONLY corpus-scale stages are one distinct on
(group, hash) and one two-phase ordinal (operators/quantiles.
grouped_ordinal — range-partitioned, never a single-task window).
Everything after runs on k·n_groups rows; pairwise windows partition
by pair, so sources² pairs parallelize across the cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from queens_spark.operators.sketches import hll_hash

#: fold of the 62-bit hash into [0, 2^50) — see module docstring.
KMV_RANGE = 1 << 50
#: default sketch size: ±1/√16 = 25% relative error per estimate.
DEFAULT_K = 16


def kmv_hash(key: Column | str) -> Column:
    """50-bit portable sketch hash of a bigint key."""
    return hll_hash(key) % F.lit(KMV_RANGE)


def duckdb_kmv_hash_ctes(table: str, key_expr: str, group_col: str) -> str:
    """CTE chain ending in ``kv(group, v)`` — the DuckDB twin of
    :func:`kmv_hash` over a (group, key) table."""
    from queens_spark.operators.sketches import duckdb_hll_hash_ctes

    return (
        duckdb_hll_hash_ctes(table, key_expr, group_col)
        + f""", kv AS (
        SELECT {group_col}, v % {KMV_RANGE} AS v FROM hv
      )"""
    )


def kmv_sketches(
    df: DataFrame, group_col: str, key_col: str, k: int = DEFAULT_K
) -> DataFrame:
    """Per-group KMV sketch: the k smallest DISTINCT 50-bit hashes of
    *key_col* (bigint). Output (group_col, v) — ≤ k rows per group.

    One corpus-scale distinct + one two-phase ordinal; the rank never
    funnels a group through a single task. The distinct runs on the
    RAW (group, key) pairs and the ~40-op portable hash applies per
    distinct value after (then a counter-width re-distinct collapses
    50-bit collisions, keeping the hash SET bit-identical to hashing
    first) — the q178 lesson: on duplicate-heavy corpora the hash's
    cost drops by the duplication factor."""
    hashed = (
        df.select(F.col(group_col), F.col(key_col)).distinct()
        .select(F.col(group_col), kmv_hash(key_col).alias("__kh"))
        .distinct()
    )
    return kmv_sketches_from_hashes(hashed, group_col, "__kh", k)


def kmv_sketches_from_hashes(
    hd: DataFrame, group_col: str, hash_col: str, k: int = DEFAULT_K
) -> DataFrame:
    """Sketch from an ALREADY hashed-and-distinct (group, hash) frame
    — the reuse point for callers that also need the exact
    hashed-distinct truth (q176/q177/q178 persist that frame once and
    derive sketch AND exact twins from it, instead of re-hashing the
    corpus per consumer).

    Bottom-k rides a plain rank-filter window: Spark's
    InferWindowGroupLimit rewrites ``row_number() <= k`` into a
    map-side partial top-k (WindowGroupLimit), so the exchange carries
    at most k rows per group per input partition — no corpus-scale
    range shuffle and no repartitionByRange sampling pass. Hashes are
    distinct within a group, so the rank order is total and the
    surviving set is exactly the k smallest."""
    w = Window.partitionBy(group_col).orderBy(F.col("v").asc())
    return (
        hd.select(
            F.col(group_col), F.col(hash_col).cast("bigint").alias("v")
        )
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .select(F.col(group_col), F.col("v"))
    )


def kmv_distinct_estimates(sk: DataFrame, group_col: str, k: int) -> DataFrame:
    """Per-group distinct-count estimate from a sketch frame:
    (group_col, sketch_n, est_distinct). A sketch holding fewer than k
    values has seen its whole key set, so the estimate is exact there;
    otherwise est = (k−1)·R div v_k."""
    return (
        sk.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("sketch_n"),
            F.max("v").alias("__vk"),
        )
        .select(
            F.col(group_col),
            F.col("sketch_n"),
            F.expr(
                f"CASE WHEN sketch_n < {k} THEN sketch_n "
                f"ELSE {k - 1} * CAST({KMV_RANGE} AS BIGINT) div __vk END"
            ).alias("est_distinct"),
        )
    )


def kmv_pair_overlap(
    sk: DataFrame, group_col: str, k: int = DEFAULT_K
) -> DataFrame:
    """All-pairs union/intersection estimates from one sketch frame.

    For each unordered group pair (a < b): merge the two sketches,
    keep the k smallest distinct values (the exact union sketch),
    estimate the union as usual, and scale it by the fraction of the
    union sketch present in BOTH member sketches (the Beyer et al.
    ratio estimator). When the merged sketch holds < k values both
    members were complete, so union AND intersection are exact.

    Output: (group_a, group_b, union_est, inter_est) — every pair of
    groups appearing in *sk*, including zero-overlap ones.

    Each group's ≤ k-row sketch collapses to ONE array row first, so
    the whole pairwise matrix is per-pair ARRAY arithmetic inside one
    small join — no (pair, value) expansion ever crosses a shuffle, no
    per-pair window, no membership probe joins. The merged union
    sketch is array_sort(array_union)[:k] — identical to the k
    smallest distinct values of the sketch union — and membership is
    array_contains against the member arrays. The array frame is
    PERSISTED (n_groups rows of k bigints): both pair sides reference
    it, and without the barrier each side re-runs the upstream
    corpus-scale distinct + bottom-k — measured at ~2× the whole q178
    matrix."""
    from queens_spark.operators.dedup import _persist

    arrs = _persist(
        sk.groupBy(F.col(group_col).alias("ga")).agg(
            F.array_sort(F.collect_list("v")).alias("__va")
        )
    )
    pairs = arrs.join(
        arrs.select(F.col("ga").alias("gb"), F.col("__va").alias("__vb")),
        F.col("ga") < F.col("gb"),
    )
    merged = pairs.withColumn(
        "__mg",
        F.slice(F.array_sort(F.array_union("__va", "__vb")), 1, k),
    )
    per_pair = merged.select(
        "ga",
        "gb",
        F.size("__mg").cast("bigint").alias("__m"),
        F.element_at("__mg", F.size("__mg")).alias("__vk"),
        F.size(
            F.filter(
                "__mg",
                lambda x: F.array_contains("__va", x)
                & F.array_contains("__vb", x),
            )
        )
        .cast("bigint")
        .alias("__nc"),
    )
    return per_pair.select(
        F.col("ga").alias("group_a"),
        F.col("gb").alias("group_b"),
        F.expr(
            f"CASE WHEN __m < {k} THEN __m "
            f"ELSE {k - 1} * CAST({KMV_RANGE} AS BIGINT) div __vk END"
        ).alias("union_est"),
        F.expr(
            f"CASE WHEN __m < {k} THEN __nc "
            f"ELSE __nc * ({k - 1} * CAST({KMV_RANGE} AS BIGINT) div __vk) "
            f"div {k} END"
        ).alias("inter_est"),
    )
